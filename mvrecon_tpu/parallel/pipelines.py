"""Multi-chip end-to-end reconstruction: sharded calibration -> sharded BA.

The single-device pipelines (``models/pipelines.py``) mirror the
reference drivers (``/root/reference/euclidiean_reconstruction.py:42-56``);
this module chains their points-sharded equivalents so one giant scene
runs end-to-end across a mesh: the projective-depth loops + DAQ upgrade
with X sharded (``sharded_calibration.py``) feed the point-sharded LM
core (``sharded_ba.py``) without ever gathering the point cloud onto a
single device. Exposed on the CLI via ``--shard-points``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import LMConfig
from ..models.pipelines import ReconstructionResult
from ..runtime.profiling import trace_span
from .sharded_affine import sharded_affine_self_calibration
from .sharded_ba import sharded_bundle_adjust
from .sharded_calibration import sharded_perspective_self_calibration


def sharded_euclidean_reconstruction(
    mesh: Mesh,
    x: jax.Array,
    f0: float = 1.0,
    tol: float = 1e-2,
    method: str = "dual",
    config: LMConfig = LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100),
    visibility: jax.Array | None = None,
) -> ReconstructionResult:
    """Points-sharded perspective pipeline: same semantics as
    ``models.pipelines.euclidean_reconstruction`` (calibration keeps the
    reference's full-visibility contract; the mask feeds BA only), with
    the P axis of ``x`` (F, P, 2) sharded over ``mesh``'s ``points``
    axis for both stages. P must divide the shard count (calibration has
    no mask channel to neutralize padding)."""
    with trace_span("sharded_perspective_self_calibration"):
        calib = sharded_perspective_self_calibration(
            mesh, x, f0=f0, tol=tol, method=method
        )

    with trace_span("sharded_bundle_adjustment"):
        ba = sharded_bundle_adjust(
            mesh,
            x.transpose(1, 0, 2),
            calib.X,
            calib.K,
            calib.R,
            calib.t,
            f0=f0,
            visibility=visibility,
            axis="x-up_z-forward",
            config=config,
        )
    return ReconstructionResult(
        X=ba.X,
        K=ba.K,
        R=ba.R,
        t=ba.t,
        error=ba.error,
        n_iter=ba.n_iter,
        calib_X=calib.X,
        status=calib.status,
    )


def sharded_affine_reconstruction(
    mesh: Mesh,
    x: jax.Array,
    f: jax.Array,
    model: str = "paraperspective",
    f0: float = 1.0,
    config: LMConfig = LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100),
    visibility: jax.Array | None = None,
) -> ReconstructionResult:
    """Points-sharded affine pipeline: same semantics as
    ``models.pipelines.affine_reconstruction`` (self-calibration ->
    heuristic camera init t = -3 R[:, :, 2], K = I -> BA in the
    x-up_z-forward gauge, reference ``affine_reconstruction.py:43-58``)
    with the P axis sharded over ``mesh``'s ``points`` axis in both
    stages. P must divide the shard count for the calibration stage."""
    with trace_span("sharded_affine_self_calibration"):
        S, R, ok = sharded_affine_self_calibration(mesh, x, model=model, f=f)
    t = -3.0 * R[:, :, 2]
    K = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), R.shape)

    with trace_span("sharded_bundle_adjustment"):
        ba = sharded_bundle_adjust(
            mesh,
            x.transpose(1, 0, 2),
            S,
            K,
            R,
            t,
            f0=f0,
            visibility=visibility,
            axis="x-up_z-forward",
            config=config,
        )
    return ReconstructionResult(
        X=ba.X,
        K=ba.K,
        R=ba.R,
        t=ba.t,
        error=ba.error,
        n_iter=ba.n_iter,
        calib_X=S,
        status=jnp.where(ok, 0, 1),
    )
