"""End-to-end reconstruction pipelines.

Capability parity: the reference's two demo drivers
(``affine_reconstruction.py:14-65``, ``euclidiean_reconstruction.py:13-66``)
re-expressed as jittable functions over a scene's observations — no global
RNG, no prints, no plotting inside; visualization/logging happen at the
edges. These are the "flagship models" of the framework: each maps
observations (F, P, 2) -> reconstruction (X, K, R, t) + diagnostics, and
both vmap over a leading scenes axis (see ``parallel/batched.py``).

Each pipeline runs its stages through their own jitted entry points rather
than one monolithic jit: the stage programs are already compiled+cached
individually, compile times stay bounded (monolithic calib+BA programs
take minutes to build on tunneled TPU backends), and the host transfer
between stages is a few KB. The batched variants in ``parallel/batched.py``
re-fuse everything under one jit+vmap where it pays off.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import LMConfig
from ..runtime.profiling import trace_span
from .affine import affine_self_calibration
from .bundle_adjustment import BAResult, bundle_adjust
from .perspective import perspective_self_calibration


class ReconstructionResult(NamedTuple):
    X: jax.Array  # (P, 3)
    K: jax.Array  # (F, 3, 3)
    R: jax.Array  # (F, 3, 3)
    t: jax.Array  # (F, 3)
    error: jax.Array  # final BA reprojection error (sum of squares / f0^2)
    n_iter: jax.Array  # BA iterations
    calib_X: jax.Array  # pre-BA points (the self-calibration output)
    status: jax.Array  # perspective calibration status (0 = ok); 0 for affine
    # stacked device-side BA iteration log when config.record_log is set
    # (feed through runtime.logging.device_log_to_records to viz.animate —
    # the reference's get_log/animate replay, bundle_adjustment.py:204-206)
    ba_log: dict | None = None


def affine_reconstruction(
    x: jax.Array,
    f: jax.Array,
    model: str = "paraperspective",
    f0: float = 1.0,
    config: LMConfig = LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100),
    visibility: jax.Array | None = None,
) -> ReconstructionResult:
    """Affine pipeline (reference ``affine_reconstruction.py:43-58``):
    self-calibration -> heuristic camera init (t = -3 R[:, :, 2], K = I)
    -> bundle adjustment in the x-up_z-forward gauge.

    x: (F, P, 2) observations; f: (F,) focal lengths (paraperspective);
    visibility: optional (P, F) mask, honored by BA only — the calibration
    stage keeps the reference's full-visibility contract
    (``affine_camera_calibration.py:232-234``), so masked entries of ``x``
    must still hold finite placeholder coordinates.
    """
    with trace_span("affine_self_calibration"):
        S, R = affine_self_calibration(x, model=model, f=f)
    t = -3.0 * R[:, :, 2]
    K = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), R.shape)

    with trace_span("bundle_adjustment"):
        ba = bundle_adjust(
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
        status=jnp.asarray(0),
        ba_log=ba.log,
    )


def euclidean_reconstruction(
    x: jax.Array,
    f0: float = 1.0,
    tol: float = 1e-2,
    method: str = "dual",
    config: LMConfig = LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100),
    eig_method: str = "eigh",
    visibility: jax.Array | None = None,
) -> ReconstructionResult:
    """Perspective pipeline (reference ``euclidiean_reconstruction.py:
    42-56``): perspective self-calibration (projective depths + metric
    upgrade) -> bundle adjustment in the x-up_z-forward gauge.

    visibility: optional (P, F) mask, honored by BA only — calibration
    keeps the reference's full-visibility contract (masked ``x`` entries
    need finite placeholders)."""
    with trace_span("perspective_self_calibration"):
        calib = perspective_self_calibration(
            x, f0=f0, tol=tol, method=method, eig_method=eig_method
        )

    with trace_span("bundle_adjustment"):
        ba = bundle_adjust(
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
        ba_log=ba.log,
    )
