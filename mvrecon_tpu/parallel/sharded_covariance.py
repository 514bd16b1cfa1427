"""Point-sharded BA covariance estimation.

The covariance computation (``models/covariance.py``) is a per-point
map plus one camera-side reduction, so it shards over the points axis
exactly like the LM cores (``sharded_ba.py``): each device computes its
local derivative blocks, the (9F, 9F) camera Schur complement completes
with one psum, every device inverts the (replicated) system, and the
point marginals stay local. One collective total — the same
communication shape as a single sharded LM step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import HIGHEST, LMConfig
from ..models.bundle_adjustment import (
    BAState,
    _compute_derivs,
    _huber_weights,
    gauge_mask,
    intrinsics_from_K,
    normalize_gauge,
    resolve_distortion_model,
    resolve_robust,
)
from ..models.covariance import (
    BACovariance,
    _camera_cov_from,
    _finalize,
    _finish_schur_inverse,
)
from ..ops.linalg import inv3x3
from .sharded_ba import POINTS_AXIS, pad_points


@partial(jax.jit, static_argnames=("mesh", "f0", "axis", "config"))
def sharded_ba_covariance(
    mesh: Mesh,
    x: jax.Array,
    X: jax.Array,
    K: jax.Array,
    R: jax.Array,
    t: jax.Array,
    f0: float = 1.0,
    visibility: jax.Array | None = None,
    axis: str = "x-right_z-forward",
    config: LMConfig = LMConfig(),
    distortion: jax.Array | None = None,
) -> BACovariance:
    """Point-sharded :func:`models.covariance.ba_covariance` (same
    semantics, same result to fp-accumulation tolerance; parity-pinned).
    Pass the converged BA state; P is padded to a multiple of the shard
    count (padded points report the unseen-point placeholder blocks and
    are stripped)."""
    dt = x.dtype
    npts, nf, _ = x.shape
    vis = (
        jnp.ones((npts, nf), dtype=dt)
        if visibility is None
        else jnp.asarray(visibility, dtype=dt)
    )
    if visibility is not None:
        x = jnp.where(vis[..., None] > 0, x, 0.0)
    X0, R0, t0, info = normalize_gauge(X, R, t, axis)
    free = gauge_mask(nf, axis, dt)
    dist = None if distortion is None else jnp.asarray(distortion, dt)
    model = resolve_distortion_model(dist, config.distortion_model)
    n_shards = mesh.shape[POINTS_AXIS]
    x_p, X_p, vis_p, n_orig = pad_points(x, X0, vis, n_shards)
    n_free = 3.0 * n_orig + jnp.sum(free)
    nf9 = 9 * nf
    has_dist = dist is not None
    dist_in = dist if has_dist else jnp.zeros((nf, 2), dt)

    def local(x_l, X_l, f_r, u_r, t_r, R_r, vis_l, free_r, dist_r):
        st = BAState(X=X_l, f=f_r, u=u_r, t=t_r, R=R_r)
        d_l = dist_r if has_dist else None
        if resolve_robust(config.robust) is not None:
            vis_w = _huber_weights(st, x_l, vis_l, f0, config.huber_delta,
                                   d_l, model, resolve_robust(config.robust))
        else:
            vis_w = vis_l
        derivs, e = _compute_derivs(
            st, x_l, vis_w, free_r, f0, POINTS_AXIS, d_l, model
        )
        # camera-side sums (matG, e) arrive psum-complete from
        # _compute_derivs; the Schur term needs its own psum.
        einv = inv3x3(derivs.matE)
        y = jnp.einsum("pxy,pym->pxm", einv, derivs.matF, precision=HIGHEST)
        schur = jax.lax.psum(
            jnp.einsum("pxm,pxn->mn", derivs.matF, y, precision=HIGHEST),
            POINTS_AXIS,
        )
        a_inv = _finish_schur_inverse(schur, derivs.matG, free_r, nf9)

        n_obs = jax.lax.psum(jnp.sum(vis_l > 0), POINTS_AXIS)
        dof = jnp.maximum(2.0 * n_obs.astype(dt) - n_free, 1.0)
        sigma2 = e / dof
        scale2 = 2.0 * sigma2
        lift = jnp.einsum("pxm,mn,pyn->pxy", y, a_inv, y, precision=HIGHEST)
        point_cov = scale2 * (einv + lift)
        cam_cov = _camera_cov_from(a_inv, nf, scale2)
        return point_cov, cam_cov, sigma2, n_obs, e

    pt = P(POINTS_AXIS)
    rep = P()
    point_cov_n, cam_cov_n, sigma2, n_obs, e = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pt, pt, rep, rep, rep, rep, pt, rep, rep),
        out_specs=(pt, rep, rep, rep, rep),
    )(x_p, X_p, *intrinsics_from_K(K, f0), t0, R0, vis_p, free, dist_in)
    return _finalize(point_cov_n[:n_orig], cam_cov_n, info, sigma2, n_obs, e)
