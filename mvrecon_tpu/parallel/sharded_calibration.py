"""Point-sharded perspective self-calibration (SPMD over a device mesh).

Round 1 left the calibration stage single-device (the global SVD of the
scaled observation matrix W (3F, P) was the blocker). The TPU-native
resolution: the depth loops never need the SVD itself — only W's leading
rank-4 subspace and a handful of scalar statistics. With P sharded,

- U4 (3F, 4) comes *exactly* from an eigh of the (3F, 3F) Gram
  G = W W^T = sum_p w_p w_p^T: each device contributes its local
  (3F, Pl) (Pl, 3F) matmul (MXU work) and a single psum of 9F^2 floats
  replaces the all-to-all an actual distributed SVD would need;
- the right factor rows stay local: V4_local = W_local^T U4 / sigma4;
- everything per-point (depth eigenproblems via the rank-4/rank-12
  factors, reprojection residuals, metric points) stays on-shard;
- everything per-camera (the 4x4x4x4 DAQ system, K updates, metric
  cameras) is replicated — it is O(F) work.

Per depth iteration the cross-device traffic is one (3F, 3F) psum + a few
scalars (dual adds an (F, 12, 12) psum and per-image norms) — the direct
analog of the BA Schur psum (`sharded_ba.py`).

Capability parity: reference ``lib/perspective_camera_calibration.py``
``:61-144`` (primary), ``:147-235`` (dual), ``:238-510`` (upgrade +
reconstruction), re-partitioned for SPMD; the single-device semantics are
pinned by tests against ``models.perspective``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import HIGHEST
from ..models.bundle_adjustment import _psum
from ..models.bundle_adjustment_chunked import _vary
from ..ops.linalg import jacobi_eigh
from ..models.perspective import (
    CalibrationResult,
    STATUS_MAX_ITER,
    STATUS_OK,
    STATUS_OMEGA_INDEFINITE,
    _kr_chunk,
    _kr_gram,
    _kr_xi,
    _sign_fix,
    _top_eigvec_lowrank,
    cheirality_score,
    euclidean_upgrading,
    homogenize,
    metric_cameras,
    metric_points,
    predict_world_axis,
)

POINTS_AXIS = "points"


def _rank4_subspace(wm_local: jax.Array, axis_name: str | None):
    """Leading rank-4 left subspace of W = [wm_local rows]^T (3F, P) from
    the psum-reduced Gram. Returns (u4 (3F, 4), sigma4 (4,)) in descending
    singular-value order (replicated)."""
    g = _psum(
        jnp.einsum("pa,pb->ab", wm_local, wm_local, precision=HIGHEST), axis_name
    )
    evals, evecs = jnp.linalg.eigh(g)  # ascending
    u4 = evecs[:, :-5:-1]  # top-4, descending
    sigma4 = jnp.sqrt(jnp.maximum(evals[:-5:-1], 0.0))
    return u4, sigma4


def _rank4_error(xh_l, wm_local, u4, f0, n_total, axis_name):
    """RMS reprojection error of the rank-4 approximation
    (reference ``_compute_reprojection_error``, ``:43-58``): the projected
    point is U4 U4^T w_p, whose per-point scale cancels in the homogeneous
    divide, so any consistent normalization of ``wm_local`` works."""
    nf = xh_l.shape[1]
    coeff = jnp.einsum("pa,ak->pk", wm_local, u4, precision=HIGHEST)  # (Pl, 4)
    px = jnp.einsum("pk,ak->pa", coeff, u4, precision=HIGHEST).reshape(-1, nf, 3)
    px = px / px[..., 2:3]
    sq = jnp.sum((xh_l - px) ** 2, axis=-1)  # (Pl, F)
    total = _psum(jnp.sum(sq), axis_name)
    return f0 * jnp.sqrt(total / (n_total * nf))


def _depth_step_primary_sharded(xh_l, z_l, f0, n_total, axis_name):
    """Sharded primary depth update (reference ``:79-133``): per-point
    work is local; the rank-4 subspace comes from the Gram psum."""
    npts_l, nf, _ = xh_l.shape
    w = xh_l * z_l[..., None]
    w = w / jnp.linalg.norm(w.reshape(npts_l, -1), axis=1)[:, None, None]
    wm = w.reshape(npts_l, 3 * nf)  # rows = points
    u4, _ = _rank4_subspace(wm, axis_name)

    xdotu = jnp.einsum(
        "pfi,fia->pfa", xh_l, u4.reshape(nf, 3, 4), precision=HIGHEST
    )
    xnorm = jnp.linalg.norm(xh_l, axis=2)  # (Pl, F)
    xi = _top_eigvec_lowrank(xdotu / xnorm[..., None])  # (Pl, F), local
    xi = _sign_fix(xi)
    z_new = xi / xnorm

    e = _rank4_error(xh_l, wm, u4, f0, n_total, axis_name)
    return z_new, e


def _depth_step_dual_sharded(xh_l, z_l, f0, n_total, axis_name):
    """Sharded dual depth update (reference ``:165-227``): per-image block
    norms, the Gram, and the (F, 12, 12) eigen-Grams psum; V4 rows and the
    resulting depths stay local."""
    npts_l, nf, _ = xh_l.shape
    w = xh_l * z_l[..., None]  # (Pl, F, 3)
    wt = w.transpose(1, 2, 0)  # (F, 3, Pl)
    norm_sq = _psum(jnp.sum(wt * wt, axis=(1, 2)), axis_name)  # (F,) global
    w = (wt / norm_sq[:, None, None]).transpose(2, 0, 1)
    wm = w.reshape(npts_l, 3 * nf)
    u4, sigma4 = _rank4_subspace(wm, axis_name)
    v4_l = jnp.einsum("pa,ak->pk", wm, u4, precision=HIGHEST) / sigma4  # (Pl, 4)

    xt = xh_l.transpose(1, 2, 0)  # (F, 3, Pl)
    xnorm = jnp.linalg.norm(xt, axis=1)  # (F, Pl)
    xn = xt / xnorm[:, None, :]
    if _kr_chunk(npts_l, nf, xh_l.dtype.itemsize) >= npts_l:
        y = v4_l.T[None, :, None, :] * xn[:, None, :, :]  # (F, 4, 3, Pl)
        y = y.reshape(nf, 12, npts_l).transpose(0, 2, 1)  # (F, Pl, 12)
        gram = _psum(
            jnp.einsum("fna,fnb->fab", y, y, precision=HIGHEST), axis_name
        )
        _, vecs = jacobi_eigh(gram)  # pure-XLA tiny-batch eigh (ops/linalg)
        xi_t = jnp.einsum("fna,fa->fn", y, vecs[..., -1], precision=HIGHEST)
    else:
        # Above the HBM budget the (F, Pl, 12) Khatri-Rao factor is never
        # materialized: per-image 12x12 Grams accumulate over point chunks
        # (models.perspective._kr_gram — one-shot it is 4.47 GB at the
        # 100k x 1000 north star, the measured v5e overflow), then psum.
        # The threshold split mirrors _depth_step_dual's (and its caution
        # note on eigensolver sign sensitivity).
        gram = _psum(_kr_gram(v4_l, xn), axis_name)
        _, vecs = jacobi_eigh(gram)
        xi_t = _kr_xi(v4_l, xn, vecs[..., -1])
    xi_t = xi_t / jnp.sqrt(
        _psum(jnp.sum(xi_t * xi_t, axis=-1), axis_name)
    )[:, None]
    if _kr_chunk(npts_l, nf, xh_l.dtype.itemsize) < npts_l:
        # per-image deterministic sign via the global component sum
        # (matches models.perspective._depth_step_dual's chunked branch)
        xi_t = jnp.where(
            (_psum(jnp.sum(xi_t, axis=-1), axis_name) < 0)[:, None],
            -xi_t, xi_t,
        )
    xi = _sign_fix(xi_t.T)  # (Pl, F)
    z_new = xi / xnorm.T

    e = _rank4_error(xh_l, wm, u4, f0, n_total, axis_name)
    return z_new, e


def _depth_loop(xh_l, f0, tol, method, max_iter, n_total, axis_name):
    """Bounded do-while over sharded depth steps (same stopping rule as
    ``models.perspective.projective_depths``)."""
    step = (
        _depth_step_primary_sharded if method == "primary" else _depth_step_dual_sharded
    )
    z0 = jnp.ones(xh_l.shape[:2], dtype=xh_l.dtype)
    big = jnp.asarray(jnp.inf, dtype=xh_l.dtype)

    def cond(carry):
        _, e, count = carry
        return (count == 0) | ((e >= tol) & (count < max_iter))

    def body(carry):
        z, _, count = carry
        z_new, e = step(xh_l, z, f0, n_total, axis_name)
        return z_new, e, count + 1

    # Only z is device-varying; the error/count come out of psums
    # (replicated), so they must enter the carry unvaried too.
    init = (_vary(z0, axis_name), big, jnp.asarray(0))
    return jax.lax.while_loop(cond, body, init)


def _calibrate_local(
    xh_l, f0, tol, method, max_iter, upgrade_max_iter, n_total, axis_name
):
    """Full calibration with local (sharded) points and replicated cameras.
    Mirrors ``models.perspective.perspective_self_calibration`` stage by
    stage; X stays sharded throughout."""
    z, depth_err, iters = _depth_loop(
        xh_l, f0, tol, method, max_iter, n_total, axis_name
    )

    # rank-4 factorization of the depth-scaled W (reference ``:531-533``)
    w = xh_l * z[..., None]
    wm = w.reshape(w.shape[0], -1)  # (Pl, 3F)
    u4, _ = _rank4_subspace(wm, axis_name)
    nf = xh_l.shape[1]
    p = u4.reshape(nf, 3, 4)
    s_l = jnp.einsum("pa,ak->kp", wm, u4, precision=HIGHEST)  # (4, Pl) local

    h, k, ok = euclidean_upgrading(p, f0, max_iter=upgrade_max_iter)  # replicated

    x_l = metric_points(s_l, h)  # (Pl, 3) local
    r, t = metric_cameras(p, k, h)  # replicated
    flip = _psum(cheirality_score(x_l, r, t), axis_name) <= 0
    x_l = jnp.where(flip, -x_l, x_l)
    t = jnp.where(flip, -t, t)
    x_l, r, t = predict_world_axis(x_l, r, t)  # camera-side means; X local

    status = jnp.where(
        ~ok,
        STATUS_OMEGA_INDEFINITE,
        jnp.where(iters >= max_iter, STATUS_MAX_ITER, STATUS_OK),
    )
    return x_l, r, t, k, depth_err, iters, status


@partial(
    jax.jit,
    static_argnames=("mesh", "f0", "tol", "method", "max_iter", "upgrade_max_iter"),
)
def sharded_perspective_self_calibration(
    mesh: Mesh,
    x: jax.Array,
    f0: float = 1.0,
    tol: float = 0.01,
    method: str = "dual",
    max_iter: int | None = None,
    upgrade_max_iter: int = 100,
) -> CalibrationResult:
    """Perspective self-calibration with the P axis of observations
    (F, P, 2) sharded over ``mesh``'s ``points`` axis.

    Calibration keeps the reference's full-visibility contract, so P must
    be divisible by the shard count (no mask channel exists to neutralize
    padding); raise rather than silently contaminate the Gram.
    """
    if method not in ("primary", "dual"):
        raise ValueError(f"unknown method: {method}")
    if max_iter is None:
        max_iter = 200 if method == "primary" else 50

    n_shards = mesh.shape[POINTS_AXIS]
    npts = x.shape[1]
    if npts % n_shards != 0:
        raise ValueError(
            f"P={npts} must be divisible by the points-axis size {n_shards} "
            "(calibration has no visibility channel to mask padding)"
        )
    xh = homogenize(x, f0)  # (P, F, 3)

    run = partial(
        _calibrate_local,
        f0=f0,
        tol=tol,
        method=method,
        max_iter=max_iter,
        upgrade_max_iter=upgrade_max_iter,
        n_total=npts,
        axis_name=POINTS_AXIS,
    )
    pt, rep = P(POINTS_AXIS), P()
    x_l, r, t, k, depth_err, iters, status = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(pt,),
        out_specs=(pt, rep, rep, rep, rep, rep, rep),
    )(xh)
    return CalibrationResult(
        X=x_l, R=r, t=t, K=k, depth_error=depth_err, depth_iters=iters, status=status
    )
