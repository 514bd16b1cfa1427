"""Point-partitioned sparse (observation-list) bundle adjustment.

Multi-chip scaling for the O(n_obs) core (``models/bundle_adjustment_
sparse.py``): observations are partitioned by *point ranges* (the list
is point-sorted, so each point's observations land on exactly one
device), the points themselves are sharded with their observations, and
the camera state is replicated. Cross-device traffic per LM retry is
the camera-side reductions (d_F, the (F, 9, 9) blocks, scalars) plus
one (9F,) psum per CG iteration — the observation arrays, the point
blocks, and the per-point back-substitution never leave their shard.

This is the same points-axis split as the dense-mask sharding
(``parallel/sharded_ba.py``), carried to the layout where P*F no longer
fits anywhere: at 100M observations over 16 devices each shard holds
~6M observations regardless of P*F.

Capability parity target: the reference is single-process NumPy
(SURVEY.md §2 #13 is new scope); semantics pinned against the
single-device sparse core, which is pinned against the dense core.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import dataclasses

from ..config import LMConfig
from ..models.bundle_adjustment import (
    BAResult,
    BAState,
    build_K,
    default_distortion,
    gauge_mask,
    intrinsics_from_K,
    normalize_gauge,
    resolve_distortion_model,
    resolve_robust,
    restore_gauge,
)
from ..models.bundle_adjustment_sparse import (
    SparseObs,
    fit_distortion_sparse,
    lm_optimize_sparse,
)

POINTS_AXIS = "points"


def partition_sparse_obs(
    point_idx: np.ndarray,
    cam_idx: np.ndarray,
    xy: np.ndarray,
    n_points: int,
    n_shards: int,
    weights: np.ndarray | None = None,
):
    """Host-side partition of a point-sorted observation list into
    ``n_shards`` equal-size blocks split at point boundaries.

    Points are split into contiguous ranges of ``ceil(P / n_shards)``;
    each shard's observations are re-indexed to shard-local point ids
    and padded with zero-weight observations (pointing at the shard's
    last point, camera 0) to the maximum shard size, so the stacked
    arrays are rectangular — the static shapes shard_map needs.

    Returns (obs_flat: SparseObs with flat (n_shards * n_max,) arrays —
    shard s owns rows [s n_max, (s+1) n_max), the layout a
    ``P("points")`` sharding of axis 0 splits block-wise —
    points_per_shard).
    """
    point_idx = np.asarray(point_idx)
    cam_idx = np.asarray(cam_idx)
    xy = np.asarray(xy)
    n = point_idx.shape[0]
    if xy.shape == (2, n) and xy.shape != (n, 2):
        xy = np.ascontiguousarray(xy.T)  # accept lane-major input too
    if np.any(np.diff(point_idx) < 0):
        raise ValueError("observation list must be sorted by point_idx")
    w = np.ones(point_idx.shape, xy.dtype) if weights is None \
        else np.asarray(weights)

    pps = -(-n_points // n_shards)  # ceil: points per shard
    # shard s owns points [s*pps, (s+1)*pps); observations split at the
    # first observation of each boundary point (searchsorted on the
    # sorted point ids)
    bounds = np.searchsorted(point_idx, np.arange(1, n_shards) * pps)
    splits = np.split(np.arange(point_idx.shape[0]), bounds)
    n_max = max((len(s) for s in splits), default=0)
    n_max = max(n_max, 1)

    pi_s = np.zeros((n_shards, n_max), np.int32)
    ci_s = np.zeros((n_shards, n_max), np.int32)
    xy_s = np.zeros((n_shards, 2, n_max), xy.dtype)  # lane-major per shard
    w_s = np.zeros((n_shards, n_max), xy.dtype)
    for s, idx in enumerate(splits):
        n = len(idx)
        pi_s[s, :n] = point_idx[idx] - s * pps
        ci_s[s, :n] = cam_idx[idx]
        xy_s[s, :, :n] = xy[idx].T
        w_s[s, :n] = w[idx]
        # padding: the shard's last point (keeps the sort), camera 0
        pi_s[s, n:] = min(pps, n_points - s * pps) - 1 if s * pps < n_points else 0
    return (
        SparseObs(
            point_idx=jnp.asarray(pi_s.reshape(-1)),
            cam_idx=jnp.asarray(ci_s.reshape(-1)),
            # (2, n_shards * n_max): shard s owns lane block s —
            # P(None, "points") splits the lane axis block-wise
            xy=jnp.asarray(
                np.ascontiguousarray(xy_s.transpose(1, 0, 2).reshape(2, -1))
            ),
            weights=jnp.asarray(w_s.reshape(-1)),
        ),
        pps,
    )


def sharded_bundle_adjust_sparse(
    mesh: Mesh,
    point_idx,
    cam_idx,
    xy,
    init_X: jax.Array,
    init_K: jax.Array,
    init_R: jax.Array,
    init_t: jax.Array,
    f0: float = 1.0,
    axis: str = "x-right_z-forward",
    config: LMConfig = LMConfig(),
    cg_tol: float = 1e-2,
    cg_max_iter: int = 100,
    obs_chunk: int = 1 << 20,
    weights=None,
    distortion: jax.Array | None = None,
    factor_dtype: str | None = None,
    factor_mode: str = "stored",
) -> BAResult:
    """Sparse BA over ``mesh``'s ``points`` axis. Observation arrays may
    be NumPy (the partition is host-side by nature); the result matches
    the single-device ``bundle_adjust_sparse`` on the same data.

    ``config.distortion_rounds`` alternates the psum-reduced closed-form
    refit with LM segments exactly as the single-device core.
    ``factor_dtype`` narrows the shard-local factor rows (see
    ``bundle_adjust_sparse``) — per-device capacity and mesh scaling
    compose."""
    n_shards = mesh.shape[POINTS_AXIS]
    dt = jnp.asarray(xy).dtype
    npts, nf = init_X.shape[0], init_K.shape[0]

    obs_s, pps = partition_sparse_obs(
        point_idx, cam_idx, xy, npts, n_shards, weights
    )

    X0, R0, t0, info = normalize_gauge(init_X, init_R, init_t, axis)
    pad_p = n_shards * pps - npts
    if pad_p:
        X0 = jnp.concatenate(
            [X0, jnp.broadcast_to(jnp.mean(X0, axis=0), (pad_p, 3))], axis=0
        )
    f_in, u_in = intrinsics_from_K(init_K, f0)
    cam0 = BAState(
        X=jnp.zeros((0, 3), dt), f=f_in, u=u_in,
        t=t0, R=R0,
    )
    free = gauge_mask(nf, axis, dt)
    dist = None if distortion is None else jnp.asarray(distortion, dt)
    model = resolve_distortion_model(dist, config.distortion_model)
    if config.distortion_rounds > 0 and dist is None:
        dist = default_distortion(model, nf, dt)
    robust_cfg = resolve_robust(config.robust)

    def local(obs_l, X_l, cam_r, free_r):
        state0 = BAState(X=X_l, f=cam_r.f, u=cam_r.u, t=cam_r.t, R=cam_r.R)
        dist_l = dist  # closed over: replicated constant
        c_seg, nu_seg = None, None
        n_total = jnp.asarray(0)
        for _ in range(config.distortion_rounds):
            dist_l = fit_distortion_sparse(
                state0._replace(X=X_l), obs_l, f0,
                shared=config.distortion_shared,
                huber_delta=(config.huber_delta if robust_cfg is not None
                             else None),
                dist=dist_l, model=model,
                robust_kind=robust_cfg or "huber",
                axis_name=POINTS_AXIS,
            )
            seg_cfg = dataclasses.replace(config, record_log=False)
            state0, _, c_seg, nu_seg, n_seg, _, _, _, _ = lm_optimize_sparse(
                obs_l, state0, free_r, f0, seg_cfg, cg_tol, cg_max_iter,
                obs_chunk, init_c=c_seg, init_nu=nu_seg, dist=dist_l,
                axis_name=POINTS_AXIS, factor_dtype=factor_dtype,
                factor_mode=factor_mode,
            )
            n_total = n_total + n_seg
        (final, e, c_f, nu_f, n_iter, n_retries, cg_total,
         scalar_log, _done) = lm_optimize_sparse(
            obs_l, state0, free_r, f0, config, cg_tol, cg_max_iter,
            obs_chunk, init_c=c_seg, init_nu=nu_seg, dist=dist_l,
            axis_name=POINTS_AXIS, factor_dtype=factor_dtype,
            factor_mode=factor_mode,
        )
        dist_out = (dist_l if dist_l is not None
                    else jnp.zeros((nf, 0), dt))
        if scalar_log is None:  # record_log static: structure is per-trace
            scalar_log = jnp.zeros((0,), dt)
        return (final.X, final.f, final.u, final.t, final.R, e, c_f, nu_f,
                n_iter + n_total, n_retries, cg_total, dist_out, scalar_log)

    pt, rep = P(POINTS_AXIS), P()
    obs_specs = SparseObs(pt, pt, P(None, POINTS_AXIS), pt)
    cam_specs = BAState(rep, rep, rep, rep, rep)
    (X_f, f_f, u_f, t_f, R_f, e, c_f, nu_f, n_iter, n_retries,
     cg_total, dist_f, scalar_log) = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(obs_specs, pt, cam_specs, rep),
            out_specs=(pt, rep, rep, rep, rep, rep, rep, rep, rep, rep,
                       rep, rep, rep),
        )
    )(obs_s, X0, cam0, free)

    X_full = X_f.reshape(-1, 3)[:npts]
    Xg, Rg, tg = restore_gauge(info, X_full, R_f, t_f)
    log = {"n_solver_retries": n_retries, "c": c_f, "nu": nu_f,
           "cg_iters_total": cg_total}
    if scalar_log.shape[0]:
        log["reprojection_error"] = scalar_log
    return BAResult(
        X=Xg, K=build_K(f_f, u_f, f0), R=Rg, t=tg, error=e,
        n_iter=n_iter,
        log=log,
        distortion=dist_f if dist_f.shape[-1] else None,
    )
