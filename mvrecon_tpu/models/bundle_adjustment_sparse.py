"""Sparse observation-list bundle adjustment — O(n_obs) memory.

Every other core represents visibility as a dense (P, F) mask over dense
(P, F, 2) observations — faithful to the reference's contract
(``/root/reference/lib/bundle_adjustment.py:56-59``) and right up to
~20% fill, but memory scales as P*F rather than n_observations. Real
BAL-class problems (thousands of cameras, ~0.1-1% fill) need the layout
production BA systems use: a flat observation list.

TPU-native design (this is NOT a sparse-matrix port):

- **Layout**: three static-shape arrays sorted by point id —
  ``point_idx (N,) int32``, ``cam_idx (N,) int32``, ``xy (N, 2)`` —
  plus a camera-sorted permutation computed once per call. Static N,
  static everything: one compile per problem shape.
- **Per-observation work is the virtual-camera trick**: the observation
  list is treated as ONE point seen by N per-observation "cameras"
  (camera parameters gathered per observation), so the whole model-
  generic distortion chain (six families), the robust-loss family, and
  the residual formulas of the dense core apply verbatim on (1, N)-
  shaped arrays — zero formula duplication.
- **Point side**: per-point 3x3 blocks and gradients via sorted
  ``segment_sum`` over point ids (points are the sorted axis).
- **Camera side**: the reduced camera (Schur) system is NEVER formed.
  The damped Schur complement S = G^ - F^T E^-1 F is applied matrix-
  free: each matvec is two gathers, two rowwise dots, one sorted
  point-segment-sum, a batched 3x3 solve, and one camera-segment-sum —
  O(n_obs) FLOPs and bytes. A block-Jacobi (SCHUR_JACOBI) 9x9
  preconditioner built once per retry makes PCG converge in tens of
  iterations. This is the ITERATIVE_SCHUR architecture of production
  BA solvers, recast as gathers + segment reductions + a
  ``while_loop`` — the shapes XLA:TPU runs well.
- **LM protocol**: identical to the dense/chunked cores (Nielsen or
  reference damping, accept test, never-accepted stop, gauge handling
  via ``normalize_gauge``/``gauge_mask``), so segmented resume and the
  stopping contract (reference ``:186-191``) carry over.

Memory: factors resident per retry are (N, 24) floats (a1, a2, b1, b2)
plus (P, 3, 3) point blocks — ~1.1 GB at N=10M observations, P=1M
points; transient (N, 81)-class products are bounded by ``obs_chunk``
via ``lax.scan``. A dense mask at that scale would be 16 GB for the
observations alone.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import HIGHEST, STATE_HIGHEST, LMConfig
from ..ops.linalg import inv3x3, inv9_spd
from .bundle_adjustment import (
    BAResult,
    BAState,
    _apply_distortion_chain,
    _apply_update,
    _distorted_residual,
    _psum,
    _distortion_lsq_terms,
    _fov_gn_terms,
    _full_opencv_lsq_terms,
    _solve_distortion_lsq,
    _solve_fov_step,
    _solve_full_opencv_round,
    FULL_OPENCV_ALTERNATIONS,
    _FOV_GN_STEPS,
    build_K,
    default_distortion,
    distortion_nterms,
    gauge_mask,
    normalize_gauge,
    resolve_distortion_model,
    resolve_robust,
    restore_gauge,
    robust_weight,
)


class SparseObs(NamedTuple):
    """Observation list sorted ascending by ``point_idx``.

    ``weights`` are optional per-observation confidences (multiplied into
    the IRLS weights); padding observations carry weight 0.
    """

    point_idx: jax.Array  # (N,) int32, sorted ascending
    cam_idx: jax.Array  # (N,) int32
    xy: jax.Array  # (N, 2)
    weights: jax.Array  # (N,)


def make_sparse_obs(point_idx, cam_idx, xy, weights=None) -> SparseObs:
    """Host-side constructor: sorts by point id (stable, so per-point
    camera order is preserved) and validates shapes."""
    point_idx = np.asarray(point_idx)
    cam_idx = np.asarray(cam_idx)
    xy = np.asarray(xy)
    if not (point_idx.shape == cam_idx.shape == xy.shape[:-1]) or xy.shape[-1] != 2:
        raise ValueError(
            f"inconsistent observation shapes: {point_idx.shape}, "
            f"{cam_idx.shape}, {xy.shape}"
        )
    w = np.ones(point_idx.shape, xy.dtype) if weights is None else np.asarray(weights)
    order = np.argsort(point_idx, kind="stable")
    return SparseObs(
        point_idx=jnp.asarray(point_idx[order], jnp.int32),
        cam_idx=jnp.asarray(cam_idx[order], jnp.int32),
        xy=jnp.asarray(xy[order]),
        weights=jnp.asarray(w[order], xy.dtype),
    )


def dense_to_sparse_obs(x: np.ndarray, visibility: np.ndarray) -> SparseObs:
    """(P, F, 2) dense observations + (P, F) mask -> observation list
    (the bridge the parity tests use; point-major order = sorted)."""
    x = np.asarray(x)
    vis = np.asarray(visibility)
    pi, ci = np.nonzero(vis > 0)
    return SparseObs(
        point_idx=jnp.asarray(pi, jnp.int32),
        cam_idx=jnp.asarray(ci, jnp.int32),
        xy=jnp.asarray(x[pi, ci]),
        weights=jnp.asarray(vis[pi, ci], x.dtype),
    )


def _gathered_cam_state(cam: BAState, ci: jax.Array) -> BAState:
    """Per-observation camera parameters: a BAState whose camera axis is
    the observation axis (the virtual-camera trick)."""
    return BAState(
        X=cam.X,  # (0, 3) placeholder, unused downstream
        f=cam.f[ci],
        u=cam.u[ci],
        t=cam.t[ci],
        R=cam.R[ci],
    )


def _calc_pmat(cam: BAState, f0: float) -> jax.Array:
    """(F, 3, 4) camera matrices (the camera half of the dense core's
    ``calc_pqr``, reference ``:291-307``)."""
    K = build_K(cam.f, cam.u, f0)
    rt = jnp.swapaxes(cam.R, -1, -2)
    trans = -jnp.einsum("fij,fj->fi", rt, cam.t, precision=STATE_HIGHEST)
    return jnp.einsum(
        "fij,fjk->fik", K, jnp.concatenate([rt, trans[..., None]], axis=-1),
        precision=STATE_HIGHEST,
    )


def _obs_factors(cam: BAState, X: jax.Array, obs: SparseObs, f0: float,
                 huber_delta=None, dist=None, model: str | None = None,
                 robust_kind: str = "huber"):
    """Per-observation residuals and rank-2 Jacobian factors.

    Returns (a1, a2 (N, 3); b1, b2 (N, 9); res_p, res_q (N,); w (N,))
    with w the effective weight (input weight x IRLS robust weight).
    Same math as the dense core's ``_compute_derivs`` (reference
    ``:291-427``), evaluated per observation via gathers.
    """
    pi, ci = obs.point_idx, obs.cam_idx
    w = obs.weights
    pm = _calc_pmat(cam, f0)[ci]  # (N, 3, 4)
    X_g = X[pi]  # (N, 3)
    xh = jnp.concatenate([X_g, jnp.ones((X_g.shape[0], 1), X_g.dtype)], -1)
    pqr = jnp.einsum("nca,na->nc", pm, xh, precision=STATE_HIGHEST)
    p, q, r = pqr[:, 0], pqr[:, 1], pqr[:, 2]
    r = jnp.where(w > 0, r, jnp.ones_like(r))  # 0*inf guard (padding)

    f_g, u_g = cam.f[ci], cam.u[ci]
    R_g, t_g = cam.R[ci], cam.t[ci]

    res_p = p / r - obs.xy[:, 0] / f0
    res_q = q / r - obs.xy[:, 1] / f0

    # point rows: dX of (p, q, r) are the pmat rows (reference :309-322)
    dpdX, dqdX, drdX = pm[:, 0, :3], pm[:, 1, :3], pm[:, 2, :3]
    inv_r2 = 1.0 / (r * r)
    a1 = (r[:, None] * dpdX - p[:, None] * drdX) * inv_r2[:, None]
    a2 = (r[:, None] * dqdX - q[:, None] * drdX) * inv_r2[:, None]

    # camera rows, per observation (reference :324-398)
    dpdf = (p - (u_g[:, 0] / f0) * r) / f_g
    dqdf = (q - (u_g[:, 1] / f0) * r) / f_g
    zeros = jnp.zeros_like(r)
    r_f0 = r / f0
    dpdu = jnp.stack([r_f0, zeros], -1)
    dqdu = jnp.stack([zeros, r_f0], -1)
    dpdt = -(f_g[:, None] * R_g[:, :, 0] + u_g[:, :1] * R_g[:, :, 2])
    dqdt = -(f_g[:, None] * R_g[:, :, 1] + u_g[:, 1:2] * R_g[:, :, 2])
    drdt = -f0 * R_g[:, :, 2]
    x_m_t = X_g - t_g
    dpdw = jnp.cross(-dpdt, x_m_t)
    dqdw = jnp.cross(-dqdt, x_m_t)
    drdw = jnp.cross(-drdt, x_m_t)
    dp = jnp.concatenate([dpdf[:, None], dpdu, dpdt, dpdw], -1)  # (N, 9)
    dq = jnp.concatenate([dqdf[:, None], dqdu, dqdt, dqdw], -1)
    dr = jnp.concatenate([zeros[:, None], jnp.zeros_like(dpdu), drdt, drdw], -1)
    b1 = (r[:, None] * dp - p[:, None] * dr) * inv_r2[:, None]
    b2 = (r[:, None] * dq - q[:, None] * dr) * inv_r2[:, None]

    if dist is not None:
        # virtual-camera trick: (1, N)-shaped arrays + per-observation
        # camera/distortion rows run the model-generic chain verbatim
        cam_n = _gathered_cam_state(cam, ci)
        res_p, res_q, a1, a2, b1, b2 = jax.tree.map(
            lambda t: t[0],
            _apply_distortion_chain(
                cam_n, p[None], q[None], r[None], f0, dist[ci],
                res_p[None], res_q[None], a1[None], a2[None],
                b1[None], b2[None], model,
            ),
        )

    if huber_delta is not None:
        mag = jnp.sqrt(res_p**2 + res_q**2)
        w = w * robust_weight(mag, huber_delta, robust_kind)
    return a1, a2, b1, b2, res_p, res_q, w


def _trial_error(cam: BAState, X: jax.Array, obs: SparseObs, w: jax.Array,
                 f0: float, dist, model, axis_name=None):
    """Sum of w-weighted squared residuals at (cam, X); ``w`` carries the
    IRLS weights of the *current* state (chunked-core convention)."""
    pi, ci = obs.point_idx, obs.cam_idx
    pm = _calc_pmat(cam, f0)[ci]
    X_g = X[pi]
    xh = jnp.concatenate([X_g, jnp.ones((X_g.shape[0], 1), X_g.dtype)], -1)
    pqr = jnp.einsum("nca,na->nc", pm, xh, precision=STATE_HIGHEST)
    p, q, r = pqr[:, 0], pqr[:, 1], pqr[:, 2]
    r = jnp.where(w > 0, r, jnp.ones_like(r))
    cam_n = _gathered_cam_state(cam, ci)
    res_p, res_q = _distorted_residual(
        cam_n, p[None], q[None], r[None], obs.xy[None], f0,
        None if dist is None else dist[ci], model,
    )
    return _psum(jnp.sum(w * (res_p[0] ** 2 + res_q[0] ** 2)), axis_name)


def _segment_cam_sum(vals: jax.Array, perm: jax.Array, ci_sorted: jax.Array,
                     nf: int) -> jax.Array:
    """Per-camera sum of per-observation values: permute into camera-
    sorted order (one gather), then a sorted segment reduction."""
    return jax.ops.segment_sum(
        vals[perm], ci_sorted, num_segments=nf, indices_are_sorted=True
    )


def _camera_blocks_scan(b1, b2, alpha, w2, perm, ci_sorted, nf, obs_chunk,
                        axis_name=None):
    """(F, 9, 9) camera blocks G and the preconditioner's correction
    C_c = sum_n alpha11 b1 b1^T + alpha12 (b1 b2^T + b2 b1^T) + alpha22
    b2 b2^T, accumulated over observation chunks so the (chunk, 9, 9)
    outer products never materialize at full N."""
    n = b1.shape[0]
    pad = (-n) % obs_chunk
    dt = b1.dtype

    def pad0(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    b1s, b2s = pad0(b1[perm]), pad0(b2[perm])
    a11, a12, a22 = (pad0(alpha[i][perm]) for i in range(3))
    w2s = pad0(w2[perm])
    cis = jnp.pad(ci_sorted, (0, pad), constant_values=nf - 1)
    nch = (n + pad) // obs_chunk

    def chunked(a):
        return a.reshape((nch, obs_chunk) + a.shape[1:])

    def body(acc, inp):
        g_acc, c_acc = acc
        b1c, b2c, a11c, a12c, a22c, w2c, cic = inp
        o11 = jnp.einsum("ni,nj->nij", b1c, b1c, precision=HIGHEST)
        o12 = jnp.einsum("ni,nj->nij", b1c, b2c, precision=HIGHEST)
        o22 = jnp.einsum("ni,nj->nij", b2c, b2c, precision=HIGHEST)
        g_c = w2c[:, None, None] * (o11 + o22)
        c_c = (
            a11c[:, None, None] * o11
            + a12c[:, None, None] * (o12 + jnp.swapaxes(o12, -1, -2))
            + a22c[:, None, None] * o22
        )
        seg = lambda v: jax.ops.segment_sum(
            v, cic, num_segments=nf, indices_are_sorted=True
        )
        return (g_acc + seg(g_c), c_acc + seg(c_c)), None

    from .bundle_adjustment_chunked import _vary

    init = _vary(
        (jnp.zeros((nf, 9, 9), dt), jnp.zeros((nf, 9, 9), dt)), axis_name
    )
    (g, c), _ = jax.lax.scan(
        body, init,
        tuple(map(chunked, (b1s, b2s, a11, a12, a22, w2s, cis))),
    )
    return g, c


def _build_sparse_system(cam, X, obs, perm, ci_sorted, free, f0, c,
                         huber_delta, dist, model, robust_kind, obs_chunk,
                         axis_name=None):
    """One damped build: point blocks + gradients + camera blocks +
    block-Jacobi preconditioner + rhs. Returns everything the CG solve
    and back-substitution need, plus the weighted error at the current
    state.

    With ``axis_name`` (inside shard_map over a point-partitioned
    observation list) the camera-side accumulations (d_F, matG, the
    preconditioner correction, rhs, error) psum across devices;
    everything point-side stays shard-local — the same split as the
    chunked core's sharding (``parallel/sharded_ba.py``)."""
    npts, nf = X.shape[0], cam.f.shape[0]
    dt = X.dtype
    a1, a2, b1, b2, res_p, res_q, w = _obs_factors(
        cam, X, obs, f0, huber_delta, dist, model, robust_kind
    )
    e_now = _psum(jnp.sum(w * (res_p**2 + res_q**2)), axis_name)
    w2 = 2.0 * w
    pi = obs.point_idx

    seg_p = lambda v: jax.ops.segment_sum(
        v, pi, num_segments=npts, indices_are_sorted=True
    )
    # point gradient and blocks (reference :437-446 / :463-500)
    d_P = seg_p(w2[:, None] * (res_p[:, None] * a1 + res_q[:, None] * a2))
    matE = seg_p(
        w2[:, None, None]
        * (
            jnp.einsum("ni,nj->nij", a1, a1, precision=HIGHEST)
            + jnp.einsum("ni,nj->nij", a2, a2, precision=HIGHEST)
        )
    )
    seen = (seg_p(w) > 0).astype(dt)
    matE = matE + (1.0 - seen)[:, None, None] * jnp.eye(3, dtype=dt)
    matEc = matE + c * matE * jnp.eye(3, dtype=dt)[None]
    einv = inv3x3(matEc)

    # camera gradient d_F (9F,)
    d_F = _psum(
        _segment_cam_sum(
            w2[:, None] * (res_p[:, None] * b1 + res_q[:, None] * b2),
            perm, ci_sorted, nf,
        ).reshape(9 * nf),
        axis_name,
    ) * free

    # alpha scalars for the SCHUR_JACOBI correction: a_i^T Einv a_j per
    # observation (Einv gathered per point). The w2 weighting enters each
    # F_n = w2 (a1 b1^T + a2 b2^T) twice but Einv once: fold w2 * w2 into
    # alpha (w2 is already inside matE, hence inside Einv exactly once).
    einv_g = einv[pi]
    ea1 = jnp.einsum("nij,nj->ni", einv_g, a1, precision=HIGHEST)
    ea2 = jnp.einsum("nij,nj->ni", einv_g, a2, precision=HIGHEST)
    al11 = w2 * w2 * jnp.sum(a1 * ea1, -1)
    al12 = w2 * w2 * jnp.sum(a1 * ea2, -1)
    al22 = w2 * w2 * jnp.sum(a2 * ea2, -1)

    matG, corr = _camera_blocks_scan(
        b1, b2, (al11, al12, al22), w2, perm, ci_sorted, nf, obs_chunk,
        axis_name,
    )
    matG = _psum(matG, axis_name)
    corr = _psum(corr, axis_name)
    matGc = matG + c * matG * jnp.eye(9, dtype=dt)[None]
    seen_c = (
        _psum(_segment_cam_sum(w, perm, ci_sorted, nf), axis_name) > 0
    ).astype(dt)

    # block-Jacobi preconditioner: the true Schur diagonal blocks,
    # gauge-projected then inverted (fixed coords become identity rows)
    m_blocks = matGc - corr
    free_b = free.reshape(nf, 9)
    m_blocks = m_blocks * (free_b[:, :, None] * free_b[:, None, :])
    fix = 1.0 - free_b
    m_blocks = m_blocks + jnp.eye(9, dtype=dt)[None] * (
        fix + (1.0 - seen_c)[:, None] * free_b
    )[:, :, None]
    m_inv = inv9_spd(m_blocks)

    # rhs: b = F^T Einv d_P - d_F (gauge-masked), reference :532-560
    wp = jnp.einsum("pij,pj->pi", einv, d_P, precision=HIGHEST)  # (P, 3)
    wp_g = wp[pi]
    r1 = w2 * jnp.sum(a1 * wp_g, -1)
    r2 = w2 * jnp.sum(a2 * wp_g, -1)
    b_f = _psum(
        _segment_cam_sum(
            r1[:, None] * b1 + r2[:, None] * b2, perm, ci_sorted, nf
        ).reshape(9 * nf),
        axis_name,
    )
    rhs = (b_f - d_F) * free

    diag_g = jnp.diagonal(matG, axis1=-2, axis2=-1).reshape(-1)  # undamped

    factors = (a1, a2, b1, b2, w2, einv, d_P)
    return factors, matGc, m_inv, rhs, d_F, diag_g, e_now, matE, seen_c


def _schur_matvec(v, factors, matGc, obs, perm, ci_sorted, free, seen_c,
                  axis_name=None):
    """S v for the damped, gauge-projected Schur complement — matrix-free,
    O(n_obs). v is (9F,). Under sharding only the F^T Einv F correction
    psums (one (9F,) vector per CG iteration — the entire cross-device
    traffic of a camera step); the Gc v product uses the already-reduced
    camera blocks, replicated."""
    a1, a2, b1, b2, w2, einv, _ = factors
    nf = matGc.shape[0]
    vm = (v * free).reshape(nf, 9)
    pi, ci = obs.point_idx, obs.cam_idx
    v_g = vm[ci]  # (N, 9)
    u1 = w2 * jnp.sum(b1 * v_g, -1)
    u2 = w2 * jnp.sum(b2 * v_g, -1)
    t_n = u1[:, None] * a1 + u2[:, None] * a2  # (N, 3) = F v rows
    s_p = jax.ops.segment_sum(
        t_n, pi, num_segments=einv.shape[0], indices_are_sorted=True
    )
    w_p = jnp.einsum("pij,pj->pi", einv, s_p, precision=HIGHEST)
    w_g = w_p[pi]
    r1 = w2 * jnp.sum(a1 * w_g, -1)
    r2 = w2 * jnp.sum(a2 * w_g, -1)
    fe_fv = _psum(
        _segment_cam_sum(
            r1[:, None] * b1 + r2[:, None] * b2, perm, ci_sorted, nf
        ),
        axis_name,
    )
    gv = jnp.einsum("fij,fj->fi", matGc, vm, precision=HIGHEST)
    sv = ((gv + (1.0 - seen_c)[:, None] * vm - fe_fv).reshape(-1)) * free
    return sv + (1.0 - free) * v  # identity on gauge-fixed coords


def _pcg(matvec, precond, b, tol, max_iter, dt):
    """Preconditioned conjugate gradients with relative-residual stop.
    All reduction scalars at HIGHEST precision."""
    b_norm2 = jnp.vdot(b, b, precision=HIGHEST)
    tol2 = (tol * tol) * jnp.maximum(b_norm2, jnp.asarray(1e-30, dt))

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)

    def cond(carry):
        _, r, _, _, k, rr = carry
        return (rr > tol2) & (k < max_iter)

    def body(carry):
        x, r, z, p, k, _ = carry
        ap = matvec(p)
        pap = jnp.vdot(p, ap, precision=HIGHEST)
        rz = jnp.vdot(r, z, precision=HIGHEST)
        alpha = rz / jnp.where(pap > 0, pap, 1.0)
        alpha = jnp.where(pap > 0, alpha, 0.0)
        x1 = x + alpha * p
        r1 = r - alpha * ap
        z1 = precond(r1)
        rz1 = jnp.vdot(r1, z1, precision=HIGHEST)
        beta = rz1 / jnp.where(rz != 0, rz, 1.0)
        p1 = z1 + beta * p
        rr1 = jnp.vdot(r1, r1, precision=HIGHEST)
        return x1, r1, z1, p1, k + 1, rr1

    x, _, _, _, n_iter, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, jnp.asarray(0), b_norm2)
    )
    return x, n_iter


def lm_optimize_sparse(
    obs: SparseObs,
    state0: BAState,
    free: jax.Array,
    f0: float,
    config: LMConfig,
    cg_tol: float = 1e-2,
    cg_max_iter: int = 100,
    obs_chunk: int = 1 << 20,
    init_c: jax.Array | None = None,
    init_nu: jax.Array | None = None,
    dist: jax.Array | None = None,
    axis_name: str | None = None,
):
    """Observation-list LM with the dense core's exact protocol
    (reference ``bundle_adjustment.py:77-195``), the camera step solved
    by SCHUR_JACOBI-preconditioned CG. Returns
    (state, error, c, nu, n_iter, total_solver_retries, cg_iters_total).

    With ``axis_name`` set (inside shard_map over a point-partitioned
    observation list; see ``parallel/sharded_ba_sparse.py``) the camera-
    side quantities psum across devices; per CG iteration the entire
    cross-device traffic is one (9F,) psum.
    """
    dt = obs.xy.dtype
    npts, nf = state0.X.shape[0], state0.f.shape[0]
    model = resolve_distortion_model(dist, config.distortion_model)
    obs_chunk = min(obs_chunk, max(obs.xy.shape[0], 1))

    perm = jnp.argsort(obs.cam_idx, stable=True)
    ci_sorted = obs.cam_idx[perm]

    nielsen = config.damping == "nielsen"
    robust_cfg = resolve_robust(config.robust)
    huber_delta = config.huber_delta if robust_cfg is not None else None
    robust_kind = robust_cfg or "huber"

    def split(state):
        return state._replace(X=jnp.zeros((0, 3), dt)), state.X

    def weights_at(cam, X):
        if huber_delta is None:
            return obs.weights
        _, _, _, _, rp, rq, w = _obs_factors(
            cam, X, obs, f0, huber_delta, dist, model, robust_kind
        )
        return w

    def error_of(cam, X):
        return _trial_error(cam, X, obs, weights_at(cam, X), f0, dist,
                            model, axis_name)

    cam0, X0 = split(state0)
    e0 = _trial_error(cam0, X0, obs, obs.weights, f0, dist, model,
                      axis_name) \
        if huber_delta is None else error_of(cam0, X0)

    # O(max_iter) scalar error curve — the chunked core's record_log
    # contract (scale-aware debug logging; full-state animation logs are
    # exactly what an O(n_obs) core exists to avoid)
    record = config.record_log
    log0 = (jnp.zeros((config.max_iter + 1,), dt).at[0].set(e0)
            if record else jnp.zeros((0,), dt))

    def inner(cam, X, e_prev, c, nu):
        def cond(carry):
            accepted, tries = carry[-2], carry[-1]
            return (~accepted) & (tries < config.max_inner_retries)

        def body(carry):
            c_cur, nu_cur, _, _, _, _, cg_tot, _, tries = carry
            (factors, matGc, m_inv, rhs, d_F, diag_g, e_w, matE, seen_c
             ) = _build_sparse_system(
                cam, X, obs, perm, ci_sorted, free, f0, c_cur,
                huber_delta, dist, model, robust_kind, obs_chunk,
                axis_name,
            )

            def mv(v):
                return _schur_matvec(
                    v, factors, matGc, obs, perm, ci_sorted, free, seen_c,
                    axis_name,
                )

            def pc(v):
                return (
                    jnp.einsum(
                        "fij,fj->fi", m_inv, v.reshape(nf, 9),
                        precision=HIGHEST,
                    ).reshape(-1)
                )

            delta_xi, cg_iters = _pcg(mv, pc, rhs, cg_tol, cg_max_iter, dt)
            delta_xi = delta_xi * free

            # back-substitute points: delta_X = -Einv (F delta + d_P)
            a1, a2, b1, b2, w2, einv, d_P = factors
            v_g = delta_xi.reshape(nf, 9)[obs.cam_idx]
            u1 = w2 * jnp.sum(b1 * v_g, -1)
            u2 = w2 * jnp.sum(b2 * v_g, -1)
            f_dxi = jax.ops.segment_sum(
                u1[:, None] * a1 + u2[:, None] * a2, obs.point_idx,
                num_segments=npts, indices_are_sorted=True,
            )
            delta_X = -jnp.einsum(
                "pij,pj->pi", einv, f_dxi + d_P, precision=HIGHEST
            )
            X_new = X + delta_X

            trial_cam = _apply_update(cam, delta_xi, jnp.zeros((0, 3), dt))
            w_cur = weights_at(cam, X)
            e_trial = _trial_error(trial_cam, X_new, obs, w_cur, f0, dist,
                                   model, axis_name)
            e_base = e_w if huber_delta is not None else e_prev
            accepted = e_trial <= e_base
            if nielsen:
                diag_e = jnp.diagonal(matE, axis1=-2, axis2=-1)
                dDd = (
                    _psum(jnp.sum(delta_X * diag_e * delta_X), axis_name)
                    + jnp.sum(delta_xi * diag_g * delta_xi)
                )
                g_d = (
                    _psum(jnp.sum(d_P * delta_X), axis_name)
                    + jnp.sum(d_F * delta_xi)
                )
                pred = 0.5 * (c_cur * dDd - g_d)
                rho = (e_base - e_trial) / jnp.maximum(pred, 1e-30)
                shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
                c_next = jnp.where(accepted, c_cur * shrink, c_cur * nu_cur)
                nu_next = jnp.where(
                    accepted, jnp.full_like(nu_cur, 2.0), nu_cur * 2.0
                )
            else:
                c_next = jnp.where(accepted, c_cur, c_cur * config.scale_factor)
                nu_next = nu_cur
            return (c_next, nu_next, e_trial, e_base, trial_cam, X_new,
                    cg_tot + cg_iters, accepted, tries + 1)

        dummy_cam = jax.tree.map(jnp.zeros_like, cam)
        (c_out, nu_out, e_new, e_base_out, trial_cam, X_new, cg_tot,
         accepted, tries) = jax.lax.while_loop(
            cond, body,
            (c, nu, jnp.asarray(jnp.inf, dt), e_prev, dummy_cam,
             jnp.zeros_like(X), jnp.asarray(0), jnp.asarray(False), 0),
        )
        trial_cam = jax.tree.map(
            lambda a, b: jnp.where(accepted, a, b), trial_cam, cam
        )
        X_new = jnp.where(accepted, X_new, X)
        e_new = jnp.where(accepted, e_new, e_base_out)
        return c_out, nu_out, e_new, e_base_out, trial_cam, X_new, cg_tot, tries

    def cond(carry):
        count, done = carry[5], carry[6]
        return (~done) & (count < config.max_iter)

    def body(carry):
        cam, X, e_prev, c, nu, count, _, retries, cg_tot, log = carry
        (c_new, nu_new, e_new, e_base, cam_new, X_new, cg_in, tries) = inner(
            cam, X, e_prev, c, nu
        )
        done = jnp.abs(e_new - e_base) <= config.delta_tol
        c_out = c_new if nielsen else c_new / config.divisor
        if record:
            log = log.at[count + 1].set(e_new)
        return (cam_new, X_new, e_new, c_out, nu_new, count + 1, done,
                retries + tries, cg_tot + cg_in, log)

    c0 = (jnp.asarray(config.init_damping, dt) if init_c is None
          else jnp.asarray(init_c, dt))
    nu0 = jnp.asarray(2.0, dt) if init_nu is None else jnp.asarray(init_nu, dt)
    (cam_f, X_f, e_f, c_f, nu_f, n_iter, _, n_retries, cg_total,
     log_f) = jax.lax.while_loop(
        cond, body,
        (cam0, X0, e0, c0, nu0, jnp.asarray(0), jnp.asarray(False),
         jnp.asarray(0), jnp.asarray(0), log0),
    )
    return (cam_f._replace(X=X_f), e_f, c_f, nu_f, n_iter, n_retries,
            cg_total, log_f if record else None)


def fit_distortion_sparse(
    state: BAState, obs: SparseObs, f0: float, shared: bool = False,
    huber_delta: float | None = None, dist=None,
    model: str | None = None, robust_kind: str = "huber",
    axis_name: str | None = None,
) -> jax.Array:
    """Closed-form distortion refit on the observation list: the dense
    core's per-camera normal-equation accumulands (every family) are
    per-observation quantities under the virtual-camera trick, then one
    camera-segment-sum (psum-reduced under sharding) replaces the dense
    per-point reduction."""
    if model is None:
        model = resolve_distortion_model(dist, "auto")
    pi, ci = obs.point_idx, obs.cam_idx
    nf = state.f.shape[0]
    cam = state._replace(X=jnp.zeros((0, 3), obs.xy.dtype))
    pm = _calc_pmat(cam, f0)[ci]
    X_g = state.X[pi]
    xh = jnp.concatenate([X_g, jnp.ones((X_g.shape[0], 1), X_g.dtype)], -1)
    pqr = jnp.einsum("nca,na->nc", pm, xh, precision=STATE_HIGHEST)
    p, q, r = pqr[:, 0][None], pqr[:, 1][None], pqr[:, 2][None]
    w = obs.weights
    cam_n = _gathered_cam_state(cam, ci)
    if huber_delta is not None:
        rs = jnp.where(w[None] > 0, r, jnp.ones_like(r))
        res_p, res_q = _distorted_residual(
            cam_n, p, q, rs, obs.xy[None], f0,
            None if dist is None else dist[ci], model,
        )
        mag = jnp.sqrt(res_p[0] ** 2 + res_q[0] ** 2)
        w = w * robust_weight(mag, huber_delta, robust_kind)

    perm = jnp.argsort(ci, stable=True)
    ci_sorted = ci[perm]

    def seg(per_obs_terms):
        # terms arrive (N, k) from the (1, N) virtual-camera evaluation
        return _psum(
            _segment_cam_sum(per_obs_terms, perm, ci_sorted, nf), axis_name
        )

    x_n = obs.xy[None]
    vis_n = w[None]
    if model == "full_opencv":
        cur = dist if dist is not None else jnp.zeros((nf, 8), obs.xy.dtype)
        for _ in range(FULL_OPENCV_ALTERNATIONS):
            for round_ in ("num", "den"):
                t = _full_opencv_lsq_terms(
                    cam_n, p, q, r, x_n, vis_n, f0, cur[ci], round_
                )
                cur = _solve_full_opencv_round(seg(t), cur, round_, shared)
        return cur
    if model == "fov":
        cur = (dist if dist is not None
               else jnp.full((nf, 1), 0.5, obs.xy.dtype))
        for _ in range(_FOV_GN_STEPS):
            t = _fov_gn_terms(cam_n, p, q, r, x_n, vis_n, f0, cur[ci])
            cur = _solve_fov_step(seg(t), cur, shared)
        return cur
    t = _distortion_lsq_terms(cam_n, p, q, r, x_n, vis_n, f0, model)
    return _solve_distortion_lsq(seg(t), shared)


@partial(jax.jit, static_argnames=(
    "f0", "axis", "config", "cg_tol", "cg_max_iter", "obs_chunk"
))
def bundle_adjust_sparse(
    obs: SparseObs,
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
    init_c: jax.Array | None = None,
    init_nu: jax.Array | None = None,
    distortion: jax.Array | None = None,
) -> BAResult:
    """Bundle adjustment over an observation list (O(n_obs) memory) —
    the core for BAL-class sparsity (0.1-1% fill), where the dense
    (P, F) mask layout of the other cores cannot hold the problem.
    Semantics (LM protocol, gauge, distortion alternation, robust
    losses, resume via ``init_c``/``init_nu``) match ``bundle_adjust``;
    the camera step is solved matrix-free by preconditioned CG instead
    of a dense Cholesky, so results agree with the dense core to the
    CG tolerance (tighten ``cg_tol`` for exact parity checks)."""
    dt = obs.xy.dtype
    nf = init_K.shape[0]
    X0, R0, t0, info = normalize_gauge(init_X, init_R, init_t, axis)
    state0 = BAState(X=X0, f=init_K[:, 0, 0], u=init_K[:, :2, 2], t=t0, R=R0)
    free = gauge_mask(nf, axis, dt)

    dist = None if distortion is None else jnp.asarray(distortion, dt)
    model = resolve_distortion_model(dist, config.distortion_model)
    if config.distortion_rounds > 0 and dist is None:
        dist = default_distortion(model, nf, dt)

    robust_cfg = resolve_robust(config.robust)
    n_total = jnp.asarray(0)
    c_seg, nu_seg = init_c, init_nu
    for _ in range(config.distortion_rounds):
        dist = fit_distortion_sparse(
            state0, obs, f0, shared=config.distortion_shared,
            huber_delta=(config.huber_delta if robust_cfg is not None
                         else None),
            dist=dist, model=model, robust_kind=robust_cfg or "huber",
        )
        seg_cfg = dataclasses.replace(config, record_log=False)
        state0, _, c_seg, nu_seg, n_seg, _, _, _ = lm_optimize_sparse(
            obs, state0, free, f0, seg_cfg, cg_tol, cg_max_iter, obs_chunk,
            init_c=c_seg, init_nu=nu_seg, dist=dist,
        )
        n_total = n_total + n_seg

    (final, e, c_f, nu_f, n_iter, n_retries, cg_total,
     scalar_log) = lm_optimize_sparse(
        obs, state0, free, f0, config, cg_tol, cg_max_iter, obs_chunk,
        init_c=c_seg, init_nu=nu_seg, dist=dist,
    )
    Xg, Rg, tg = restore_gauge(info, final.X, final.R, final.t)
    log = {"n_solver_retries": n_retries, "c": c_f, "nu": nu_f,
           "cg_iters_total": cg_total}
    if scalar_log is not None:
        log["reprojection_error"] = scalar_log
    return BAResult(
        X=Xg, K=build_K(final.f, final.u, f0), R=Rg, t=tg, error=e,
        n_iter=n_iter + n_total,
        log=log,
        distortion=dist,
    )
