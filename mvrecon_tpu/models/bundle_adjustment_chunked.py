"""Memory-streamed bundle adjustment for the 100k-point regime.

The dense LM core (``bundle_adjustment.py``) materializes (P, F, 9) and
(P, 3, 9F) tensors — perfect up to tens of thousands of points, impossible
at P=100k, F=1000 (the coupling block alone is ~11 GB; the reference's own
Schur reduction materializes a (P, 9F, 9F) float64 intermediate, 63 GB at
P=10k/F=100, which is why it cannot scale at all).

This variant never holds more than one *chunk* of points in HBM:

- per LM retry, a first ``lax.scan`` over point-chunks recomputes the
  chunk's derivative blocks on the fly and accumulates only the reduced
  camera system A (9F, 9F), its rhs b (9F,), and the scalar error — the
  classic blocked Schur accumulation, with the (3C, 9F)^T (3C, 9F) chunk
  matmul on the MXU;
- after the replicated (9F, 9F) solve, a second scan recomputes each
  chunk's blocks once more to back-substitute its point updates and
  accumulate the trial error under the updated cameras.

Recomputing derivatives per scan trades O(P F) cheap FLOPs for an O(P F)
memory ceiling -> O(C F); the expensive O(P (9F)^2) Schur work happens
exactly once per retry, as in the dense path. Semantics (damping protocol,
stopping rules, gauge) are identical to the dense core and the reference.
XLA double-buffers the scan's HBM->VMEM chunk streaming automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import HIGHEST, LMConfig
from ..ops.linalg import inv3x3
from .bundle_adjustment import (
    BAResult,
    BAState,
    _camera_param_derivs,
    _apply_update,
    build_K,
    calc_pqr,
    gauge_mask,
    normalize_gauge,
    restore_gauge,
)


def _chunk_blocks(state_cam: BAState, X_c, x_c, vis_c, free, f0):
    """Derivative blocks for one point chunk (C points): the chunk-local
    analog of ``_compute_derivs`` (same math, same reference citations)."""
    st = state_cam._replace(X=X_c)
    nf = st.f.shape[0]
    K = build_K(st.f, st.u, f0)
    pmat, p, q, r = calc_pqr(X_c, K, st.R, st.t)

    dpdX, dqdX, drdX = pmat[:, 0, :3], pmat[:, 1, :3], pmat[:, 2, :3]
    dpdc, dqdc, drdc = _camera_param_derivs(st, p, q, r, f0)

    res_p = p / r - x_c[..., 0] / f0
    res_q = q / r - x_c[..., 1] / f0
    e_chunk = jnp.sum(vis_c * (res_p**2 + res_q**2))

    inv_r2 = 1.0 / (r * r)
    a1 = (r[..., None] * dpdX[None] - p[..., None] * drdX[None]) * inv_r2[..., None]
    a2 = (r[..., None] * dqdX[None] - q[..., None] * drdX[None]) * inv_r2[..., None]
    b1 = (r[..., None] * dpdc - p[..., None] * drdc) * inv_r2[..., None]
    b2 = (r[..., None] * dqdc - q[..., None] * drdc) * inv_r2[..., None]

    visf = vis_c[..., None]
    d_P = 2.0 * jnp.sum(visf * (res_p[..., None] * a1 + res_q[..., None] * a2), axis=1)
    d_F = 2.0 * jnp.sum(visf * (res_p[..., None] * b1 + res_q[..., None] * b2), axis=0)
    d_F = d_F.reshape(9 * nf) * free

    vw = visf[..., None]
    matE = 2.0 * jnp.sum(
        vw * jnp.einsum("pfi,pfj->pfij", a1, a1, precision=HIGHEST)
        + vw * jnp.einsum("pfi,pfj->pfij", a2, a2, precision=HIGHEST),
        axis=1,
    )
    seen = (jnp.sum(vis_c, axis=1) > 0).astype(matE.dtype)
    matE = matE + (1.0 - seen)[:, None, None] * jnp.eye(3, dtype=matE.dtype)

    matG = 2.0 * jnp.sum(
        vw * jnp.einsum("pfi,pfj->pfij", b1, b1, precision=HIGHEST)
        + vw * jnp.einsum("pfi,pfj->pfij", b2, b2, precision=HIGHEST),
        axis=0,
    )
    matF_blocks = 2.0 * (
        vw * jnp.einsum("pfi,pfj->pfij", a1, b1, precision=HIGHEST)
        + vw * jnp.einsum("pfi,pfj->pfij", a2, b2, precision=HIGHEST)
    )
    npts_c = X_c.shape[0]
    matF = matF_blocks.transpose(0, 2, 1, 3).reshape(npts_c, 3, 9 * nf)
    matF = matF * free[None, None, :]

    return d_P, d_F, matE, matF, matG, e_chunk


def _build_system(state_cam, X_ch, x_ch, vis_ch, free, f0, c):
    """Scan 1: accumulate the damped reduced camera system over chunks.

    Returns (A (9F, 9F) with gauge projection, b (9F,), E_now)."""
    nf = state_cam.f.shape[0]
    nf9 = 9 * nf
    dt = x_ch.dtype
    eye3 = jnp.eye(3, dtype=dt)

    def body(carry, inp):
        schur_acc, b_acc, g_acc, df_acc, e_acc = carry
        X_c, x_c, vis_c = inp
        d_P, d_F, matE, matF, matG, e_chunk = _chunk_blocks(
            state_cam, X_c, x_c, vis_c, free, f0
        )
        matEc = matE + c * matE * eye3[None]
        einv = inv3x3(matEc)
        einv_f = jnp.einsum("pxy,pym->pxm", einv, matF, precision=HIGHEST)
        npts_c = X_c.shape[0]
        schur_acc = schur_acc + jnp.einsum(
            "km,kn->mn",
            matF.reshape(npts_c * 3, nf9),
            einv_f.reshape(npts_c * 3, nf9),
            precision=HIGHEST,
        )
        b_acc = b_acc + jnp.einsum("pxm,px->m", einv_f, d_P, precision=HIGHEST)
        return (schur_acc, b_acc, g_acc + matG, df_acc + d_F, e_acc + e_chunk), None

    init = (
        jnp.zeros((nf9, nf9), dt),
        jnp.zeros((nf9,), dt),
        jnp.zeros((nf, 9, 9), dt),
        jnp.zeros((nf9,), dt),
        jnp.zeros((), dt),
    )
    (schur, b_p, g, d_f, e_now), _ = jax.lax.scan(body, init, (X_ch, x_ch, vis_ch))

    gc = g + c * g * jnp.eye(9, dtype=dt)[None]
    a = -schur
    a = a.reshape(nf, 9, nf, 9)
    idx = jnp.arange(nf)
    a = a.at[idx, :, idx, :].add(gc)
    a = a.reshape(nf9, nf9)
    a = a * (free[:, None] * free[None, :]) + jnp.diag(1.0 - free)
    b = b_p - d_f
    return a, b, e_now


def _backsub_and_trial(state_cam, trial_cam, X_ch, x_ch, vis_ch, free, f0, c, delta_xi):
    """Scan 2: per chunk, recompute blocks at the *current* state, back-
    substitute the point update, and accumulate the trial error under the
    *updated* cameras. Returns (X_new chunks, E_trial)."""
    dt = x_ch.dtype
    eye3 = jnp.eye(3, dtype=dt)
    K_trial = build_K(trial_cam.f, trial_cam.u, f0)

    def body(e_acc, inp):
        X_c, x_c, vis_c = inp
        d_P, _, matE, matF, _, _ = _chunk_blocks(state_cam, X_c, x_c, vis_c, free, f0)
        matEc = matE + c * matE * eye3[None]
        einv = inv3x3(matEc)
        rhs = jnp.einsum("pxm,m->px", matF, delta_xi, precision=HIGHEST) + d_P
        X_new = X_c - jnp.einsum("pxy,py->px", einv, rhs, precision=HIGHEST)

        _, p, q, r = calc_pqr(X_new, K_trial, trial_cam.R, trial_cam.t)
        e_c = jnp.sum(
            vis_c
            * ((p / r - x_c[..., 0] / f0) ** 2 + (q / r - x_c[..., 1] / f0) ** 2)
        )
        return e_acc + e_c, X_new

    e_trial, X_new_ch = jax.lax.scan(body, jnp.zeros((), dt), (X_ch, x_ch, vis_ch))
    return X_new_ch, e_trial


def _chunked(arr: jax.Array, n_chunks: int) -> jax.Array:
    return arr.reshape((n_chunks, arr.shape[0] // n_chunks) + arr.shape[1:])


def lm_optimize_chunked(
    x: jax.Array,
    state0: BAState,
    vis: jax.Array,
    free: jax.Array,
    f0: float,
    config: LMConfig,
    chunk_size: int,
) -> tuple[BAState, jax.Array, jax.Array]:
    """Chunk-streamed LM with the dense core's exact protocol
    (reference ``bundle_adjustment.py:77-195``)."""
    npts = x.shape[0]
    dt = x.dtype
    pad = (-npts) % chunk_size
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], dt)], axis=0)
        vis = jnp.concatenate([vis, jnp.zeros((pad,) + vis.shape[1:], dt)], axis=0)
        center = jnp.mean(state0.X, axis=0)
        state0 = state0._replace(
            X=jnp.concatenate([state0.X, jnp.broadcast_to(center, (pad, 3))], axis=0)
        )
    n_chunks = x.shape[0] // chunk_size
    x_ch = _chunked(x, n_chunks)
    vis_ch = _chunked(vis, n_chunks)

    def split(state):
        cam = state._replace(X=jnp.zeros((0, 3), dt))
        return cam, _chunked(state.X, n_chunks)

    def error_of(cam, X_ch_):
        K = build_K(cam.f, cam.u, f0)

        def body(acc, inp):
            X_c, x_c, vis_c = inp
            _, p, q, r = calc_pqr(X_c, K, cam.R, cam.t)
            e = jnp.sum(
                vis_c
                * ((p / r - x_c[..., 0] / f0) ** 2 + (q / r - x_c[..., 1] / f0) ** 2)
            )
            return acc + e, None

        e, _ = jax.lax.scan(body, jnp.zeros((), dt), (X_ch_, x_ch, vis_ch))
        return e

    cam0, X_ch0 = split(state0)
    e0 = error_of(cam0, X_ch0)

    def inner(cam, X_ch_, e_prev, c):
        def cond(carry):
            _, _, _, _, accepted, tries = carry
            return (~accepted) & (tries < config.max_inner_retries)

        def body(carry):
            c_cur, _, _, _, _, tries = carry
            a, b, _ = _build_system(cam, X_ch_, x_ch, vis_ch, free, f0, c_cur)
            delta_xi = jnp.linalg.solve(a, b) * free
            trial_cam = _apply_update(cam, delta_xi, jnp.zeros((0, 3), dt))
            X_new_ch, e_trial = _backsub_and_trial(
                cam, trial_cam, X_ch_, x_ch, vis_ch, free, f0, c_cur, delta_xi
            )
            accepted = e_trial <= e_prev
            c_next = jnp.where(accepted, c_cur, c_cur * config.scale_factor)
            return c_next, e_trial, trial_cam, X_new_ch, accepted, tries + 1

        dummy_cam = jax.tree.map(jnp.zeros_like, cam)
        c_out, e_new, trial_cam, X_new_ch, _, _ = jax.lax.while_loop(
            cond,
            body,
            (c, jnp.asarray(jnp.inf, dt), dummy_cam, jnp.zeros_like(X_ch_), jnp.asarray(False), 0),
        )
        return c_out, e_new, trial_cam, X_new_ch

    def cond(carry):
        _, _, _, _, count, done = carry
        return (~done) & (count < config.max_iter)

    def body(carry):
        cam, X_ch_, e_prev, c, count, _ = carry
        c_new, e_new, cam_new, X_ch_new = inner(cam, X_ch_, e_prev, c)
        done = jnp.abs(e_new - e_prev) <= config.delta_tol
        return cam_new, X_ch_new, e_new, c_new / config.scale_factor, count + 1, done

    init_c = jnp.asarray(config.init_damping, dt)
    cam_f, X_ch_f, e_f, _, n_iter, _ = jax.lax.while_loop(
        cond, body, (cam0, X_ch0, e0, init_c, jnp.asarray(0), jnp.asarray(False))
    )
    X_full = X_ch_f.reshape(-1, 3)[:npts]
    return cam_f._replace(X=X_full), e_f, n_iter


@partial(jax.jit, static_argnames=("f0", "axis", "config", "chunk_size"))
def bundle_adjust_chunked(
    x: jax.Array,
    init_X: jax.Array,
    init_K: jax.Array,
    init_R: jax.Array,
    init_t: jax.Array,
    f0: float = 1.0,
    visibility: jax.Array | None = None,
    axis: str = "x-right_z-forward",
    config: LMConfig = LMConfig(),
    chunk_size: int = 4096,
) -> BAResult:
    """Drop-in alternative to ``bundle_adjust`` with an O(chunk) HBM
    footprint — the path for 100k-point / 1000-view scenes."""
    dt = x.dtype
    npts, nf, _ = x.shape
    vis = (
        jnp.ones((npts, nf), dtype=dt)
        if visibility is None
        else jnp.asarray(visibility, dtype=dt)
    )
    X0, R0, t0, info = normalize_gauge(init_X, init_R, init_t, axis)
    state0 = BAState(X=X0, f=init_K[:, 0, 0], u=init_K[:, :2, 2], t=t0, R=R0)
    free = gauge_mask(nf, axis, dt)

    final, e, n_iter = lm_optimize_chunked(x, state0, vis, free, f0, config, chunk_size)

    Xg, Rg, tg = restore_gauge(info, final.X, final.R, final.t)
    return BAResult(
        X=Xg, K=build_K(final.f, final.u, f0), R=Rg, t=tg, error=e, n_iter=n_iter, log=None
    )
