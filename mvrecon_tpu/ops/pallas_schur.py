"""Fused Schur-system build: type-major Y assembly + accumulating SYRK.

The round-1 chunked BA build spent more time *materializing* the coupling
factors (matF (C, 3, 9F) -> Y = L^-1 F in camera-major layout, plus casts
and pads: ~1.5 GB of HBM round-trips per 4096-point chunk) than on the
SYRK itself (VERDICT r1 top_next). Two structural changes fix that:

1. **Param-type-major layout.** Columns are 9 blocks of Fp (= F padded to
   a tile multiple): camera f's parameter j lives at column j * Fp + f.
   In this layout Y is assembled by *outer-product broadcasts* (per-point
   alpha = L^-1 a factors x per-type b factors), which XLA fuses into a
   single pass — the camera-major (..., F, 9)-interleaved einsum it
   scheduled poorly disappears, and the (3, C, 9, Fp) -> (3C, 9Fp)
   reshape is free. Y is emitted directly in bf16. The assembled system
   is a fixed permutation of the camera-major one; ``type_major_free`` /
   ``type_major_to_camera_major`` convert the gauge mask and the solved
   update (both O(F)).
2. **Accumulating lower-triangle SYRK (Pallas).** A packed
   lower-triangle grid (as in ``pallas_syrk``) whose operand tiles span
   the full contraction dimension (3C rows) and whose output aliases the
   running accumulator: each chunk's product adds into the (padded,
   lower-tile-valid) system in one kernel launch, with no separate
   mirror or scan-carry add per chunk. Measured: the complete 25-chunk
   100k x 1000 generate+reduce runs in 348 ms on a v5e — 1.7-2.4x
   faster than the round-1 materialize-then-SYRK path.

**rhs in f32**: b_p = sum Y^T yd is accumulated as two d_F-shaped f32
einsums per chunk (w = sum_x al_x yd_x, then sum_p w b_j) instead of
riding a bf16 stuffed column of Y — measured both faster (the tail TILE
block of the accumulator disappears: 19 -> 18 tiles at F = 1000) and
better-conditioned (the rhs no longer carries bf16 rounding; 4.57 s vs
4.86 s at the north star, same 12 retries).

Y row layout is x-major (row x * C + p), so per-point factors broadcast
along lanes and per-camera constants along sublanes — no strided access.

Numerics: Y is bf16 (one MXU pass); the dominant system entries see
~1e-4 relative error (measured vs the f32 HIGHEST oracle) — the LM
damping schedule absorbs it, and acceptance decisions use full-precision
residuals elsewhere. Opt out with MVRECON_FUSED_SCHUR=0;
MVRECON_FUSED_SCHUR=interpret forces the path with the interpreted
kernel (CPU CI coverage).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HIGHEST
from .pallas_syrk import _lower_tile_maps, _round_up

TILE = 512

_MODE = os.environ.get("MVRECON_FUSED_SCHUR", "1")

# Measured dead end (2026-08-16, do not retry blindly): dropping the
# generation contractions below to one-pass DEFAULT looks free — their
# products feed a bf16 Y anyway — but costs more than it saves. With
# al/yd (the damped L^-1 factors) at DEFAULT the north star went from
# 12 retries / 4.86 s to 16 retries / 5.4 s at 100k x 1000: linv bakes
# the damping into Y, and a bf16 pass there perturbs the effective
# damping enough to degrade LM step quality. d_F/matG at DEFAULT add
# rejected steps through the rhs and the Nielsen gain-ratio controller.
# The bf16 *output* cast of Y is fine (errors average out in the f32
# SYRK accumulation); bf16 *inputs* to the damped factors are not.


def use_fused_schur(dtype) -> bool:
    """The fused path runs for f32 on TPU (or anywhere in interpret mode)."""
    if _MODE == "0" or dtype != jnp.float32:
        return False
    return _MODE == "interpret" or jax.default_backend() == "tpu"


def _interpret() -> bool:
    return _MODE == "interpret"


def schur_acc_dim(nf: int) -> tuple[int, int]:
    """(f_pad, n_acc): per-type padded camera count and accumulator side
    (9 type blocks of f_pad columns; the rhs is accumulated separately in
    f32, so no stuffed column/tail block exists)."""
    f_pad = _round_up(nf, TILE)
    return f_pad, 9 * f_pad


def _syrk_acc_kernel(i_map, j_map, acc_in_ref, yi_ref, yj_ref, out_ref):
    del i_map, j_map  # consumed by the index maps
    out_ref[:] = acc_in_ref[:] + jax.lax.dot_general(
        yi_ref[:], yj_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def syrk_acc(acc: jax.Array, y: jax.Array) -> jax.Array:
    """acc += Y^T Y, lower tiles only. acc (n_acc, n_acc) f32 should be
    donated by the caller (the kernel aliases it); upper tiles are never
    touched and stay garbage until :func:`finish_schur`."""
    n_acc = acc.shape[0]
    nt = n_acc // TILE
    i_map, j_map = _lower_tile_maps(nt)
    k_rows = y.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(i_map.shape[0],),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda t, i, j: (i[t], j[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows, TILE), lambda t, i, j: (0, i[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_rows, TILE), lambda t, i, j: (0, j[t]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda t, i, j: (i[t], j[t]),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _syrk_acc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_acc, n_acc), jnp.float32),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_rows * TILE * TILE * i_map.shape[0],
            bytes_accessed=2 * k_rows * n_acc * y.dtype.itemsize
            + n_acc * n_acc * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(jnp.asarray(i_map), jnp.asarray(j_map), acc, y, y)


def finish_schur(acc: jax.Array, nf: int) -> jax.Array:
    """Mirror the accumulated lower tiles into the full symmetric
    (9 Fp, 9 Fp) type-major sum F^T Einv F."""
    del nf
    n_acc = acc.shape[0]
    tile_row = jnp.arange(n_acc) // TILE
    lower_block = tile_row[:, None] >= tile_row[None, :]
    strict = tile_row[:, None] > tile_row[None, :]
    lo = jnp.where(lower_block, acc, 0.0)
    return lo + jnp.where(strict, lo, 0.0).T


def type_major_free(free: jax.Array, nf: int, f_pad: int) -> jax.Array:
    """Camera-major (9F,) gauge mask -> padded type-major (9 Fp,);
    padding entries are 0 (fixed -> identity rows in the system)."""
    m = free.reshape(nf, 9).T
    return jnp.pad(m, ((0, 0), (0, f_pad - nf))).reshape(-1)


def type_major_to_camera_major(v: jax.Array, nf: int, f_pad: int) -> jax.Array:
    """(9 Fp,) type-major vector -> (9F,) camera-major."""
    return v.reshape(9, f_pad)[:, :nf].T.reshape(-1)


def camera_major_to_type_major(v: jax.Array, nf: int, f_pad: int) -> jax.Array:
    """(9F,) camera-major vector -> padded (9 Fp,) type-major."""
    m = v.reshape(nf, 9).T
    return jnp.pad(m, ((0, 0), (0, f_pad - nf))).reshape(-1)


def assemble_type_major(
    schur_tm: jax.Array, b_p_tm: jax.Array, matG: jax.Array, d_F: jax.Array,
    free: jax.Array, c, nf: int, f_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Damped, gauge-projected reduced camera system in type-major layout.

    Returns (A', b', free_tm): A' = blockdiag(Gc) - schur with identity
    rows on fixed/padding params (matching ``_build_system``'s camera-
    major assembly, just permuted)."""
    dt = schur_tm.dtype
    gc = matG + c * matG * jnp.eye(9, dtype=dt)[None]  # (F, 9, 9)
    a = (-schur_tm).reshape(9, f_pad, 9, f_pad)
    idx = jnp.arange(nf)
    # A'[(i, f), (j, f)] += Gc[f, i, j]
    a = a.at[:, idx, :, idx].add(gc)
    m = 9 * f_pad
    a = a.reshape(m, m)
    free_tm = type_major_free(free, nf, f_pad)
    a = a * (free_tm[:, None] * free_tm[None, :]) + jnp.diag(1.0 - free_tm)
    b = (b_p_tm - camera_major_to_type_major(d_F, nf, f_pad)) * free_tm
    return a, b, free_tm


def _factor_planes(cam, X_c, x_c, pmat, p, q, r, f0: float, dist):
    """Shared generation of the distortion-chained factor set: raw
    residuals, a-factors (C, F, 3), and type-major b planes (9, C, F)
    [param order f, u, v, t(3), omega(3) — matching the camera-major
    column order of ``_chunk_factors``].

    With ``dist`` the same exact 2x2 chain as the camera-major
    ``_apply_distortion_chain`` is applied in type-major layout: the u/v
    column fixups index planes 1/2 and the f column plane 0."""
    from ..models.bundle_adjustment import _distortion_terms

    inv_r2 = 1.0 / (r * r)
    res_p = p / r - x_c[..., 0] / f0
    res_q = q / r - x_c[..., 1] / f0

    a1 = (r[..., None] * pmat[None, :, 0, :3]
          - p[..., None] * pmat[None, :, 2, :3]) * inv_r2[..., None]
    a2 = (r[..., None] * pmat[None, :, 1, :3]
          - q[..., None] * pmat[None, :, 2, :3]) * inv_r2[..., None]

    f, u, t, R = cam.f, cam.u, cam.t, cam.R
    dpdt = -(f[:, None] * R[:, :, 0] + u[:, :1] * R[:, :, 2])
    dqdt = -(f[:, None] * R[:, :, 1] + u[:, 1:2] * R[:, :, 2])
    drdt = -f0 * R[:, :, 2]
    xm = X_c[:, None, :] - t[None, :, :]

    def cross_k(dfT, k):
        k1, k2 = (k + 1) % 3, (k + 2) % 3
        return -(dfT[None, :, k1] * xm[..., k2] - dfT[None, :, k2] * xm[..., k1])

    zero = jnp.zeros_like(p)
    dp0 = (p - (u[:, 0] / f0)[None] * r) / f[None]
    dq0 = (q - (u[:, 1] / f0)[None] * r) / f[None]
    rf0 = r / f0
    b1 = jnp.stack([
        r * dp0 * inv_r2, r * rf0 * inv_r2, zero,
        *[(r * dpdt[None, :, k] - p * drdt[None, :, k]) * inv_r2 for k in range(3)],
        *[(r * cross_k(dpdt, k) - p * cross_k(drdt, k)) * inv_r2 for k in range(3)],
    ])
    b2 = jnp.stack([
        r * dq0 * inv_r2, zero, r * rf0 * inv_r2,
        *[(r * dqdt[None, :, k] - q * drdt[None, :, k]) * inv_r2 for k in range(3)],
        *[(r * cross_k(dqdt, k) - q * cross_k(drdt, k)) * inv_r2 for k in range(3)],
    ])

    if dist is not None:
        g1, g2, s, d, wu = _distortion_terms(cam, p, q, r, f0, dist)
        res_p = res_p + (d - 1.0) * g1
        res_q = res_q + (d - 1.0) * g2
        cw = wu * (f0 / cam.f)[None] ** 2
        d11 = d + cw * g1 * g1
        d12 = cw * g1 * g2
        d22 = d + cw * g2 * g2
        a1, a2 = (
            d11[..., None] * a1 + d12[..., None] * a2,
            d12[..., None] * a1 + d22[..., None] * a2,
        )
        inv_f0 = jnp.asarray(1.0 / f0, b1.dtype)
        b1 = b1.at[1].add(-inv_f0)  # b -> dg/dtheta (u/v planes only)
        b2 = b2.at[2].add(-inv_f0)
        b1, b2 = (
            d11[None] * b1 + d12[None] * b2,
            d12[None] * b1 + d22[None] * b2,
        )
        b1 = b1.at[1].add(inv_f0)  # + d(u/f0)/du
        b2 = b2.at[2].add(inv_f0)
        cf = wu * s / cam.f[None]  # -(wu s / f) g on the f plane
        b1 = b1.at[0].add(-cf * g1)
        b2 = b2.at[0].add(-cf * g2)

    return res_p, res_q, a1, a2, b1, b2


def fused_chunk_update(acc, cam, X_c, x_c, vis_c, f0: float, c,
                       huber_delta=None, dist=None,
                       robust_kind: str = "huber"):
    """One chunk of the fused build: gradient-side quantities + damped Y
    (type-major) + SYRK accumulation, in a single generation pass.

    Returns (acc, d_F_cm (9F,) unmasked, matG (F, 9, 9), e_chunk). The
    per-point grad pieces (d_P, matE) are consumed internally by the
    damped L^-1 and yd.
    """
    from ..models.bundle_adjustment import build_K, calc_pqr
    from .linalg import chol3x3, inv_lower3

    dt = x_c.dtype
    c_pts, nf = x_c.shape[0], x_c.shape[1]
    n_acc = acc.shape[0]
    f_pad = n_acc // 9

    K = build_K(cam.f, cam.u, f0)
    pmat, p, q, r = calc_pqr(X_c, K, cam.R, cam.t)
    vis_d = jnp.broadcast_to(vis_c, (c_pts, nf)).astype(dt)
    r = jnp.where(vis_d > 0, r, jnp.ones_like(r))
    res_p, res_q, a1, a2, b1, b2 = _factor_planes(
        cam, X_c, x_c, pmat, p, q, r, f0, dist
    )
    if huber_delta is not None:
        # IRLS weights from the model's actual (distorted) residuals
        mag = jnp.sqrt(res_p**2 + res_q**2)
        from ..models.bundle_adjustment import robust_weight

        vis_d = vis_d * robust_weight(mag, huber_delta, robust_kind)
    e_chunk = jnp.sum(vis_d * (res_p**2 + res_q**2))
    w2 = 2.0 * vis_d

    # a-factors -> d_P, matE, damped L^-1, yd
    visf = vis_d[..., None]
    d_P = 2.0 * jnp.sum(visf * (res_p[..., None] * a1 + res_q[..., None] * a2), axis=1)
    vw = visf[..., None]
    matE = 2.0 * jnp.sum(
        vw * jnp.einsum("pfi,pfj->pfij", a1, a1, precision=HIGHEST)
        + vw * jnp.einsum("pfi,pfj->pfij", a2, a2, precision=HIGHEST),
        axis=1,
    )
    seen = (jnp.sum(vis_d, axis=1) > 0).astype(dt)
    matE = matE + (1.0 - seen)[:, None, None] * jnp.eye(3, dtype=dt)
    eye3 = jnp.eye(3, dtype=dt)
    linv = inv_lower3(chol3x3(matE + c * matE * eye3[None]))
    yd = jnp.einsum("pxy,py->px", linv, d_P, precision=HIGHEST)
    al1 = jnp.einsum("pxw,pfw->xpf", linv, a1, precision=HIGHEST) * w2[None]
    al2 = jnp.einsum("pxw,pfw->xpf", linv, a2, precision=HIGHEST) * w2[None]

    # d_F (type-major -> camera-major) and matG from the same planes
    wres1 = vis_d * res_p
    wres2 = vis_d * res_q
    d_F_tm = 2.0 * (
        jnp.einsum("pf,jpf->jf", wres1, b1, precision=HIGHEST)
        + jnp.einsum("pf,jpf->jf", wres2, b2, precision=HIGHEST)
    )  # (9, F)
    d_F_cm = d_F_tm.T.reshape(9 * nf)
    # f32 rhs: b_p = sum_x,p y yd in full precision (same reduction
    # shape as d_F) — see the module docstring
    b_p32 = (
        jnp.einsum("pf,jpf->jf", jnp.einsum("xpf,px->pf", al1, yd, precision=HIGHEST), b1, precision=HIGHEST)
        + jnp.einsum("pf,jpf->jf", jnp.einsum("xpf,px->pf", al2, yd, precision=HIGHEST), b2, precision=HIGHEST)
    )  # (9, F)
    matG = 2.0 * (
        jnp.einsum("pf,ipf,jpf->fij", vis_d, b1, b1, precision=HIGHEST)
        + jnp.einsum("pf,ipf,jpf->fij", vis_d, b2, b2, precision=HIGHEST)
    )

    # damped Y and the accumulated product (the einsums below have no
    # contracted index — they are broadcast multiplies; precision is moot)
    y = (jnp.einsum("xpf,jpf->xpjf", al1, b1, precision=HIGHEST)
         + jnp.einsum("xpf,jpf->xpjf", al2, b2, precision=HIGHEST))
    y = y.astype(jnp.bfloat16)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, f_pad - nf)))
    acc = syrk_acc(acc, y.reshape(3 * c_pts, n_acc))
    return acc, d_F_cm, matG, e_chunk, jnp.pad(b_p32, ((0, 0), (0, f_pad - nf)))


def fused_backsub_chunk(
    cam, trial_cam, X_c, x_c, vis_c, f0: float, c, delta_xi_cm,
    huber_delta=None, dist=None, robust_kind: str = "huber",
):
    """Back-substitution for one chunk using type-major b planes — the
    (C, F, 9) camera-major factor tensors are never materialized.

    Returns (X_new, e_trial_chunk, dDd_chunk, g_d_chunk) matching the
    camera-major ``_backsub_and_trial`` body exactly.
    """
    from ..models.bundle_adjustment import (
        _distorted_residual,
        build_K,
        calc_pqr,
    )
    from .linalg import chol3x3, inv_lower3

    dt = x_c.dtype
    c_pts, nf = x_c.shape[0], x_c.shape[1]
    K = build_K(cam.f, cam.u, f0)
    pmat, p, q, r = calc_pqr(X_c, K, cam.R, cam.t)
    vis_d = jnp.broadcast_to(vis_c, (c_pts, nf)).astype(dt)
    r = jnp.where(vis_d > 0, r, jnp.ones_like(r))
    res_p, res_q, a1, a2, b1, b2 = _factor_planes(
        cam, X_c, x_c, pmat, p, q, r, f0, dist
    )
    if huber_delta is not None:
        mag = jnp.sqrt(res_p**2 + res_q**2)
        from ..models.bundle_adjustment import robust_weight

        vis_d = vis_d * robust_weight(mag, huber_delta, robust_kind)

    visf = vis_d[..., None]
    d_P = 2.0 * jnp.sum(visf * (res_p[..., None] * a1 + res_q[..., None] * a2), axis=1)
    vw = visf[..., None]
    matE = 2.0 * jnp.sum(
        vw * jnp.einsum("pfi,pfj->pfij", a1, a1, precision=HIGHEST)
        + vw * jnp.einsum("pfi,pfj->pfij", a2, a2, precision=HIGHEST),
        axis=1,
    )
    seen = (jnp.sum(vis_d, axis=1) > 0).astype(dt)
    matE = matE + (1.0 - seen)[:, None, None] * jnp.eye(3, dtype=dt)
    eye3 = jnp.eye(3, dtype=dt)
    linv = inv_lower3(chol3x3(matE + c * matE * eye3[None]))

    dxi_tm = delta_xi_cm.reshape(nf, 9).T  # (9, F)
    s1 = vis_d * jnp.einsum("jpf,jf->pf", b1, dxi_tm, precision=HIGHEST)
    s2 = vis_d * jnp.einsum("jpf,jf->pf", b2, dxi_tm, precision=HIGHEST)
    f_dxi = 2.0 * (
        jnp.einsum("pf,pfx->px", s1, a1, precision=HIGHEST)
        + jnp.einsum("pf,pfx->px", s2, a2, precision=HIGHEST)
    )
    rhs = f_dxi + d_P
    # E_c^-1 = L^-T L^-1
    delta_x = -jnp.einsum(
        "pwx,pwy,py->px", linv, linv, rhs, precision=HIGHEST
    )
    X_new = X_c + delta_x

    diag_e = jnp.diagonal(matE, axis1=-2, axis2=-1)
    dDd_c = jnp.sum(delta_x * diag_e * delta_x)
    gd_c = jnp.sum(d_P * delta_x)

    K_trial = build_K(trial_cam.f, trial_cam.u, f0)
    _, pt_, qt_, rt_ = calc_pqr(X_new, K_trial, trial_cam.R, trial_cam.t)
    rt_ = jnp.where(vis_d > 0, rt_, jnp.ones_like(rt_))
    res_tp, res_tq = _distorted_residual(trial_cam, pt_, qt_, rt_, x_c, f0, dist)
    e_c = jnp.sum(vis_d * (res_tp**2 + res_tq**2))
    return X_new, e_c, dDd_c, gd_c
