"""2D (points x cameras) mesh bundle adjustment.

The 1D point-sharded BA (`sharded_ba.py`) replicates all camera-side
state; fine at F = 1000, a wall at F = 10k where the reduced camera
system A (9F, 9F) is ~32 GB in f32 (VERDICT r1 missing #2; SURVEY §2
item 12's "shard the F-dimension for matG/d_F"). Here the camera
dimension gets its own mesh axis:

- the Schur system is built ROW-SHARDED: the device at cameras-index d
  computes only its (9F/Dc, 9F) row block ``fmat[:, rows_d]^T Einv fmat``
  from its local point shard, psum-reduced over the points axis — no
  device ever holds the full A;
- the replicated Cholesky is replaced by a Jacobi-preconditioned
  conjugate-gradient solve whose matvec is the row-sharded product plus
  one all_gather over the cameras axis per iteration (the damped,
  gauge-projected system is SPD and well-conditioned by the LM damping,
  so CG converges in a few dozen iterations at 1e-10 residual);
- everything else (derivative generation, point back-substitution,
  error) is the unchanged dense LM core — the camera-axis solver plugs
  into ``lm_optimize``'s ``solver`` hook, so the LM protocol (damping
  schedule, retries, gauge, stopping) is shared, not forked.

Derivative generation is replicated across the cameras axis (each
cameras-rank regenerates its point shard's Jacobian factors); the
O(P (9F)^2 / Dc) Schur product — the dominant FLOPs — and the O((9F)^2
/ Dc) system memory are what divide. That trade is deliberate: it keeps
one numerics code path and the generation is a lower-order term at the
scales where F-sharding matters.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import HIGHEST, LMConfig
from ..models.bundle_adjustment import (
    BAResult,
    BAState,
    build_K,
    _DISTORTION_NCOLS,
    default_distortion,
    fit_distortion,
    gauge_mask,
    intrinsics_from_K,
    _huber_weights,
    lm_optimize,
    normalize_gauge,
    resolve_distortion_model,
    resolve_robust,
    restore_gauge,
)
from ..models.bundle_adjustment_chunked import _vary
from ..ops.linalg import inv3x3
from .sharded_ba import POINTS_AXIS, pad_points

CAMERAS_AXIS = "cameras"


def _row_sharded_cg_solver(
    cg_tol: float = 1e-10, cg_max_iter: int = 200,
    matvec_mode: str = "all_gather",
):
    """Build a ``lm_optimize(solver=...)`` hook: cameras-row-sharded Schur
    assembly + preconditioned CG. Must run inside a shard_map spanning
    both POINTS_AXIS and CAMERAS_AXIS.

    ``matvec_mode`` selects the cameras-axis collective per CG iteration:

    - ``"all_gather"`` — each device computes its row block's product and
      all-gathers the (9F,) result; CG state is replicated.
    - ``"ring"`` — CG state stays *sharded* (n_rows per device); the
      matvec rotates vector shards around the cameras axis with
      ``ppermute``, multiplying the matching (n_rows, n_rows) column
      block of the local rows at each step. Same total bytes on the
      wire, but transfers overlap the local GEMV blocks and no device
      ever materializes the full vector — the scalable choice for
      F >> 10k (9F-sized vectors stop being "small").
    """

    def solve(derivs, c, free, axis_name):
        npts = derivs.matE.shape[0]
        nf9 = derivs.matF.shape[2]
        nf = nf9 // 9
        dt = derivs.matE.dtype

        n_shards = jax.lax.psum(1, CAMERAS_AXIS)
        assert nf % n_shards == 0, "F must divide the cameras-axis size"
        n_rows = nf9 // n_shards
        dc = jax.lax.axis_index(CAMERAS_AXIS)
        row0 = (dc * n_rows).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)

        eye3 = jnp.eye(3, dtype=dt)
        matEc = derivs.matE + c * derivs.matE * eye3[None]
        eye9 = jnp.eye(9, dtype=dt)
        matGc = derivs.matG + c * derivs.matG * eye9[None]

        einv = inv3x3(matEc)  # (P, 3, 3)
        einv_f = jnp.einsum("pxy,pym->pxm", einv, derivs.matF, precision=HIGHEST)

        # Row block of the Schur product: (n_rows, 9F) on this device.
        fmat = derivs.matF.reshape(npts * 3, nf9)
        einv_fmat = einv_f.reshape(npts * 3, nf9)
        fmat_rows = jax.lax.dynamic_slice(
            fmat, (zero, row0), (npts * 3, n_rows)
        )
        a_rows = -jnp.einsum(
            "km,kn->mn", fmat_rows, einv_fmat, precision=HIGHEST
        )
        a_rows = jax.lax.psum(a_rows, axis_name)

        # Add this row block's slice of blockdiag(Gc): local camera i of
        # this shard is global camera f0 + i, whose columns sit at
        # 9 (f0 + i) .. 9 (f0 + i) + 9.
        f_loc = n_rows // 9
        f0 = row0 // 9
        g_loc = jax.lax.dynamic_slice(matGc, (f0, zero, zero), (f_loc, 9, 9))
        ar = a_rows.reshape(f_loc, 9, nf, 9)
        idx = jnp.arange(f_loc)
        ar = ar.at[idx, :, f0 + idx, :].add(g_loc)
        a_rows = ar.reshape(n_rows, nf9)

        # Gauge projection on the row block: masked rows/cols become
        # identity rows (so CG leaves fixed params at exactly zero).
        free_rows = jax.lax.dynamic_slice(free, (row0,), (n_rows,))
        a_rows = a_rows * (free_rows[:, None] * free[None, :])
        local_eye = jnp.zeros((n_rows, nf9), dt)
        local_eye = local_eye.at[
            jnp.arange(n_rows), row0 + jnp.arange(n_rows)
        ].set(1.0)
        a_rows = a_rows + local_eye * (1.0 - free_rows)[:, None]

        b = jax.lax.psum(
            jnp.einsum("pxm,px->m", einv_f, derivs.d_P, precision=HIGHEST),
            axis_name,
        )
        b = (b - derivs.d_F) * free + 0.0  # rhs zero on fixed params

        # Jacobi preconditioner from the assembled diagonal.
        diag_local = a_rows[jnp.arange(n_rows), row0 + jnp.arange(n_rows)]

        if matvec_mode == "ring":
            # Fully sharded PCG: every state vector is the local
            # (n_rows,) shard; scalar reductions psum over the cameras
            # axis; the matvec walks the ring.
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

            def _acc_block(acc, v_rot, k):
                src = jnp.mod(dc - k, n_shards)  # owner of v_rot
                col0 = (src * n_rows).astype(jnp.int32)
                a_blk = jax.lax.dynamic_slice(
                    a_rows, (zero, col0), (n_rows, n_rows)
                )
                return acc + jnp.einsum(
                    "mn,n->m", a_blk, v_rot, precision=HIGHEST
                )

            def matvec_l(p_l):
                # k = 0 uses the local shard directly; each later step
                # rotates first, so the final (discarded) rotation of the
                # old accumulate-then-rotate order never hits the wire —
                # n_shards - 1 ppermutes per matvec instead of n_shards.
                def step(carry, k):
                    acc, v_rot = carry
                    v_rot = jax.lax.ppermute(v_rot, CAMERAS_AXIS, perm)
                    return (_acc_block(acc, v_rot, k), v_rot), None

                acc0 = _acc_block(jnp.zeros_like(p_l), p_l, 0)
                (acc, _), _ = jax.lax.scan(
                    step, (acc0, p_l), jnp.arange(1, n_shards)
                )
                return acc

            def pdot(u, v):
                return jax.lax.psum(jnp.vdot(u, v), CAMERAS_AXIS)

            b_l = jax.lax.dynamic_slice(b, (row0,), (n_rows,))
            inv_diag_l = 1.0 / diag_local
            x0, r0 = jnp.zeros_like(b_l), b_l
            z0 = inv_diag_l * r0
            rz0 = pdot(r0, z0)
            rr0 = pdot(r0, r0)
            tol2 = cg_tol**2 * pdot(b_l, b_l)

            def cond(carry):
                _, _, _, _, rr, k = carry
                return (rr > tol2) & (k < cg_max_iter)

            def body(carry):
                xk, r, p, rz, _, k = carry
                ap = matvec_l(p)
                alpha = rz / pdot(p, ap)
                xk = xk + alpha * p
                r = r - alpha * ap
                z = inv_diag_l * r
                rz_new = pdot(r, z)
                p = z + (rz_new / rz) * p
                return xk, r, p, rz_new, pdot(r, r), k + 1

            x_l, _, _, _, _, _ = jax.lax.while_loop(
                cond, body, (x0, r0, z0, rz0, rr0, jnp.asarray(0))
            )
            delta_xi = jax.lax.all_gather(x_l, CAMERAS_AXIS, tiled=True)
            delta_xi = delta_xi * free
        else:
            diag = jax.lax.all_gather(diag_local, CAMERAS_AXIS, tiled=True)
            inv_diag = 1.0 / diag

            def matvec(v):
                lv = jnp.einsum("mn,n->m", a_rows, v, precision=HIGHEST)
                return jax.lax.all_gather(lv, CAMERAS_AXIS, tiled=True)

            # Preconditioned CG on the SPD damped system. The carry is
            # device-varying over the cameras axis (axis_index taints the
            # row block) even though its values are replicated — pcast
            # the init.
            x0, r0 = _vary((jnp.zeros_like(b), b), CAMERAS_AXIS)
            z0 = inv_diag * r0
            p0 = z0
            rz0 = jnp.vdot(r0, z0)
            b_norm = jnp.linalg.norm(b)
            tol2 = (cg_tol * b_norm) ** 2

            def cond(carry):
                _, r, _, _, _, k = carry
                return (jnp.vdot(r, r) > tol2) & (k < cg_max_iter)

            def body(carry):
                xk, r, z, p, rz, k = carry
                ap = matvec(p)
                alpha = rz / jnp.vdot(p, ap)
                xk = xk + alpha * p
                r = r - alpha * ap
                z = inv_diag * r
                rz_new = jnp.vdot(r, z)
                p = z + (rz_new / rz) * p
                return xk, r, z, p, rz_new, k + 1

            delta_xi, _, _, _, _, _ = jax.lax.while_loop(
                cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0))
            )
            delta_xi = delta_xi * free

        rhs = jnp.einsum("pxm,m->px", derivs.matF, delta_xi, precision=HIGHEST)
        rhs = rhs + derivs.d_P
        delta_x = -jnp.einsum("pxy,py->px", einv, rhs, precision=HIGHEST)
        # Every cameras-rank computed identical values (CG over replicated
        # b with gathered matvecs), but the types are tainted varying by
        # axis_index. pmax is an exact no-op on equal values and returns
        # the invariant type lm_optimize's carries expect.
        delta_xi = jax.lax.pmax(delta_xi, CAMERAS_AXIS)
        delta_x = jax.lax.pmax(delta_x, CAMERAS_AXIS)
        return delta_xi, delta_x

    return solve


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "f0", "axis", "config", "cg_tol", "cg_max_iter",
        "matvec_mode",
    ),
)
def sharded_bundle_adjust_2d(
    mesh: Mesh,
    x: jax.Array,
    init_X: jax.Array,
    init_K: jax.Array,
    init_R: jax.Array,
    init_t: jax.Array,
    f0: float = 1.0,
    visibility: jax.Array | None = None,
    axis: str = "x-right_z-forward",
    config: LMConfig = LMConfig(),
    cg_tol: float = 1e-10,
    cg_max_iter: int = 200,
    matvec_mode: str = "all_gather",
    distortion: jax.Array | None = None,
) -> BAResult:
    """Bundle adjustment over a 2D (points, cameras) mesh: P sharded over
    ``points``, the reduced camera system row-sharded over ``cameras``
    with a CG solve (``matvec_mode="ring"`` keeps the CG state sharded
    and rotates vector shards with ppermute — see the solver docstring).
    F must be divisible by the cameras-axis size.

    ``distortion`` / ``config.distortion_rounds``: the BAL radial model
    with the same refit-first alternation as the other cores. The
    distortion chain lives inside the derivative generation, so the
    row-sharded solver is untouched; the refit's (F, 5) normal terms
    psum over the points axis only (cameras-axis replicated inputs make
    the refit cameras-invariant by construction)."""
    dt = x.dtype
    npts, nf, _ = x.shape
    if nf % mesh.shape[CAMERAS_AXIS] != 0:
        raise ValueError(
            f"F={nf} must be divisible by the cameras-axis size "
            f"{mesh.shape[CAMERAS_AXIS]}"
        )
    vis = (
        jnp.ones((npts, nf), dtype=dt)
        if visibility is None
        else jnp.asarray(visibility, dtype=dt)
    )
    n_pt_shards = mesh.shape[POINTS_AXIS]
    x_p, X_p, vis_p, n_orig = pad_points(x, init_X, vis, n_pt_shards)

    X0, R0, t0, info = normalize_gauge(X_p, init_R, init_t, axis)
    free = gauge_mask(nf, axis, dt)
    solver = _row_sharded_cg_solver(
        cg_tol=cg_tol, cg_max_iter=cg_max_iter, matvec_mode=matvec_mode
    )

    model_dist = distortion is not None or config.distortion_rounds > 0
    model = resolve_distortion_model(
        None if distortion is None else jnp.asarray(distortion),
        config.distortion_model,
    )
    dist0 = (
        default_distortion(model, nf, dt) if distortion is None
        else jnp.asarray(distortion, dt)
    )

    def run(x_l, X_l, f_r, u_r, t_r, R_r, vis_l, free_r, dist_r):
        st0 = BAState(X=X_l, f=f_r, u=u_r, t=t_r, R=R_r)
        dist = dist_r if model_dist else None
        n_total = jnp.asarray(0)
        c_seg = None
        for _ in range(config.distortion_rounds):
            # refit-first alternation, exactly as the 1D sharded core;
            # the refit psums its normal terms over the points axis.
            if resolve_robust(config.robust) is not None:
                vis_fit = _huber_weights(
                    st0, x_l, vis_l, f0, config.huber_delta, dist, model,
                    resolve_robust(config.robust),
                )
            else:
                vis_fit = vis_l
            dist = fit_distortion(
                st0, x_l, vis_fit, f0, shared=config.distortion_shared,
                axis_name=POINTS_AXIS, model=model, dist=dist,
            )
            seg_cfg = dataclasses.replace(config, record_log=False)
            st0, _, c_seg, _, n_seg, _ = lm_optimize(
                x_l, st0, vis_l, free_r, f0, seg_cfg,
                axis_name=POINTS_AXIS, init_c=c_seg, solver=solver,
                dist=dist,
            )
            n_total = n_total + n_seg
        final, e, _, _, n_iter, _ = lm_optimize(
            x_l, st0, vis_l, free_r, f0, config,
            axis_name=POINTS_AXIS, init_c=c_seg, solver=solver, dist=dist,
        )
        dist_out = dist if model_dist else dist_r
        return (final.X, final.f, final.u, final.t, final.R, e,
                n_iter + n_total, dist_out)

    pt = P(POINTS_AXIS)  # cameras axis unused in data specs -> replicated
    rep = P()
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(pt, pt, rep, rep, rep, rep, pt, rep, rep),
        out_specs=(pt, rep, rep, rep, rep, rep, rep, rep),
    )
    f_in, u_in = intrinsics_from_K(init_K, f0)
    Xf, ff, uf, tf, Rf, e, n_iter, dist_f = sharded(
        x_p, X0, f_in, u_in, t0, R0, vis_p, free,
        dist0,
    )

    Xg, Rg, tg = restore_gauge(info, Xf, Rf, tf)
    return BAResult(
        X=Xg[:n_orig],
        K=build_K(ff, uf, f0),
        R=Rg,
        t=tg,
        error=e,
        n_iter=n_iter,
        log=None,
        distortion=dist_f if model_dist else None,
    )
