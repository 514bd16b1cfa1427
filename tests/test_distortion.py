"""Radial distortion (BAL camera model) in bundle adjustment.

The reference (/root/reference) has no distortion model; this covers the
framework's extension for the standard public BAL datasets
(``runtime/io.py::load_bal``: pixel = f * (1 + k1 s + k2 s^2) * rho,
s = |rho|^2 on the normalized ray). Correctness oracles:

- jax autodiff of the distorted error function (gradients + full
  Gauss-Newton blocks via the residual Jacobian);
- exact recovery of the generating (k1, k2) by the closed-form per-camera
  refit (the model is linear in k given geometry);
- end-to-end: modeling the distortion recovers the ground-truth geometry
  that the pinhole model provably cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.bundle_adjustment import (
    BAState,
    _compute_derivs,
    _distortion_terms,
    _residuals,
    build_K,
    bundle_adjust,
    calc_pqr,
    fit_distortion,
    gauge_mask,
    normalize_gauge,
)
from mvrecon_tpu.ops.procrustes import aligned_rmse
from mvrecon_tpu.ops.rotations import rodrigues


def _distorted_scene(n_images=8, n_slices=4, n_angles=25, k_scale=1.0,
                     noise=0.002, seed=0):
    """Synthetic scene + observations rendered through per-camera radial
    distortion. Returns (scene, dist_true (F,2), x_distorted (P,F,2))."""
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=n_images, n_slices=n_slices,
        n_angles=n_angles, dtype=jnp.float64,
    )
    nf = n_images
    rng = np.random.default_rng(seed)
    dist = jnp.asarray(
        np.stack([
            k_scale * (-0.35 + 0.05 * rng.standard_normal(nf)),
            k_scale * (0.05 + 0.02 * rng.standard_normal(nf)),
        ], axis=-1)
    )
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    K = build_K(st.f, st.u, 1.0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1, g2, _, d, _ = _distortion_terms(st, p, q, r, 1.0, dist)
    xd = jnp.stack(
        [d * g1 + st.u[:, 0][None], d * g2 + st.u[:, 1][None]], axis=-1
    )
    xd = xd + noise * rng.standard_normal(xd.shape)
    return sc, dist, xd


def _perturbed_state(sc, scale, seed=1):
    k1, k2 = jax.random.split(jax.random.key(seed))
    X0 = sc.X + scale * jax.random.normal(k1, sc.X.shape, jnp.float64)
    t0 = sc.t + scale * jax.random.normal(k2, sc.t.shape, jnp.float64)
    return X0, t0


def test_distorted_derivs_match_autodiff():
    """d_P/d_F and the GN blocks of the distortion-chained factors must
    equal jax autodiff of the distorted error / residual Jacobian."""
    sc, dist, xd = _distorted_scene(n_images=6, n_slices=2, n_angles=12)
    nf = 6
    X0, t0 = _perturbed_state(sc, 0.02)
    Xn, Rn, tn, _ = normalize_gauge(X0, sc.R, t0, "x-up_z-forward")
    st = BAState(X=Xn, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=tn, R=Rn)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    free = gauge_mask(nf, "x-up_z-forward", jnp.float64)

    derivs, e0 = _compute_derivs(st, xd, vis, free, 1.0, None, dist)

    def resvec(X, cam):  # cam (F, 9): f, u0, v0, t, omega
        s2 = BAState(
            X=X, f=cam[:, 0], u=cam[:, 1:3], t=cam[:, 3:6],
            R=jnp.matmul(rodrigues(cam[:, 6:9]), st.R),
        )
        rp, rq = _residuals(s2, xd, vis, 1.0, dist)
        return jnp.stack([rp, rq], -1)  # (P, F, 2)

    def energy(X, cam):
        rv = resvec(X, cam)
        return jnp.sum(vis[..., None] * rv**2)

    cam0 = jnp.concatenate(
        [st.f[:, None], st.u, st.t, jnp.zeros((nf, 3))], axis=1
    )
    assert abs(float(e0) - float(energy(st.X, cam0))) < 1e-12
    g_x = jax.grad(energy, 0)(st.X, cam0)
    g_c = jax.grad(energy, 1)(st.X, cam0).reshape(-1) * free
    np.testing.assert_allclose(np.asarray(derivs.d_P), np.asarray(g_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(derivs.d_F), np.asarray(g_c), atol=1e-12)

    npts = xd.shape[0]
    jac_x = jax.jacfwd(resvec, 0)(st.X, cam0)  # (P, F, 2, P, 3)
    jx = jac_x[jnp.arange(npts), :, :, jnp.arange(npts), :]  # (P, F, 2, 3)
    mat_e = 2.0 * jnp.einsum("pfci,pfcj->pij", jx, jx)
    np.testing.assert_allclose(np.asarray(derivs.matE), np.asarray(mat_e), atol=1e-12)
    jac_c = jax.jacfwd(resvec, 1)(st.X, cam0)  # (P, F, 2, F, 9)
    jc = jac_c[:, jnp.arange(nf), :, jnp.arange(nf), :]  # (F, P, 2, 9)
    mat_g = 2.0 * jnp.einsum("fpci,fpcj->fij", jc, jc)
    np.testing.assert_allclose(np.asarray(derivs.matG), np.asarray(mat_g), atol=1e-12)
    mat_f = 2.0 * jnp.einsum("pfci,fpcj->pifj", jx, jc).reshape(npts, 3, 9 * nf)
    mat_f = mat_f * free[None, None, :]
    np.testing.assert_allclose(np.asarray(derivs.matF), np.asarray(mat_f), atol=1e-12)


def test_fit_distortion_exact_recovery():
    """Given the generating geometry, the closed-form refit recovers the
    generating (k1, k2) exactly (the model is linear in k) on noise-free
    observations."""
    sc, dist, _ = _distorted_scene(n_images=6, n_slices=2, n_angles=12)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    K = build_K(st.f, st.u, 1.0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1, g2, _, d, _ = _distortion_terms(st, p, q, r, 1.0, dist)
    xd = jnp.stack(
        [d * g1 + st.u[:, 0][None], d * g2 + st.u[:, 1][None]], axis=-1
    )
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    k_fit = fit_distortion(st, xd, vis, 1.0)
    np.testing.assert_allclose(np.asarray(k_fit), np.asarray(dist), atol=1e-10)


def test_zero_distortion_matches_pinhole():
    """distortion = zeros must reproduce the pinhole result (same math
    plus exact no-op chain terms)."""
    sc, _, _ = _distorted_scene(n_images=6, n_slices=2, n_angles=12)
    X0, t0 = _perturbed_state(sc, 0.02)
    x = sc.x.transpose(1, 0, 2)
    cfg = LMConfig(max_iter=20, delta_tol=1e-12)
    res_none = bundle_adjust(x, X0, sc.K, sc.R, t0, f0=1.0,
                             axis="x-up_z-forward", config=cfg)
    res_zero = bundle_adjust(
        x, X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward", config=cfg,
        distortion=jnp.zeros((6, 2), jnp.float64),
    )
    assert res_none.distortion is None
    np.testing.assert_allclose(
        float(res_zero.error), float(res_none.error), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_zero.X), np.asarray(res_none.X), atol=1e-8
    )
    assert int(res_zero.n_iter) == int(res_none.n_iter)


def test_fixed_distortion_reaches_gt_geometry():
    """With the true k held fixed, BA on distorted observations reaches
    the ground-truth geometry; the pinhole model on the same data is
    measurably warped (the distortion field is not representable by
    (f, u, pose, X) adjustments)."""
    sc, dist, xd = _distorted_scene()
    X0, t0 = _perturbed_state(sc, 0.005)
    cfg = LMConfig(max_iter=60, delta_tol=1e-10)
    res_pin = bundle_adjust(xd, X0, sc.K, sc.R, t0, f0=1.0,
                            axis="x-up_z-forward", config=cfg)
    res_k = bundle_adjust(xd, X0, sc.K, sc.R, t0, f0=1.0,
                          axis="x-up_z-forward", config=cfg, distortion=dist)
    rmse_pin = float(aligned_rmse(res_pin.X, sc.X))
    rmse_k = float(aligned_rmse(res_k.X, sc.X))
    assert rmse_k < 0.5 * rmse_pin, (rmse_k, rmse_pin)
    assert float(res_k.error) < float(res_pin.error)


def test_distortion_alternation_recovers_geometry():
    """distortion_rounds > 0 (refit-first alternation) from a good init:
    the recovered geometry matches the fixed-true-k result, far better
    than the pinhole model, and the final error matches fixed-true-k."""
    sc, dist, xd = _distorted_scene(n_images=12)
    X0, t0 = _perturbed_state(sc, 0.005)
    cfg = LMConfig(max_iter=60, delta_tol=1e-10)
    res_pin = bundle_adjust(xd, X0, sc.K, sc.R, t0, f0=1.0,
                            axis="x-up_z-forward", config=cfg)
    res_true = bundle_adjust(xd, X0, sc.K, sc.R, t0, f0=1.0,
                             axis="x-up_z-forward", config=cfg, distortion=dist)
    cfg_alt = LMConfig(max_iter=25, delta_tol=1e-10, distortion_rounds=3)
    res_alt = bundle_adjust(xd, X0, sc.K, sc.R, t0, f0=1.0,
                            axis="x-up_z-forward", config=cfg_alt)
    assert res_alt.distortion is not None and res_alt.distortion.shape == (12, 2)
    rmse_pin = float(aligned_rmse(res_pin.X, sc.X))
    rmse_true = float(aligned_rmse(res_true.X, sc.X))
    rmse_alt = float(aligned_rmse(res_alt.X, sc.X))
    assert rmse_alt < 0.5 * rmse_pin, (rmse_alt, rmse_pin)
    assert rmse_alt < 1.5 * rmse_true, (rmse_alt, rmse_true)
    assert float(res_alt.error) < 1.05 * float(res_true.error)


def test_bal_file_roundtrip_with_distortion(tmp_path):
    """BAL text-format round trip carries (k1, k2), and bundle-adjusting
    the loaded problem with its distortion reaches the noise floor the
    pinhole model cannot — the end-to-end path a real BAL dataset takes
    (``load_bal`` -> ``bundle_adjust(distortion=...)``)."""
    from mvrecon_tpu.runtime.io import load_bal, save_bal

    sc, dist, xd = _distorted_scene(n_images=8, noise=0.001)
    vis = np.ones(xd.shape[:2])
    path = str(tmp_path / "problem.txt")
    save_bal(
        path, np.asarray(xd).transpose(1, 0, 2), vis, np.asarray(sc.X),
        np.asarray(sc.R), np.asarray(sc.t), np.asarray(sc.K[:, 0, 0]),
        distortion=np.asarray(dist),
    )
    d = load_bal(path)
    np.testing.assert_allclose(d["distortion"], np.asarray(dist), atol=1e-9)
    np.testing.assert_allclose(
        d["x"].transpose(1, 0, 2), np.asarray(xd), atol=1e-9
    )

    rng = np.random.default_rng(5)
    X0 = jnp.asarray(d["X"] + 0.005 * rng.standard_normal(d["X"].shape))
    t0 = jnp.asarray(d["t"] + 0.005 * rng.standard_normal(d["t"].shape))
    cfg = LMConfig(max_iter=50, delta_tol=1e-12)
    args = (jnp.asarray(d["x"].transpose(1, 0, 2)), X0,
            jnp.asarray(d["K"]), jnp.asarray(d["R"]), t0)
    kw = dict(f0=1.0, axis="x-up_z-forward",
              visibility=jnp.asarray(d["visibility"]))
    res_pin = bundle_adjust(*args, config=cfg, **kw)
    res_k = bundle_adjust(*args, config=cfg,
                          distortion=jnp.asarray(d["distortion"]), **kw)
    floor = xd.size * 0.001**2
    assert float(res_k.error) < 1.5 * floor, (float(res_k.error), floor)
    assert float(res_k.error) < float(res_pin.error)
    # E barely discriminates (free geometry absorbs most of the
    # distortion field) — the reconstructed geometry is what suffers:
    rmse_pin = float(aligned_rmse(res_pin.X, jnp.asarray(sc.X)))
    rmse_k = float(aligned_rmse(res_k.X, jnp.asarray(sc.X)))
    assert rmse_k < 0.5 * rmse_pin, (rmse_k, rmse_pin)


def test_shared_distortion_sparse_visibility_huber():
    """The single-physical-camera case (k tied across frames,
    ``distortion_shared``) composes with the visibility mask and the
    Huber loss: a sliding-window-visible distorted sequence with gross
    outliers recovers the geometry and the shared k. Per-frame k would
    be underdetermined here (~40 rays/frame over a narrow window) — the
    shared refit sums all frames' normal equations into one well-posed
    2x2 system."""
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=10, n_slices=4, n_angles=25,
        dtype=jnp.float64,
    )
    nf = 10
    k_shared = jnp.asarray([-0.3, 0.04])
    dist = jnp.broadcast_to(k_shared, (nf, 2))
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    K = build_K(st.f, st.u, 1.0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1, g2, _, d, _ = _distortion_terms(st, p, q, r, 1.0, dist)
    rng = np.random.default_rng(3)
    xd = np.array(jnp.stack(
        [d * g1 + st.u[:, 0][None], d * g2 + st.u[:, 1][None]], axis=-1
    )) + 0.002 * rng.standard_normal((sc.X.shape[0], nf, 2))
    npts = xd.shape[0]
    # sliding-window visibility around the camera ring (70%)
    vis = np.zeros((npts, nf))
    centers = rng.integers(0, nf, npts)
    for w in range(-3, 4):
        vis[np.arange(npts), (centers + w) % nf] = 1.0
    # 2% gross outliers among visible observations
    obs = np.argwhere(vis > 0)
    bad = obs[rng.choice(len(obs), size=len(obs) // 50, replace=False)]
    xd[bad[:, 0], bad[:, 1]] += 0.3 * rng.standard_normal((len(bad), 2))
    X0, t0 = _perturbed_state(sc, 0.005)
    base = dict(f0=1.0, axis="x-up_z-forward", visibility=jnp.asarray(vis))
    cfg_pin = LMConfig(max_iter=50, delta_tol=1e-10, robust="huber",
                       huber_delta=0.02)
    res_pin = bundle_adjust(jnp.asarray(xd), X0, sc.K, sc.R, t0,
                            config=cfg_pin, **base)
    cfg = LMConfig(max_iter=25, delta_tol=1e-10, distortion_rounds=2,
                   distortion_shared=True, robust="huber", huber_delta=0.02)
    res = bundle_adjust(jnp.asarray(xd), X0, sc.K, sc.R, t0,
                        config=cfg, **base)
    assert np.isfinite(float(res.error))
    # the tied refit recovers the shared k (every row identical)
    k_est = np.asarray(res.distortion)
    assert np.ptp(k_est, axis=0).max() < 1e-12
    assert abs(k_est[0, 0] - float(k_shared[0])) < 0.05, k_est[0]
    rmse_pin = float(aligned_rmse(res_pin.X, sc.X))
    rmse = float(aligned_rmse(res.X, sc.X))
    assert rmse < 0.6 * rmse_pin, (rmse, rmse_pin)


def test_cli_bal_command(tmp_path, capsys):
    """`mvrecon_tpu bal problem.txt --huber --optimize-distortion` runs a
    BAL file end-to-end through the CLI and reports the refit k."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import save_bal

    sc, dist, xd = _distorted_scene(n_images=8, noise=0.001)
    vis = np.ones(xd.shape[:2])
    path = str(tmp_path / "problem.txt")
    save_bal(
        path, np.asarray(xd).transpose(1, 0, 2), vis, np.asarray(sc.X),
        np.asarray(sc.R), np.asarray(sc.t), np.asarray(sc.K[:, 0, 0]),
        distortion=np.asarray(dist),
    )
    out_npz = str(tmp_path / "result.npz")
    main([
        "bal", path, "--float64", "--max-iter", "15", "--huber", "0.05",
        "--optimize-distortion", "1", "--output", out_npz,
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["command"] == "bal"
    assert rec["cams"] == 8 and rec["points"] == xd.shape[0]
    assert np.isfinite(rec["reprojection_error"])
    assert "k1_mean" in rec
    saved = np.load(out_npz)
    assert saved["X"].shape == (xd.shape[0], 3)
    assert saved["distortion"].shape == (8, 2)


def test_chunked_distortion_matches_dense():
    """The chunk-streamed core with a fixed distortion must match the
    dense core (same math streamed through the O(chunk) scans), including
    under Huber IRLS."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )

    sc, dist, xd = _distorted_scene(n_images=8)
    X0, t0 = _perturbed_state(sc, 0.005)
    for robust in (None, "huber"):
        cfg = LMConfig(max_iter=12, delta_tol=1e-12, robust=robust,
                       huber_delta=0.05)
        res_d = bundle_adjust(xd, X0, sc.K, sc.R, t0, f0=1.0,
                              axis="x-up_z-forward", config=cfg,
                              distortion=dist)
        res_c = bundle_adjust_chunked(
            xd, X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
            config=cfg, chunk_size=32, distortion=dist,
        )
        np.testing.assert_allclose(
            float(res_c.error), float(res_d.error), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(res_c.X), np.asarray(res_d.X), atol=1e-7
        )
        assert int(res_c.n_iter) == int(res_d.n_iter), robust


def test_chunked_distortion_refit_matches_dense():
    """fit_distortion_chunked == fit_distortion exactly (per-point sums
    accumulated over chunks, including a padded final chunk), and the
    chunked refit-first alternation tracks the dense one."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked, fit_distortion_chunked,
    )
    from mvrecon_tpu.models.bundle_adjustment import normalize_gauge

    sc, dist, xd = _distorted_scene(n_images=8)
    X0, t0 = _perturbed_state(sc, 0.005)
    Xn, Rn, tn, _ = normalize_gauge(X0, sc.R, t0, "x-up_z-forward")
    st = BAState(X=Xn, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=tn, R=Rn)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    k_dense = fit_distortion(st, xd, vis, 1.0)
    # chunk 48 does not divide P=800 -> exercises the zero-padded tail
    k_chunk = fit_distortion_chunked(st, xd, vis, 1.0, chunk_size=48)
    np.testing.assert_allclose(
        np.asarray(k_chunk), np.asarray(k_dense), atol=1e-12
    )

    cfg = LMConfig(max_iter=15, delta_tol=1e-12, distortion_rounds=2)
    res_d = bundle_adjust(xd, X0, sc.K, sc.R, t0, f0=1.0,
                          axis="x-up_z-forward", config=cfg)
    res_c = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, chunk_size=32,
    )
    np.testing.assert_allclose(
        np.asarray(res_c.distortion), np.asarray(res_d.distortion),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(res_c.error), float(res_d.error), rtol=1e-6
    )


def test_sharded_distortion_matches_single_device():
    """Point-sharded BA (dense and chunk-streamed cores) with the BAL
    distortion model must match the single-device results: the
    distortion chain is per-observation elementwise work, and the refit
    alternation's (F, 5) normal terms complete with one psum — so the
    only divergence allowed is fp reassociation of the sharded sums.
    25 points per shard under chunk_size=50 also exercises the
    chunk-padded tail."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba import (
        sharded_bundle_adjust,
        sharded_bundle_adjust_chunked,
    )

    sc, dist, xd = _distorted_scene(n_images=8)
    X0, t0 = _perturbed_state(sc, 0.005)
    mesh = make_mesh({"points": 4})
    common = dict(f0=1.0, axis="x-up_z-forward")

    # fixed distortion, dense core
    cfg = LMConfig(max_iter=10, delta_tol=1e-10)
    res_single = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                               distortion=dist, **common)
    res_sh = sharded_bundle_adjust(mesh, xd, X0, sc.K, sc.R, t0,
                                   config=cfg, distortion=dist, **common)
    np.testing.assert_allclose(
        float(res_sh.error), float(res_single.error), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.X), np.asarray(res_single.X), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.distortion), np.asarray(dist), atol=0
    )

    # refit alternation (distortion_rounds), dense and chunked cores
    cfg_alt = LMConfig(max_iter=8, delta_tol=1e-10, distortion_rounds=2)
    res_alt = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg_alt, **common)
    res_alt_sh = sharded_bundle_adjust(mesh, xd, X0, sc.K, sc.R, t0,
                                       config=cfg_alt, **common)
    np.testing.assert_allclose(
        np.asarray(res_alt_sh.distortion), np.asarray(res_alt.distortion),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        float(res_alt_sh.error), float(res_alt.error), rtol=1e-7
    )

    res_altc = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, config=cfg_alt, chunk_size=50, **common
    )
    res_altc_sh = sharded_bundle_adjust_chunked(
        mesh, xd, X0, sc.K, sc.R, t0, config=cfg_alt, chunk_size=50,
        **common
    )
    np.testing.assert_allclose(
        np.asarray(res_altc_sh.distortion), np.asarray(res_altc.distortion),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        float(res_altc_sh.error), float(res_altc.error), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_altc_sh.X), np.asarray(res_altc.X), atol=1e-6
    )


def test_2d_mesh_distortion_matches_1d_sharded():
    """(points x cameras) 2D-mesh BA with the BAL distortion model —
    fixed distortion and the refit alternation — must match the 1D
    point-sharded result: the distortion chain lives inside the
    derivative generation, so the row-sharded CG solver consumes already
    -distorted Jacobian factors and needs no changes of its own.

    Parity is asserted on gauge-invariant quantities (final error,
    similarity-aligned geometry): the CG and Cholesky solvers take fp-
    different paths through the distorted objective's sloppy gauge/f-vs-k
    directions, so raw coordinates drift by a tiny similarity transform
    while the geometry agrees to ~1e-6."""
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba import sharded_bundle_adjust
    from mvrecon_tpu.parallel.sharded_ba_2d import sharded_bundle_adjust_2d

    sc, dist, xd = _distorted_scene(n_images=8)  # F = 8 divides cameras 2
    X0, t0 = _perturbed_state(sc, 0.005)
    mesh1 = make_mesh({"points": 4})
    mesh2 = make_mesh({"points": 4, "cameras": 2})
    common = dict(f0=1.0, axis="x-up_z-forward")

    # fixed distortion
    cfg = LMConfig(max_iter=8, delta_tol=1e-10)
    res_1d = sharded_bundle_adjust(mesh1, xd, X0, sc.K, sc.R, t0,
                                   config=cfg, distortion=dist, **common)
    res_2d = sharded_bundle_adjust_2d(mesh2, xd, X0, sc.K, sc.R, t0,
                                      config=cfg, distortion=dist,
                                      cg_tol=1e-12, **common)
    np.testing.assert_allclose(
        float(res_2d.error), float(res_1d.error), rtol=1e-5
    )
    assert float(
        aligned_rmse(jnp.asarray(np.asarray(res_2d.X)),
                     jnp.asarray(np.asarray(res_1d.X)))
    ) < 1e-5
    np.testing.assert_allclose(
        np.asarray(res_2d.distortion), np.asarray(dist), atol=0
    )

    # refit alternation, ring matvec (sharded CG state)
    cfg_alt = LMConfig(max_iter=6, delta_tol=1e-10, distortion_rounds=2)
    res_alt_1d = sharded_bundle_adjust(mesh1, xd, X0, sc.K, sc.R, t0,
                                       config=cfg_alt, **common)
    res_alt_2d = sharded_bundle_adjust_2d(mesh2, xd, X0, sc.K, sc.R, t0,
                                          config=cfg_alt, cg_tol=1e-12,
                                          matvec_mode="ring", **common)
    assert int(res_alt_2d.n_iter) == int(res_alt_1d.n_iter)
    # k1/k2 sit in a near-degenerate trade-off with f — loose atol here,
    # tight parity on the gauge-invariant error/geometry.
    np.testing.assert_allclose(
        np.asarray(res_alt_2d.distortion), np.asarray(res_alt_1d.distortion),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        float(res_alt_2d.error), float(res_alt_1d.error), rtol=1e-6
    )
    assert float(
        aligned_rmse(jnp.asarray(np.asarray(res_alt_2d.X)),
                     jnp.asarray(np.asarray(res_alt_1d.X)))
    ) < 1e-5


def test_streamed_distortion_matches_chunked():
    """The host-streamed core with the distortion model must match the
    chunk-streamed core (same protocol, observations fed from host RAM),
    both with a fixed k and through the refit alternation."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )
    from mvrecon_tpu.models.bundle_adjustment_streamed import (
        bundle_adjust_streamed,
    )

    sc, dist, xd = _distorted_scene(n_images=8)
    X0, t0 = _perturbed_state(sc, 0.005)

    cfg = LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=8)
    res_c = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, chunk_size=32, distortion=dist,
    )
    res_s = bundle_adjust_streamed(
        np.asarray(xd), X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, chunk_size=32, distortion=dist,
    )
    np.testing.assert_allclose(
        float(res_s.error), float(res_c.error), rtol=1e-9
    )
    assert int(res_s.n_iter) == int(res_c.n_iter)
    np.testing.assert_allclose(np.asarray(res_s.X), np.asarray(res_c.X), atol=1e-9)

    cfg_alt = LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=6,
                       distortion_rounds=2)
    res_ca = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg_alt, chunk_size=32,
    )
    res_sa = bundle_adjust_streamed(
        np.asarray(xd), X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg_alt, chunk_size=32,
    )
    np.testing.assert_allclose(
        np.asarray(res_sa.distortion), np.asarray(res_ca.distortion),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        float(res_sa.error), float(res_ca.error), rtol=1e-7
    )


def test_streamed_huber_matches_chunked():
    """The host-streamed core must honor ``config.robust="huber"`` with
    the chunked core's exact IRLS protocol: weighted blocks, weighted
    accept/stopping baseline (e_w), weighted trial error, and a weighted
    distortion refit — previously the streamed core silently ran the
    plain loss."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )
    from mvrecon_tpu.models.bundle_adjustment_streamed import (
        bundle_adjust_streamed,
    )

    sc, dist, xd = _distorted_scene(n_images=8)
    # gross outliers on a handful of observations
    rng = np.random.default_rng(7)
    xd = np.array(xd)
    idx = rng.choice(xd.shape[0], size=6, replace=False)
    xd[idx, 2, :] += 0.5
    xd = jnp.asarray(xd)
    X0, t0 = _perturbed_state(sc, 0.005)

    cfg = LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=8,
                   robust="huber", huber_delta=0.02)
    res_c = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, chunk_size=32, distortion=dist,
    )
    res_s = bundle_adjust_streamed(
        np.asarray(xd), X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, chunk_size=32, distortion=dist,
    )
    np.testing.assert_allclose(
        float(res_s.error), float(res_c.error), rtol=1e-9
    )
    assert int(res_s.n_iter) == int(res_c.n_iter)
    np.testing.assert_allclose(
        np.asarray(res_s.X), np.asarray(res_c.X), atol=1e-9
    )

    # Huber-weighted refit alternation
    cfg_alt = LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=6,
                       robust="huber", huber_delta=0.02,
                       distortion_rounds=2)
    res_ca = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg_alt, chunk_size=32,
    )
    res_sa = bundle_adjust_streamed(
        np.asarray(xd), X0, sc.K, sc.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg_alt, chunk_size=32,
    )
    np.testing.assert_allclose(
        np.asarray(res_sa.distortion), np.asarray(res_ca.distortion),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        float(res_sa.error), float(res_ca.error), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_sa.X), np.asarray(res_ca.X), atol=1e-7
    )


def test_cli_bal_chunked(tmp_path, capsys):
    """--chunk-size routes the BAL file through the O(chunk)-memory core
    with the same distortion support."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import save_bal

    sc, dist, xd = _distorted_scene(n_images=8, noise=0.001)
    vis = np.ones(xd.shape[:2])
    path = str(tmp_path / "problem.txt")
    save_bal(
        path, np.asarray(xd).transpose(1, 0, 2), vis, np.asarray(sc.X),
        np.asarray(sc.R), np.asarray(sc.t), np.asarray(sc.K[:, 0, 0]),
        distortion=np.asarray(dist),
    )
    main([
        "bal", path, "--float64", "--max-iter", "10", "--chunk-size", "64",
        "--optimize-distortion", "1",
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["command"] == "bal"
    assert np.isfinite(rec["reprojection_error"])
    assert "k1_mean" in rec


# ---------------- OPENCV tangential (p1, p2) model ----------------

def _render_opencv(st, dist4, f0=1.0):
    """(F, P, 2) pixels through the full OPENCV radial+tangential model
    (framework's own terms)."""
    from mvrecon_tpu.models.bundle_adjustment import (
        _distortion_terms,
        _tangential_terms,
    )

    K = build_K(st.f, st.u, f0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1, g2, _, d, _ = _distortion_terms(st, p, q, r, f0, dist4)
    t1, t2, _, _, _ = _tangential_terms(st, g1, g2, f0, dist4)
    return jnp.stack(
        [d * g1 + t1 + st.u[:, 0][None], d * g2 + t2 + st.u[:, 1][None]],
        axis=-1,
    )  # (P, F, 2)


def _opencv_scene(n_images=8, seed=0, noise=0.0):
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=n_images, n_slices=4, n_angles=25,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    dist4 = jnp.asarray(np.stack([
        -0.3 + 0.05 * rng.standard_normal(n_images),
        0.04 + 0.02 * rng.standard_normal(n_images),
        0.02 + 0.01 * rng.standard_normal(n_images),
        -0.015 + 0.01 * rng.standard_normal(n_images),
    ], axis=-1))
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    xd = _render_opencv(st, dist4)
    if noise:
        xd = xd + noise * rng.standard_normal(xd.shape)
    return sc, dist4, xd


def test_tangential_derivs_match_autodiff():
    """The OPENCV (k1, k2, p1, p2) chain — tangential terms added to the
    2x2 Jacobian and the f column — must equal jax autodiff of the
    distorted error exactly."""
    from mvrecon_tpu.models.bundle_adjustment import _compute_derivs

    sc, dist4, xd = _opencv_scene(n_images=6)
    nf = 6
    X0, t0 = _perturbed_state(sc, 0.02)
    Xn, Rn, tn, _ = normalize_gauge(X0, sc.R, t0, "x-up_z-forward")
    st = BAState(X=Xn, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=tn, R=Rn)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    free = gauge_mask(nf, "x-up_z-forward", jnp.float64)

    derivs, e0 = _compute_derivs(st, xd, vis, free, 1.0, None, dist4)

    def energy(X, cam):
        s2 = BAState(
            X=X, f=cam[:, 0], u=cam[:, 1:3], t=cam[:, 3:6],
            R=jnp.matmul(rodrigues(cam[:, 6:9]), st.R),
        )
        rp, rq = _residuals(s2, xd, vis, 1.0, dist4)
        return jnp.sum(vis * (rp**2 + rq**2))

    cam0 = jnp.concatenate(
        [st.f[:, None], st.u, st.t, jnp.zeros((nf, 3))], axis=1
    )
    assert abs(float(e0) - float(energy(st.X, cam0))) < 1e-12
    g_x = jax.grad(energy, 0)(st.X, cam0)
    g_c = jax.grad(energy, 1)(st.X, cam0).reshape(-1) * free
    np.testing.assert_allclose(np.asarray(derivs.d_P), np.asarray(g_x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(derivs.d_F), np.asarray(g_c),
                               atol=1e-12)


def test_fit_tangential_exact_recovery():
    """The 4-parameter refit is an exact linear solve: given the
    generating geometry it recovers (k1, k2, p1, p2) to fp precision,
    per-camera and tied (shared)."""
    sc, dist4, xd = _opencv_scene(n_images=6)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    k_fit = fit_distortion(st, xd, vis, 1.0, tangential=True)
    np.testing.assert_allclose(np.asarray(k_fit), np.asarray(dist4),
                               atol=1e-9)

    # tied fit on a shared-k scene
    sc2 = make_synthetic_scene(jax.random.key(0), n_images=6, n_slices=4,
                               n_angles=25, dtype=jnp.float64)
    shared_k = jnp.broadcast_to(
        jnp.asarray([-0.25, 0.03, 0.015, -0.01]), (6, 4)
    )
    st2 = BAState(X=sc2.X, f=sc2.K[:, 0, 0], u=sc2.K[:, :2, 2], t=sc2.t,
                  R=sc2.R)
    xd2 = _render_opencv(st2, shared_k)
    k_tied = fit_distortion(st2, xd2, jnp.ones(xd2.shape[:2], jnp.float64),
                            1.0, shared=True, tangential=True)
    np.testing.assert_allclose(np.asarray(k_tied), np.asarray(shared_k),
                               atol=1e-10)


def test_tangential_zero_p_matches_radial():
    """A 4-column model with p1 = p2 = 0 must reproduce the radial
    result exactly (chain terms are exact no-ops)."""
    sc, dist, xd = _distorted_scene(n_images=6)
    X0, t0 = _perturbed_state(sc, 0.005)
    dist4 = jnp.concatenate([dist, jnp.zeros_like(dist)], axis=-1)
    cfg = LMConfig(max_iter=8, delta_tol=1e-12)
    common = dict(f0=1.0, axis="x-up_z-forward", config=cfg)
    res2 = bundle_adjust(xd, X0, sc.K, sc.R, t0, distortion=dist, **common)
    res4 = bundle_adjust(xd, X0, sc.K, sc.R, t0, distortion=dist4, **common)
    np.testing.assert_allclose(
        float(res4.error), float(res2.error), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res4.X), np.asarray(res2.X), atol=1e-12
    )
    assert int(res4.n_iter) == int(res2.n_iter)


def test_tangential_e2e_recovers_geometry_all_cores():
    """BA with the true 4-parameter model fixed reaches the ground-truth
    geometry on OPENCV-distorted observations; the refit alternation
    recovers (k, p) from zeros; dense == chunked (the fused path gates
    itself off for the 4-column model)."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )

    sc, dist4, xd = _opencv_scene(n_images=8, noise=0.002)
    X0, t0 = _perturbed_state(sc, 0.005)
    common = dict(f0=1.0, axis="x-up_z-forward")

    cfg = LMConfig(max_iter=12, delta_tol=1e-12)
    res_pin = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg, **common)
    res = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                        distortion=dist4, **common)
    rmse_pin = float(aligned_rmse(res_pin.X, sc.X))
    rmse = float(aligned_rmse(res.X, sc.X))
    # tangential terms correlate with the free principal points: the
    # pinhole fit can absorb most of the *error* (u shifts mimic p1/p2)
    # but converges to warped *geometry* — the decisive claim is the
    # aligned-RMSE ratio, with the error merely not worse.
    assert rmse < 0.5 * rmse_pin, (rmse, rmse_pin)
    assert float(res.error) <= float(res_pin.error)

    # Refit alternation from zeros. Per-camera 4-parameter fits are
    # ill-conditioned on narrow-field scenes (k2 trades against p and
    # the free principal point), so the identification claim uses the
    # tied fit on a shared-k rendering; the per-camera path is covered
    # by the exact-recovery test (given geometry, the solve is exact).
    sc_s = make_synthetic_scene(jax.random.key(0), n_images=8, n_slices=4,
                                n_angles=25, dtype=jnp.float64)
    shared_k = jnp.broadcast_to(
        jnp.asarray([-0.28, 0.035, 0.018, -0.012]), (8, 4)
    )
    st_s = BAState(X=sc_s.X, f=sc_s.K[:, 0, 0], u=sc_s.K[:, :2, 2],
                   t=sc_s.t, R=sc_s.R)
    xd_s = _render_opencv(st_s, shared_k)
    xd_s = xd_s + 0.002 * np.random.default_rng(9).standard_normal(xd_s.shape)
    X0s, t0s = _perturbed_state(sc_s, 0.005)
    cfg_alt = LMConfig(max_iter=10, delta_tol=1e-12, distortion_rounds=2,
                       distortion_shared=True)
    res_alt = bundle_adjust(
        xd_s, X0s, sc_s.K, sc_s.R, t0s, config=cfg_alt,
        distortion=jnp.zeros((8, 4), jnp.float64), **common,
    )
    assert res_alt.distortion.shape == (8, 4)
    # k1/k2 sit in the classic radial-vs-focal degeneracy (f absorbs a
    # slice of the series), so parameters land in the right ballpark
    # while the *model quality* claims are tight: error matches the
    # fixed-true-k run and geometry decisively beats pinhole.
    np.testing.assert_allclose(
        np.asarray(res_alt.distortion), np.asarray(shared_k), atol=0.05
    )
    res_true_s = bundle_adjust(xd_s, X0s, sc_s.K, sc_s.R, t0s, config=cfg,
                               distortion=shared_k, **common)
    assert float(res_alt.error) < 1.05 * float(res_true_s.error)
    res_pin_s = bundle_adjust(xd_s, X0s, sc_s.K, sc_s.R, t0s,
                              config=cfg, **common)
    assert (
        float(aligned_rmse(res_alt.X, sc_s.X))
        < 0.5 * float(aligned_rmse(res_pin_s.X, sc_s.X))
    )

    # chunked core parity (non-fused path)
    res_c = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, config=cfg, chunk_size=32,
        distortion=dist4, **common,
    )
    np.testing.assert_allclose(
        float(res_c.error), float(res.error), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_c.X), np.asarray(res.X), atol=1e-7
    )


def test_colmap_opencv_roundtrip_and_convention():
    """An OPENCV COLMAP model (binary and text) round-trips with the
    4-column distortion, and pixels rendered by the framework's own
    OPENCV terms evaluate to ~zero error at the loaded GT state — so
    COLMAP's tangential convention maps exactly."""
    import os
    import tempfile

    from mvrecon_tpu.models.bundle_adjustment import _state_error
    from mvrecon_tpu.runtime.io import load_colmap, save_colmap

    sc, dist4, _ = _opencv_scene(n_images=6)
    nf = 6
    rng = np.random.default_rng(5)
    f = jnp.asarray(np.asarray(sc.K[:, 0, 0]) * 110.0)
    pp = jnp.asarray(rng.uniform(200, 300, (nf, 2)))
    st = BAState(X=sc.X, f=f, u=pp, t=sc.t, R=sc.R)
    x = _render_opencv(st, dist4)  # (P, F, 2)
    x_fp = np.asarray(x).transpose(1, 0, 2)
    vis = np.ones((x.shape[0], nf))

    for binary in (False, True):
        mdir = os.path.join(tempfile.mkdtemp(), "m")
        save_colmap(mdir, x_fp, vis, np.asarray(sc.X), np.asarray(sc.R),
                    np.asarray(sc.t), np.asarray(f),
                    principal_point=np.asarray(pp),
                    distortion=np.asarray(dist4), binary=binary)
        d = load_colmap(mdir)
        assert d["distortion"].shape == (nf, 4)
        np.testing.assert_allclose(d["distortion"], np.asarray(dist4),
                                   atol=1e-12)
        st_l = BAState(
            X=jnp.asarray(d["X"]), f=jnp.asarray(d["f"]),
            u=jnp.asarray(d["K"][:, :2, 2]), t=jnp.asarray(d["t"]),
            R=jnp.asarray(d["R"]),
        )
        e = _state_error(
            st_l, jnp.asarray(d["x"].transpose(1, 0, 2)),
            jnp.asarray(d["visibility"]), 1.0, None,
            jnp.asarray(d["distortion"]),
        )
        assert float(e) < 1e-16, float(e)


def test_sharded_tangential_matches_dense():
    """Point-sharded BA with the 4-column OPENCV model (fixed and
    refit-alternated) matches the dense result — the tangential refit's
    (F, 20) normal terms complete with the same single psum."""
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba import sharded_bundle_adjust

    sc, dist4, xd = _opencv_scene(n_images=8, noise=0.002)
    X0, t0 = _perturbed_state(sc, 0.005)
    mesh = make_mesh({"points": 4})
    common = dict(f0=1.0, axis="x-up_z-forward")

    cfg = LMConfig(max_iter=8, delta_tol=1e-10, distortion_rounds=1,
                   distortion_shared=True)
    res_d = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                          distortion=dist4, **common)
    res_s = sharded_bundle_adjust(mesh, xd, X0, sc.K, sc.R, t0, config=cfg,
                                  distortion=dist4, **common)
    assert res_s.distortion.shape == (8, 4)
    np.testing.assert_allclose(
        np.asarray(res_s.distortion), np.asarray(res_d.distortion), atol=1e-8
    )
    np.testing.assert_allclose(
        float(res_s.error), float(res_d.error), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_s.X), np.asarray(res_d.X), atol=1e-6
    )


# ---------------- OPENCV_FISHEYE (equidistant k1..k4) model ----------------

def _render_fisheye(st, dist4, f0=1.0):
    """(P, F, 2) pixels through the framework's fisheye terms."""
    K = build_K(st.f, st.u, f0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1, g2, _, m, _ = _distortion_terms(st, p, q, r, f0, dist4, "fisheye")
    return jnp.stack(
        [m * g1 + st.u[:, 0][None], m * g2 + st.u[:, 1][None]], axis=-1
    )


def _fisheye_scene(n_images=8, seed=0, noise=0.0):
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=n_images, n_slices=4, n_angles=25,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    dist4 = jnp.asarray(np.stack([
        -0.08 + 0.03 * rng.standard_normal(n_images),
        0.02 + 0.01 * rng.standard_normal(n_images),
        0.008 + 0.004 * rng.standard_normal(n_images),
        -0.004 + 0.002 * rng.standard_normal(n_images),
    ], axis=-1))
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    xd = _render_fisheye(st, dist4)
    if noise:
        xd = xd + noise * rng.standard_normal(xd.shape)
    return sc, dist4, xd


def test_fisheye_forward_matches_reference_formula():
    """The framework's fisheye terms equal an independent NumPy
    implementation of the OpenCV cv::fisheye / COLMAP OPENCV_FISHEYE
    projection (theta_d polynomial on the equidistant angle), written
    from the published formula rather than the framework's algebra."""
    sc, dist4, _ = _fisheye_scene(n_images=5)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    x_fw = np.asarray(_render_fisheye(st, dist4))  # (P, F, 2)

    X = np.asarray(sc.X)
    for i in range(5):
        R = np.asarray(sc.R[i])
        t = np.asarray(sc.t[i])
        f = float(sc.K[i, 0, 0])
        cx, cy = np.asarray(sc.K[i, :2, 2])
        k1, k2, k3, k4 = np.asarray(dist4[i])
        xc = (X - t) @ R  # camera frame: R^T (X - t), rows = points
        a = xc[:, 0] / xc[:, 2]
        b = xc[:, 1] / xc[:, 2]
        rr = np.sqrt(a * a + b * b)
        theta = np.arctan(rr)
        theta_d = theta * (1 + k1 * theta**2 + k2 * theta**4
                           + k3 * theta**6 + k4 * theta**8)
        scale = theta_d / rr
        u_px = f * scale * a + cx
        v_px = f * scale * b + cy
        np.testing.assert_allclose(x_fw[:, i, 0], u_px, atol=1e-12)
        np.testing.assert_allclose(x_fw[:, i, 1], v_px, atol=1e-12)


def test_fisheye_derivs_match_autodiff():
    """The fisheye 2x2 chain (m I + (m'/r) c^2 g g^T plus the f-column
    -(wu s / f) g term) must equal jax autodiff of the fisheye error."""
    from mvrecon_tpu.models.bundle_adjustment import _state_error

    sc, dist4, xd = _fisheye_scene(n_images=6)
    nf = 6
    X0, t0 = _perturbed_state(sc, 0.02)
    st = BAState(X=X0, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=t0, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    free = gauge_mask(nf, "x-right_z-forward", jnp.float64)
    derivs, _ = _compute_derivs(st, xd, vis, free, 1.0, None, dist4,
                                "fisheye")

    npts = X0.shape[0]

    def efun(flat):
        Xv = flat[: 3 * npts].reshape(npts, 3)
        fv = flat[3 * npts: 3 * npts + nf]
        uv = flat[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
        tv = flat[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
        st2 = BAState(X=Xv, f=fv, u=uv, t=tv, R=st.R)
        return _state_error(st2, xd, vis, 1.0, None, dist4, "fisheye")

    flat = jnp.concatenate([st.X.ravel(), st.f, st.u.ravel(), st.t.ravel()])
    gr = np.asarray(jax.grad(efun)(flat))
    np.testing.assert_allclose(
        gr[: 3 * npts].reshape(npts, 3), np.asarray(derivs.d_P), atol=1e-10
    )
    dF = np.asarray(derivs.d_F).reshape(nf, 9)
    fr = np.asarray(free).reshape(nf, 9)
    gf = gr[3 * npts: 3 * npts + nf]
    gu = gr[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
    gt = gr[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
    np.testing.assert_allclose(gf * fr[:, 0], dF[:, 0], atol=1e-10)
    np.testing.assert_allclose(gu * fr[:, 1:3], dF[:, 1:3], atol=1e-10)
    np.testing.assert_allclose(gt * fr[:, 3:6], dF[:, 3:6], atol=1e-10)

    # rotation (omega) block via the residual Jacobian at omega = 0
    def res_of_omega(w):
        Rw = jnp.matmul(rodrigues(w), st.R)
        st2 = BAState(X=st.X, f=st.f, u=st.u, t=st.t, R=Rw)
        return _state_error(st2, xd, vis, 1.0, None, dist4, "fisheye")

    gw = np.asarray(jax.grad(res_of_omega)(jnp.zeros((nf, 3), jnp.float64)))
    np.testing.assert_allclose(gw * fr[:, 6:9], dF[:, 6:9], atol=1e-10)


def test_fisheye_principal_ray_taylor_safe():
    """A point exactly on a camera's optical axis (s = 0) must produce
    finite residuals, finite derivative blocks, and the Taylor-limit
    radial scale m = 1."""
    nf = 3
    # cameras at z = -3 looking down +z; one point exactly on axis
    X = jnp.asarray([[0.0, 0.0, 2.0], [0.4, 0.1, 2.2], [-0.3, 0.2, 1.8]])
    R = jnp.broadcast_to(jnp.eye(3), (nf, 3, 3)).astype(jnp.float64)
    t = jnp.asarray([[0.0, 0.0, -3.0], [0.1, 0.0, -3.0], [0.0, 0.1, -3.0]])
    f = jnp.ones(nf, jnp.float64)
    u = jnp.zeros((nf, 2), jnp.float64)
    st = BAState(X=X, f=f, u=u, t=t, R=R)
    dist4 = jnp.broadcast_to(
        jnp.asarray([-0.1, 0.02, 0.0, 0.0]), (nf, 4)
    ).astype(jnp.float64)
    K = build_K(f, u, 1.0)
    _, p, q, r = calc_pqr(X, K, R, t)
    g1, g2, s, m, wu = _distortion_terms(st, p, q, r, 1.0, dist4, "fisheye")
    assert float(s[0, 0]) == 0.0  # point 0 is on camera 0's axis
    np.testing.assert_allclose(float(m[0, 0]), 1.0, atol=1e-15)
    np.testing.assert_allclose(
        float(wu[0, 0]), 2.0 * (-0.1 - 1.0 / 3.0), atol=1e-12
    )
    xd = _render_fisheye(st, dist4)
    vis = jnp.ones((3, nf), jnp.float64)
    free = gauge_mask(nf, "x-right_z-forward", jnp.float64)
    derivs, e0 = _compute_derivs(st, xd, vis, free, 1.0, None, dist4,
                                 "fisheye")
    assert np.isfinite(np.asarray(derivs.d_P)).all()
    assert np.isfinite(np.asarray(derivs.matG)).all()
    assert float(e0) < 1e-25


def test_fit_fisheye_exact_recovery():
    """Given the generating geometry the closed-form fisheye refit
    recovers k1..k4 (linear-in-k LSQ), per-camera and tied."""
    sc, dist4, xd = _fisheye_scene(n_images=6)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    k_fit = fit_distortion(st, xd, vis, 1.0, model="fisheye")
    np.testing.assert_allclose(np.asarray(k_fit), np.asarray(dist4),
                               atol=1e-6)

    shared_k = jnp.broadcast_to(
        jnp.asarray([-0.09, 0.025, 0.01, -0.005]), (6, 4)
    )
    xd_s = _render_fisheye(st, shared_k)
    k_tied = fit_distortion(st, xd_s, vis, 1.0, shared=True,
                            model="fisheye")
    np.testing.assert_allclose(np.asarray(k_tied), np.asarray(shared_k),
                               atol=1e-8)


def test_fisheye_e2e_recovers_geometry_and_chunked_parity():
    """BA under the fisheye model (fixed true k) recovers the ground
    truth on equidistant observations where the pinhole model cannot;
    the refit alternation recovers tied k from zeros; dense == chunked
    (the fused path gates itself off for the 4-column model)."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )

    sc, dist4, xd = _fisheye_scene(n_images=8, noise=0.002)
    X0, t0 = _perturbed_state(sc, 0.005)
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=12, delta_tol=1e-12,
                   distortion_model="fisheye")
    res = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                        distortion=dist4, **common)
    cfg_pin = LMConfig(max_iter=12, delta_tol=1e-12)
    res_pin = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg_pin,
                            **common)
    rmse = float(aligned_rmse(res.X, sc.X))
    rmse_pin = float(aligned_rmse(res_pin.X, sc.X))
    # the equidistant projection is structurally different from the
    # pinhole one (m = theta/r shrinks with field angle), but the free
    # focal + geometry absorb much of the *error*; the decisive claim is
    # the aligned-RMSE ratio, with the error merely not worse (exactly
    # as the OPENCV tangential e2e contract).
    assert rmse < 0.5 * rmse_pin, (rmse, rmse_pin)
    assert float(res.error) <= float(res_pin.error)

    # tied-refit alternation from zeros
    st_s = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t,
                   R=sc.R)
    shared_k = jnp.broadcast_to(
        jnp.asarray([-0.09, 0.025, 0.01, -0.005]), (8, 4)
    )
    xd_s = _render_fisheye(st_s, shared_k)
    xd_s = xd_s + 0.002 * np.random.default_rng(9).standard_normal(xd_s.shape)
    cfg_alt = LMConfig(max_iter=10, delta_tol=1e-12, distortion_rounds=2,
                       distortion_shared=True, distortion_model="fisheye")
    res_alt = bundle_adjust(
        xd_s, X0, sc.K, sc.R, t0, config=cfg_alt,
        distortion=jnp.zeros((8, 4), jnp.float64), **common,
    )
    assert res_alt.distortion.shape == (8, 4)
    np.testing.assert_allclose(
        np.asarray(res_alt.distortion)[:, 0], np.asarray(shared_k)[:, 0],
        atol=0.03,
    )
    res_true = bundle_adjust(xd_s, X0, sc.K, sc.R, t0,
                             config=LMConfig(max_iter=12, delta_tol=1e-12,
                                             distortion_model="fisheye"),
                             distortion=shared_k, **common)
    assert float(res_alt.error) < 1.05 * float(res_true.error)

    # chunked parity (non-fused path; config carries the model)
    res_c = bundle_adjust_chunked(
        xd, X0, sc.K, sc.R, t0, config=cfg, chunk_size=32,
        distortion=dist4, **common,
    )
    np.testing.assert_allclose(float(res_c.error), float(res.error),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_c.X), np.asarray(res.X),
                               atol=1e-7)


def test_sharded_fisheye_matches_dense():
    """Point-sharded BA under the fisheye model (fixed + tied refit)
    matches the dense result (the refit's (F, 20) fisheye normal terms
    complete with the same single psum)."""
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba import sharded_bundle_adjust

    sc, dist4, xd = _fisheye_scene(n_images=8, noise=0.002)
    X0, t0 = _perturbed_state(sc, 0.005)
    mesh = make_mesh({"points": 4})
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=8, delta_tol=1e-10, distortion_rounds=1,
                   distortion_shared=True, distortion_model="fisheye")
    res_d = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                          distortion=dist4, **common)
    res_s = sharded_bundle_adjust(mesh, xd, X0, sc.K, sc.R, t0, config=cfg,
                                  distortion=dist4, **common)
    np.testing.assert_allclose(
        np.asarray(res_s.distortion), np.asarray(res_d.distortion),
        atol=1e-8,
    )
    np.testing.assert_allclose(float(res_s.error), float(res_d.error),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res_s.X), np.asarray(res_d.X),
                               atol=1e-6)


def test_colmap_fisheye_roundtrip_and_convention():
    """An OPENCV_FISHEYE COLMAP model (binary and text) round-trips with
    the k1..k4 columns and ``distortion_model == "fisheye"``, and pixels
    rendered by the framework's fisheye terms evaluate to ~zero error at
    the loaded GT state."""
    import os
    import tempfile

    from mvrecon_tpu.models.bundle_adjustment import _state_error
    from mvrecon_tpu.runtime.io import load_colmap, save_colmap

    sc, dist4, _ = _fisheye_scene(n_images=6)
    nf = 6
    rng = np.random.default_rng(5)
    f = jnp.asarray(np.asarray(sc.K[:, 0, 0]) * 110.0)
    pp = jnp.asarray(rng.uniform(200, 300, (nf, 2)))
    st = BAState(X=sc.X, f=f, u=pp, t=sc.t, R=sc.R)
    x = _render_fisheye(st, dist4)
    x_fp = np.asarray(x).transpose(1, 0, 2)
    vis = np.ones((x.shape[0], nf))

    for binary in (False, True):
        mdir = os.path.join(tempfile.mkdtemp(), "m")
        save_colmap(mdir, x_fp, vis, np.asarray(sc.X), np.asarray(sc.R),
                    np.asarray(sc.t), np.asarray(f),
                    principal_point=np.asarray(pp),
                    distortion=np.asarray(dist4), binary=binary,
                    distortion_model="fisheye")
        d = load_colmap(mdir)
        assert str(d["distortion_model"]) == "fisheye"
        assert d["distortion"].shape == (nf, 4)
        np.testing.assert_allclose(d["distortion"], np.asarray(dist4),
                                   atol=1e-12)
        st_l = BAState(
            X=jnp.asarray(d["X"]), f=jnp.asarray(d["f"]),
            u=jnp.asarray(d["K"][:, :2, 2]), t=jnp.asarray(d["t"]),
            R=jnp.asarray(d["R"]),
        )
        e = _state_error(
            st_l, jnp.asarray(d["x"].transpose(1, 0, 2)),
            jnp.asarray(d["visibility"]), 1.0, None,
            jnp.asarray(d["distortion"]), "fisheye",
        )
        assert float(e) < 1e-16, float(e)


def test_cli_bal_fisheye_colmap(tmp_path, capsys):
    """CLI ``bal`` on an OPENCV_FISHEYE COLMAP directory: auto-detects
    the model, refines under it, reports k-statistics, and writes the
    refined model back as OPENCV_FISHEYE."""
    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import load_colmap, save_colmap

    import json

    sc, dist4, xd = _fisheye_scene(n_images=6, noise=0.001)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    X0, t0 = _perturbed_state(sc, 0.003)
    mdir = str(tmp_path / "model")
    out_dir = str(tmp_path / "refined")
    save_colmap(mdir, np.asarray(xd).transpose(1, 0, 2),
                np.ones(xd.shape[:2]), np.asarray(X0), np.asarray(sc.R),
                np.asarray(t0), np.asarray(sc.K[:, 0, 0]),
                distortion=np.asarray(dist4), distortion_model="fisheye")
    main(["bal", mdir, "--float64", "--max-iter", "6",
          "--output-colmap", out_dir])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["camera_model"] == "fisheye"
    assert "k3_mean" in rec and "p1_mean" not in rec
    assert np.isfinite(rec["reprojection_error"])
    d2 = load_colmap(out_dir)
    assert str(d2["distortion_model"]) == "fisheye"


def test_colmap_reduced_fisheye_models_load():
    """SIMPLE_RADIAL_FISHEYE / RADIAL_FISHEYE (COLMAP's reduced
    theta-polynomial models) load as the fisheye family with the high-
    order coefficients zero — projection-parity at the GT state."""
    import os
    import tempfile

    from mvrecon_tpu.models.bundle_adjustment import _state_error
    from mvrecon_tpu.runtime.io import load_colmap

    sc, _, _ = _fisheye_scene(n_images=3)
    nf = 3
    rng = np.random.default_rng(2)
    dist_r = jnp.asarray(np.stack([
        -0.07 + 0.02 * rng.standard_normal(nf),
        0.015 + 0.005 * rng.standard_normal(nf),
        np.zeros(nf), np.zeros(nf)], axis=-1))
    st = BAState(X=sc.X, f=sc.K[:, 0, 0] * 90.0,
                 u=jnp.asarray(rng.uniform(100, 200, (nf, 2))),
                 t=sc.t, R=sc.R)
    x = _render_fisheye(st, dist_r)
    vis = np.ones((x.shape[0], nf))

    # hand-write a text model with the reduced camera entries
    from mvrecon_tpu.runtime.io import save_colmap

    for model_name, n_k in (("SIMPLE_RADIAL_FISHEYE", 1),
                            ("RADIAL_FISHEYE", 2)):
        if model_name == "SIMPLE_RADIAL_FISHEYE":
            d_used = dist_r.at[:, 1:].set(0.0)
        else:
            d_used = dist_r
        x_used = _render_fisheye(st, d_used)
        mdir = os.path.join(tempfile.mkdtemp(), "m")
        save_colmap(mdir, np.asarray(x_used).transpose(1, 0, 2), vis,
                    np.asarray(sc.X), np.asarray(sc.R), np.asarray(sc.t),
                    np.asarray(st.f), principal_point=np.asarray(st.u),
                    distortion=np.asarray(d_used),
                    distortion_model="fisheye")
        # rewrite cameras.txt into the reduced model
        lines = []
        with open(os.path.join(mdir, "cameras.txt")) as fh:
            for line in fh:
                if line.startswith("#") or not line.strip():
                    lines.append(line)
                    continue
                toks = line.split()
                cam_id, _, w, h = toks[:4]
                fx, fy, cx, cy, k1, k2 = (float(v) for v in toks[4:10])
                ks = [k1, k2][:n_k]
                lines.append(" ".join(
                    [cam_id, model_name, w, h, repr(fx), repr(cx),
                     repr(cy)] + [repr(k) for k in ks]) + "\n")
        with open(os.path.join(mdir, "cameras.txt"), "w") as fh:
            fh.writelines(lines)
        d = load_colmap(mdir)
        assert str(d["distortion_model"]) == "fisheye"
        np.testing.assert_allclose(d["distortion"], np.asarray(d_used),
                                   atol=1e-12)
        st_l = BAState(
            X=jnp.asarray(d["X"]), f=jnp.asarray(d["f"]),
            u=jnp.asarray(d["K"][:, :2, 2]), t=jnp.asarray(d["t"]),
            R=jnp.asarray(d["R"]),
        )
        e = _state_error(
            st_l, jnp.asarray(d["x"].transpose(1, 0, 2)),
            jnp.asarray(d["visibility"]), 1.0, None,
            jnp.asarray(d["distortion"]), "fisheye",
        )
        assert float(e) < 1e-16, (model_name, float(e))


# ---------------- FULL_OPENCV (rational k1..k6 + p1, p2) model -------------

def _render_full_opencv(st, dist8, f0=1.0):
    """(P, F, 2) pixels through the framework's rational+tangential
    terms."""
    K = build_K(st.f, st.u, f0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1, g2, _, d, _ = _distortion_terms(st, p, q, r, f0, dist8,
                                        "full_opencv")
    from mvrecon_tpu.models.bundle_adjustment import _tangential_terms

    t1, t2, _, _, _ = _tangential_terms(st, g1, g2, f0, dist8)
    return jnp.stack(
        [d * g1 + t1 + st.u[:, 0][None], d * g2 + t2 + st.u[:, 1][None]],
        axis=-1,
    )


def _full_opencv_scene(n_images=8, seed=0, noise=0.0):
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=n_images, n_slices=4, n_angles=25,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    dist8 = jnp.asarray(np.stack([
        -0.30 + 0.04 * rng.standard_normal(n_images),   # k1
        0.05 + 0.02 * rng.standard_normal(n_images),    # k2
        -0.01 + 0.005 * rng.standard_normal(n_images),  # k3
        -0.12 + 0.03 * rng.standard_normal(n_images),   # k4
        0.02 + 0.01 * rng.standard_normal(n_images),    # k5
        0.005 + 0.002 * rng.standard_normal(n_images),  # k6
        0.015 + 0.008 * rng.standard_normal(n_images),  # p1
        -0.01 + 0.006 * rng.standard_normal(n_images),  # p2
    ], axis=-1))
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    xd = _render_full_opencv(st, dist8)
    if noise:
        xd = xd + noise * rng.standard_normal(xd.shape)
    return sc, dist8, xd


def test_full_opencv_forward_matches_reference_formula():
    """The rational chain equals an independent NumPy implementation of
    the OpenCV rational model (cv::undistortPoints convention), written
    from the published formula."""
    sc, dist8, _ = _full_opencv_scene(n_images=5)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    x_fw = np.asarray(_render_full_opencv(st, dist8))

    X = np.asarray(sc.X)
    for i in range(5):
        R = np.asarray(sc.R[i]); t = np.asarray(sc.t[i])
        f = float(sc.K[i, 0, 0]); cx, cy = np.asarray(sc.K[i, :2, 2])
        k1, k2, k3, k4, k5, k6, p1, p2 = np.asarray(dist8[i])
        xc = (X - t) @ R
        a = xc[:, 0] / xc[:, 2]; b = xc[:, 1] / xc[:, 2]
        r2 = a * a + b * b
        num = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
        den = 1 + r2 * (k4 + r2 * (k5 + r2 * k6))
        d = num / den
        xt = 2 * p1 * a * b + p2 * (r2 + 2 * a * a)
        yt = p1 * (r2 + 2 * b * b) + 2 * p2 * a * b
        u_px = f * (d * a + xt) + cx
        v_px = f * (d * b + yt) + cy
        np.testing.assert_allclose(x_fw[:, i, 0], u_px, atol=1e-12)
        np.testing.assert_allclose(x_fw[:, i, 1], v_px, atol=1e-12)


def test_full_opencv_derivs_match_autodiff():
    """The rational chain's hand-derived blocks == jax autodiff of the
    full_opencv error (translation/f/u blocks + the omega block)."""
    from mvrecon_tpu.models.bundle_adjustment import _state_error

    sc, dist8, xd = _full_opencv_scene(n_images=6)
    nf = 6
    X0, t0 = _perturbed_state(sc, 0.02)
    st = BAState(X=X0, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=t0, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    free = gauge_mask(nf, "x-right_z-forward", jnp.float64)
    derivs, _ = _compute_derivs(st, xd, vis, free, 1.0, None, dist8,
                                "full_opencv")
    npts = X0.shape[0]

    def efun(flat):
        Xv = flat[: 3 * npts].reshape(npts, 3)
        fv = flat[3 * npts: 3 * npts + nf]
        uv = flat[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
        tv = flat[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
        st2 = BAState(X=Xv, f=fv, u=uv, t=tv, R=st.R)
        return _state_error(st2, xd, vis, 1.0, None, dist8, "full_opencv")

    flat = jnp.concatenate([st.X.ravel(), st.f, st.u.ravel(), st.t.ravel()])
    gr = np.asarray(jax.grad(efun)(flat))
    np.testing.assert_allclose(
        gr[: 3 * npts].reshape(npts, 3), np.asarray(derivs.d_P), atol=1e-10
    )
    dF = np.asarray(derivs.d_F).reshape(nf, 9)
    fr = np.asarray(free).reshape(nf, 9)
    gf = gr[3 * npts: 3 * npts + nf]
    gu = gr[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
    gt = gr[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
    np.testing.assert_allclose(gf * fr[:, 0], dF[:, 0], atol=1e-10)
    np.testing.assert_allclose(gu * fr[:, 1:3], dF[:, 1:3], atol=1e-10)
    np.testing.assert_allclose(gt * fr[:, 3:6], dF[:, 3:6], atol=1e-10)

    def res_of_omega(w):
        Rw = jnp.matmul(rodrigues(w), st.R)
        st2 = BAState(X=st.X, f=st.f, u=st.u, t=st.t, R=Rw)
        return _state_error(st2, xd, vis, 1.0, None, dist8, "full_opencv")

    gw = np.asarray(jax.grad(res_of_omega)(jnp.zeros((nf, 3), jnp.float64)))
    np.testing.assert_allclose(gw * fr[:, 6:9], dF[:, 6:9], atol=1e-10)


def test_fit_full_opencv_exact_function_recovery():
    """The alternating algebraic refit recovers the generating rational
    model *as a function*: the cubic/cubic parametrization carries the
    classic (1 + eps s) common-factor near-degeneracy (N, D can trade a
    shared factor with only O(s^4) truncation error on a bounded
    s-range), so individual k's are not identifiable even from exact
    data — the honest exact claims are zero residual at the fit, d(s)
    parity on the observed range, and exact (p1, p2) (which are
    identifiable)."""
    from mvrecon_tpu.models.bundle_adjustment import (
        _rational_scale, _state_error,
    )

    sc, dist8, xd = _full_opencv_scene(n_images=6)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    K = build_K(st.f, st.u, 1.0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1 = p / r - st.u[:, 0][None]
    g2 = q / r - st.u[:, 1][None]
    s = ((1.0 / st.f) ** 2)[None] * (g1**2 + g2**2)

    for shared, dist_true in (
        (False, dist8),
        (True, jnp.broadcast_to(
            jnp.asarray([-0.28, 0.04, -0.008, -0.1, 0.018, 0.004,
                         0.012, -0.008]), (6, 8))),
    ):
        x_t = _render_full_opencv(st, dist_true)
        k_fit = fit_distortion(st, x_t, vis, 1.0, shared=shared,
                               model="full_opencv")
        e_fit = float(_state_error(st, x_t, vis, 1.0, None, k_fit,
                                   "full_opencv"))
        assert e_fit < 1e-10, e_fit
        d_fit, _ = _rational_scale(s, k_fit)
        d_true, _ = _rational_scale(s, dist_true)
        assert float(jnp.abs(d_fit - d_true).max()) < 1e-5
        np.testing.assert_allclose(np.asarray(k_fit)[:, 6:8],
                                   np.asarray(dist_true)[:, 6:8],
                                   atol=1e-6)


def test_full_opencv_e2e_and_chunked_parity():
    """BA under the fixed true rational model recovers the geometry the
    pinhole fit cannot; the refit alternation (tied) tracks it from
    zeros; dense == chunked."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )

    # noise 5e-4: at 2e-3 the free-intrinsics pinhole fit absorbs the
    # mild rational field down to ~1.3x the floor; the decisive-model
    # regime for this scene is lower noise (rmse ratio ~0.26 measured)
    sc, dist8, xd = _full_opencv_scene(n_images=8, noise=0.0005)
    X0, t0 = _perturbed_state(sc, 0.005)
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=12, delta_tol=1e-12)
    res = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                        distortion=dist8, **common)
    res_pin = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg, **common)
    rmse = float(aligned_rmse(res.X, sc.X))
    rmse_pin = float(aligned_rmse(res_pin.X, sc.X))
    assert rmse < 0.5 * rmse_pin, (rmse, rmse_pin)
    assert float(res.error) <= float(res_pin.error)

    # tied refit alternation from zeros on a shared-k rendering
    st_s = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t,
                   R=sc.R)
    shared_k = jnp.broadcast_to(
        jnp.asarray([-0.28, 0.04, -0.008, -0.1, 0.018, 0.004,
                     0.012, -0.008]), (8, 8)
    )
    xd_s = _render_full_opencv(st_s, shared_k)
    xd_s = xd_s + 0.0005 * np.random.default_rng(9).standard_normal(xd_s.shape)
    X0s, t0s = _perturbed_state(sc, 0.005)
    cfg_alt = LMConfig(max_iter=10, delta_tol=1e-12, distortion_rounds=2,
                       distortion_shared=True,
                       distortion_model="full_opencv")
    res_alt = bundle_adjust(
        xd_s, X0s, sc.K, sc.R, t0s, config=cfg_alt,
        distortion=jnp.zeros((8, 8), jnp.float64), **common,
    )
    assert res_alt.distortion.shape == (8, 8)
    res_true = bundle_adjust(xd_s, X0s, sc.K, sc.R, t0s, config=cfg,
                             distortion=shared_k, **common)
    assert float(res_alt.error) < 1.1 * float(res_true.error)
    res_pin_s = bundle_adjust(xd_s, X0s, sc.K, sc.R, t0s, config=cfg,
                              **common)
    assert (
        float(aligned_rmse(res_alt.X, sc.X))
        < 0.6 * float(aligned_rmse(res_pin_s.X, sc.X))
    )

    # chunked parity (non-fused path; includes the chunked alternation)
    cfg_c = LMConfig(max_iter=8, delta_tol=1e-12, distortion_rounds=1,
                     distortion_shared=True,
                     distortion_model="full_opencv")
    res_d = bundle_adjust(xd_s, X0s, sc.K, sc.R, t0s, config=cfg_c,
                          distortion=shared_k, **common)
    res_c = bundle_adjust_chunked(
        xd_s, X0s, sc.K, sc.R, t0s, config=cfg_c, chunk_size=32,
        distortion=shared_k, **common,
    )
    np.testing.assert_allclose(float(res_c.error), float(res_d.error),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_c.distortion),
                               np.asarray(res_d.distortion), atol=1e-9)


def test_colmap_full_opencv_roundtrip_and_promotion():
    """A FULL_OPENCV COLMAP model round-trips (binary and text) with
    projection parity at GT; a model mixing OPENCV and FULL_OPENCV
    cameras promotes to the 8-column rational layout exactly."""
    import os
    import tempfile

    from mvrecon_tpu.models.bundle_adjustment import _state_error
    from mvrecon_tpu.runtime.io import load_colmap, save_colmap

    sc, dist8, _ = _full_opencv_scene(n_images=6)
    nf = 6
    rng = np.random.default_rng(5)
    f = jnp.asarray(np.asarray(sc.K[:, 0, 0]) * 110.0)
    pp = jnp.asarray(rng.uniform(200, 300, (nf, 2)))
    st = BAState(X=sc.X, f=f, u=pp, t=sc.t, R=sc.R)
    x = _render_full_opencv(st, dist8)
    x_fp = np.asarray(x).transpose(1, 0, 2)
    vis = np.ones((x.shape[0], nf))

    for binary in (False, True):
        mdir = os.path.join(tempfile.mkdtemp(), "m")
        save_colmap(mdir, x_fp, vis, np.asarray(sc.X), np.asarray(sc.R),
                    np.asarray(sc.t), np.asarray(f),
                    principal_point=np.asarray(pp),
                    distortion=np.asarray(dist8), binary=binary)
        d = load_colmap(mdir)
        assert str(d["distortion_model"]) == "full_opencv"
        np.testing.assert_allclose(d["distortion"], np.asarray(dist8),
                                   atol=1e-12)
        st_l = BAState(
            X=jnp.asarray(d["X"]), f=jnp.asarray(d["f"]),
            u=jnp.asarray(d["K"][:, :2, 2]), t=jnp.asarray(d["t"]),
            R=jnp.asarray(d["R"]),
        )
        e = _state_error(
            st_l, jnp.asarray(d["x"].transpose(1, 0, 2)),
            jnp.asarray(d["visibility"]), 1.0, None,
            jnp.asarray(d["distortion"]), "full_opencv",
        )
        assert float(e) < 1e-16, float(e)

    # promotion: rewrite half the text cameras as plain OPENCV
    mdir = os.path.join(tempfile.mkdtemp(), "m")
    d8 = np.asarray(dist8).copy()
    d8[:3, 2:6] = 0.0  # cameras 0-2 become exact OPENCV models
    x_mix = _render_full_opencv(st, jnp.asarray(d8))
    save_colmap(mdir, np.asarray(x_mix).transpose(1, 0, 2), vis,
                np.asarray(sc.X), np.asarray(sc.R), np.asarray(sc.t),
                np.asarray(f), principal_point=np.asarray(pp),
                distortion=d8)
    lines = []
    with open(os.path.join(mdir, "cameras.txt")) as fh:
        for line in fh:
            toks = line.split()
            if (not line.startswith("#") and line.strip()
                    and int(toks[0]) <= 3):
                cam_id, _, w, h = toks[:4]
                fx, fy, cx, cy, k1, k2, p1, p2 = toks[4:12]
                lines.append(" ".join(
                    [cam_id, "OPENCV", w, h, fx, fy, cx, cy,
                     k1, k2, p1, p2]) + "\n")
            else:
                lines.append(line)
    with open(os.path.join(mdir, "cameras.txt"), "w") as fh:
        fh.writelines(lines)
    d = load_colmap(mdir)
    assert str(d["distortion_model"]) == "full_opencv"
    np.testing.assert_allclose(d["distortion"], d8, atol=1e-12)


def test_2d_mesh_fisheye_matches_1d_sharded():
    """(points x cameras) 2D-mesh BA under the fisheye model matches
    the 1D point-sharded result — the model-generic chain lives inside
    the derivative generation, so the row-sharded CG solver needs no
    model-specific changes (gauge-invariant parity, as the radial 2D
    test)."""
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba import sharded_bundle_adjust
    from mvrecon_tpu.parallel.sharded_ba_2d import sharded_bundle_adjust_2d

    sc, dist4, xd = _fisheye_scene(n_images=8, noise=0.002)
    X0, t0 = _perturbed_state(sc, 0.005)
    mesh1 = make_mesh({"points": 4})
    mesh2 = make_mesh({"points": 4, "cameras": 2})
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=8, delta_tol=1e-10,
                   distortion_model="fisheye")
    res_1d = sharded_bundle_adjust(mesh1, xd, X0, sc.K, sc.R, t0,
                                   config=cfg, distortion=dist4, **common)
    res_2d = sharded_bundle_adjust_2d(mesh2, xd, X0, sc.K, sc.R, t0,
                                      config=cfg, distortion=dist4,
                                      cg_tol=1e-12, **common)
    np.testing.assert_allclose(
        float(res_2d.error), float(res_1d.error), rtol=1e-5
    )
    assert float(
        aligned_rmse(jnp.asarray(np.asarray(res_2d.X)),
                     jnp.asarray(np.asarray(res_1d.X)))
    ) < 1e-5
    np.testing.assert_allclose(
        np.asarray(res_2d.distortion), np.asarray(dist4), atol=0
    )


def test_cli_bal_tangential_on_radial_colmap(tmp_path, capsys):
    """CLI ``bal --tangential`` on a *radial* COLMAP input widens to the
    4-parameter OPENCV model (config and array agree — regression: the
    config previously kept the input's "radial" tag and the resolver
    rejected the widened array)."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import save_colmap

    sc, dist, xd = _distorted_scene(n_images=6, noise=0.001)
    X0, t0 = _perturbed_state(sc, 0.003)
    mdir = str(tmp_path / "model")
    save_colmap(mdir, np.asarray(xd).transpose(1, 0, 2),
                np.ones(xd.shape[:2]), np.asarray(X0), np.asarray(sc.R),
                np.asarray(t0), np.asarray(sc.K[:, 0, 0]),
                distortion=np.asarray(dist))
    main(["bal", mdir, "--float64", "--max-iter", "5", "--tangential",
          "--optimize-distortion", "1", "--shared-k"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "p1_mean" in rec
    assert np.isfinite(rec["reprojection_error"])


def test_resumable_segments_with_fisheye(tmp_path):
    """Segmented (checkpoint/resume) chunked BA under a fixed fisheye
    model equals the continuous run — the model tag rides LMConfig, so
    segment configs built with dataclasses.replace keep it."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )
    from mvrecon_tpu.runtime.elastic import resumable_bundle_adjust

    sc, dist4, xd = _fisheye_scene(n_images=6, noise=0.002)
    X0, t0 = _perturbed_state(sc, 0.005)
    cfg = LMConfig(max_iter=6, delta_tol=0.0, distortion_model="fisheye")
    common = dict(f0=1.0, axis="x-up_z-forward", config=cfg)

    res_cont = bundle_adjust_chunked(xd, X0, sc.K, sc.R, t0,
                                     chunk_size=32, distortion=dist4,
                                     **common)
    # segmented run (3 x 2 iterations through the checkpoint), plus a
    # kill-and-reinvoke: a first process that only completes 2
    # iterations, then a restart that finds the checkpoint
    ckpt = str(tmp_path / "seg.npz")
    part, n1 = resumable_bundle_adjust(
        xd, X0, sc.K, sc.R, t0, ckpt, total_iters=2, segment_iters=2,
        chunk_size=32, distortion=dist4, **common,
    )
    assert n1 == 2
    res_seg, n2 = resumable_bundle_adjust(
        xd, X0, sc.K, sc.R, t0, ckpt, total_iters=6, segment_iters=2,
        chunk_size=32, distortion=dist4, **common,
    )
    assert n2 == 4
    np.testing.assert_allclose(float(res_seg.error), float(res_cont.error),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res_seg.X), np.asarray(res_cont.X),
                               atol=1e-10)


# ---------------- FOV (Devernay-Faugeras, COLMAP model 7) ----------------

def _render_fov(st, dist1, f0=1.0):
    K = build_K(st.f, st.u, f0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1, g2, _, d, _ = _distortion_terms(st, p, q, r, f0, dist1, "fov")
    return jnp.stack(
        [d * g1 + st.u[:, 0][None], d * g2 + st.u[:, 1][None]], axis=-1
    )


def _fov_scene(n_images=8, seed=0, noise=0.0):
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=n_images, n_slices=4, n_angles=25,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    dist1 = jnp.asarray(
        (0.9 + 0.15 * rng.standard_normal(n_images))[:, None]
    )
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    xd = _render_fov(st, dist1)
    if noise:
        xd = xd + noise * rng.standard_normal(xd.shape)
    return sc, dist1, xd


def test_fov_forward_matches_reference_formula():
    """The FOV terms equal an independent NumPy implementation of the
    Devernay-Faugeras model (r_d = atan(2 r tan(w/2)) / w)."""
    sc, dist1, _ = _fov_scene(n_images=4)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    x_fw = np.asarray(_render_fov(st, dist1))
    X = np.asarray(sc.X)
    for i in range(4):
        R = np.asarray(sc.R[i]); t = np.asarray(sc.t[i])
        f = float(sc.K[i, 0, 0]); cx, cy = np.asarray(sc.K[i, :2, 2])
        w = float(dist1[i, 0])
        xc = (X - t) @ R
        a = xc[:, 0] / xc[:, 2]; b = xc[:, 1] / xc[:, 2]
        r = np.sqrt(a * a + b * b)
        rd = np.arctan(2.0 * r * np.tan(w / 2.0)) / w
        u_px = f * (rd / r) * a + cx
        v_px = f * (rd / r) * b + cy
        np.testing.assert_allclose(x_fw[:, i, 0], u_px, atol=1e-12)
        np.testing.assert_allclose(x_fw[:, i, 1], v_px, atol=1e-12)


def test_fov_derivs_match_autodiff():
    """The FOV chain's hand-derived blocks == jax autodiff."""
    from mvrecon_tpu.models.bundle_adjustment import _state_error

    sc, dist1, xd = _fov_scene(n_images=6)
    nf = 6
    X0, t0 = _perturbed_state(sc, 0.02)
    st = BAState(X=X0, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=t0, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    free = gauge_mask(nf, "x-right_z-forward", jnp.float64)
    derivs, _ = _compute_derivs(st, xd, vis, free, 1.0, None, dist1, "fov")
    npts = X0.shape[0]

    def efun(flat):
        Xv = flat[: 3 * npts].reshape(npts, 3)
        fv = flat[3 * npts: 3 * npts + nf]
        uv = flat[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
        tv = flat[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
        st2 = BAState(X=Xv, f=fv, u=uv, t=tv, R=st.R)
        return _state_error(st2, xd, vis, 1.0, None, dist1, "fov")

    flat = jnp.concatenate([st.X.ravel(), st.f, st.u.ravel(), st.t.ravel()])
    gr = np.asarray(jax.grad(efun)(flat))
    np.testing.assert_allclose(
        gr[: 3 * npts].reshape(npts, 3), np.asarray(derivs.d_P), atol=1e-10
    )
    dF = np.asarray(derivs.d_F).reshape(nf, 9)
    fr = np.asarray(free).reshape(nf, 9)
    gf = gr[3 * npts: 3 * npts + nf]
    gu = gr[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
    gt = gr[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
    np.testing.assert_allclose(gf * fr[:, 0], dF[:, 0], atol=1e-10)
    np.testing.assert_allclose(gu * fr[:, 1:3], dF[:, 1:3], atol=1e-10)
    np.testing.assert_allclose(gt * fr[:, 3:6], dF[:, 3:6], atol=1e-10)


def test_fit_fov_recovery_and_chunked_parity():
    """The scalar-GN refit recovers the generating FOV angle from exact
    data at the true geometry (per-camera and tied, from a generic
    init), and the chunked refit matches the dense one."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        fit_distortion_chunked,
    )

    sc, dist1, xd = _fov_scene(n_images=6)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    w_fit = fit_distortion(st, xd, vis, 1.0, model="fov")
    np.testing.assert_allclose(np.asarray(w_fit), np.asarray(dist1),
                               atol=1e-9)

    shared_w = jnp.full((6, 1), 1.05, jnp.float64)
    xd_s = _render_fov(st, shared_w)
    w_tied = fit_distortion(st, xd_s, vis, 1.0, shared=True, model="fov")
    np.testing.assert_allclose(np.asarray(w_tied), np.asarray(shared_w),
                               atol=1e-10)

    w_chunk = fit_distortion_chunked(st, xd, vis, 1.0, chunk_size=32,
                                     model="fov")
    np.testing.assert_allclose(np.asarray(w_chunk), np.asarray(w_fit),
                               atol=1e-12)


def test_fov_e2e_and_colmap_roundtrip(tmp_path):
    """BA under the fixed true FOV model recovers the geometry; a FOV
    COLMAP model round-trips with projection parity; CLI bal
    auto-detects and reports omega."""
    import json
    import os

    from mvrecon_tpu.models.bundle_adjustment import _state_error
    from mvrecon_tpu.runtime.io import load_colmap, save_colmap

    sc, dist1, xd = _fov_scene(n_images=6, noise=0.001)
    X0, t0 = _perturbed_state(sc, 0.005)
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=12, delta_tol=1e-12, distortion_model="fov")
    res = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                        distortion=dist1, **common)
    res_pin = bundle_adjust(xd, X0, sc.K, sc.R, t0,
                            config=LMConfig(max_iter=12, delta_tol=1e-12),
                            **common)
    assert (
        float(aligned_rmse(res.X, sc.X))
        < 0.5 * float(aligned_rmse(res_pin.X, sc.X))
    )

    mdir = str(tmp_path / "model")
    save_colmap(mdir, np.asarray(xd).transpose(1, 0, 2),
                np.ones(xd.shape[:2]), np.asarray(sc.X), np.asarray(sc.R),
                np.asarray(sc.t), np.asarray(sc.K[:, 0, 0]),
                principal_point=np.asarray(sc.K[:, :2, 2]),
                distortion=np.asarray(dist1))
    d = load_colmap(mdir)
    assert str(d["distortion_model"]) == "fov"
    np.testing.assert_allclose(d["distortion"], np.asarray(dist1),
                               atol=1e-12)
    st_l = BAState(
        X=jnp.asarray(d["X"]), f=jnp.asarray(d["f"]),
        u=jnp.asarray(d["K"][:, :2, 2]), t=jnp.asarray(d["t"]),
        R=jnp.asarray(d["R"]),
    )
    e = _state_error(
        st_l, jnp.asarray(d["x"].transpose(1, 0, 2)),
        jnp.asarray(d["visibility"]), 1.0, None,
        jnp.asarray(d["distortion"]), "fov",
    )
    # xd carries sigma=1e-3 observation noise: parity is to the file's
    # own contents, E = sum of squared (noise) residuals
    e_direct = _state_error(
        st_l, xd.astype(jnp.float64), jnp.ones(xd.shape[:2]), 1.0, None,
        jnp.asarray(d["distortion"]), "fov",
    )
    np.testing.assert_allclose(float(e), float(e_direct), rtol=1e-9)


def test_streamed_refit_parity_new_models():
    """bundle_adjust_streamed's refit alternation under the fov and
    full_opencv models matches bundle_adjust_chunked on the same data
    (the streamed refit streams one accumulation pass per GN step /
    alternation round from host RAM)."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )
    from mvrecon_tpu.models.bundle_adjustment_streamed import (
        bundle_adjust_streamed,
    )

    for model, scene_fn, zero_like in (
        ("fov", _fov_scene, lambda nf: jnp.full((nf, 1), 0.8, jnp.float64)),
        ("full_opencv", _full_opencv_scene,
         lambda nf: jnp.zeros((nf, 8), jnp.float64)),
    ):
        sc, dist_true, xd = scene_fn(n_images=6, noise=0.001)
        X0, t0 = _perturbed_state(sc, 0.003)
        cfg = LMConfig(max_iter=4, delta_tol=0.0, distortion_rounds=1,
                       distortion_shared=True, distortion_model=model)
        common = dict(f0=1.0, axis="x-up_z-forward", config=cfg)
        res_c = bundle_adjust_chunked(
            xd, X0, sc.K, sc.R, t0, chunk_size=32,
            distortion=zero_like(6), **common,
        )
        res_s = bundle_adjust_streamed(
            np.asarray(xd), X0, sc.K, sc.R, t0, chunk_size=32,
            distortion=zero_like(6), **common,
        )
        np.testing.assert_allclose(
            np.asarray(res_s.distortion), np.asarray(res_c.distortion),
            rtol=1e-7, atol=1e-12, err_msg=model,
        )
        np.testing.assert_allclose(
            float(res_s.error), float(res_c.error), rtol=1e-9,
            err_msg=model,
        )


def test_fov_refit_alternation_from_default_init():
    """distortion_rounds > 0 with distortion=None under the fov model
    starts the angle at 0.5 rad, not 0 (omega = 0 is the pinhole limit
    where the GN regressor vanishes — a zero init would freeze the
    refit; regression for the default-init bug)."""
    sc, dist1, xd = _fov_scene(n_images=6, noise=0.001)
    X0, t0 = _perturbed_state(sc, 0.003)
    # tied angle so the alternation has a well-posed 1-dof target
    shared_w = jnp.full((6, 1), 0.95, jnp.float64)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    xd_s = _render_fov(st, shared_w)
    xd_s = xd_s + 0.001 * np.random.default_rng(3).standard_normal(xd_s.shape)
    cfg = LMConfig(max_iter=10, delta_tol=1e-12, distortion_rounds=2,
                   distortion_shared=True, distortion_model="fov")
    res = bundle_adjust(xd_s, X0, sc.K, sc.R, t0, f0=1.0,
                        axis="x-up_z-forward", config=cfg)
    assert res.distortion.shape == (6, 1)
    # the angle must move off the 0.5 init toward the generating 0.95
    np.testing.assert_allclose(np.asarray(res.distortion)[:, 0], 0.95,
                               atol=0.08)


def test_sharded_fov_matches_dense():
    """Point-sharded BA under the FOV model (fixed + tied GN refit)
    matches the dense result — each GN step's (F, 2) accumulands
    complete with one psum."""
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba import sharded_bundle_adjust

    sc, dist1, xd = _fov_scene(n_images=8, noise=0.002)
    X0, t0 = _perturbed_state(sc, 0.005)
    mesh = make_mesh({"points": 4})
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=8, delta_tol=1e-10, distortion_rounds=1,
                   distortion_shared=True, distortion_model="fov")
    res_d = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                          distortion=dist1, **common)
    res_s = sharded_bundle_adjust(mesh, xd, X0, sc.K, sc.R, t0, config=cfg,
                                  distortion=dist1, **common)
    np.testing.assert_allclose(
        np.asarray(res_s.distortion), np.asarray(res_d.distortion),
        atol=1e-9,
    )
    np.testing.assert_allclose(float(res_s.error), float(res_d.error),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res_s.X), np.asarray(res_d.X),
                               atol=1e-6)


# ---------- THIN_PRISM_FISHEYE (COLMAP model 10) ----------

def _render_thin_prism(st, dist8, f0=1.0):
    from mvrecon_tpu.models.bundle_adjustment import _thin_prism_terms

    K = build_K(st.f, st.u, f0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    g1 = p / r - st.u[:, 0][None] / f0
    g2 = q / r - st.u[:, 1][None] / f0
    m0, _, _, _, du1, du2, *_ = _thin_prism_terms(st, g1, g2, f0, dist8)
    inv_c = (st.f / f0)[None]
    return jnp.stack(
        [m0 * g1 + du1 * inv_c + st.u[:, 0][None] / f0,
         m0 * g2 + du2 * inv_c + st.u[:, 1][None] / f0], axis=-1
    ) * 1.0


def _thin_prism_scene(n_images=8, seed=0, noise=0.0):
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=n_images, n_slices=4, n_angles=25,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    dist8 = jnp.asarray(np.stack([
        -0.06 + 0.02 * rng.standard_normal(n_images),   # k1
        0.015 + 0.006 * rng.standard_normal(n_images),  # k2
        -0.004 + 0.002 * rng.standard_normal(n_images),  # k3
        0.002 + 0.001 * rng.standard_normal(n_images),  # k4
        0.012 + 0.006 * rng.standard_normal(n_images),  # p1
        -0.009 + 0.005 * rng.standard_normal(n_images),  # p2
        0.006 + 0.003 * rng.standard_normal(n_images),  # sx1
        -0.005 + 0.003 * rng.standard_normal(n_images),  # sy1
    ], axis=-1))
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    xd = _render_thin_prism(st, dist8)
    if noise:
        xd = xd + noise * rng.standard_normal(xd.shape)
    return sc, dist8, xd


def test_thin_prism_forward_matches_reference_formula():
    """The framework's thin-prism terms equal an independent NumPy
    implementation of COLMAP's ThinPrismFisheyeCameraModel (equidistant
    base, then the polynomial + prism shift in the theta plane)."""
    sc, dist8, _ = _thin_prism_scene(n_images=4)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    x_fw = np.asarray(_render_thin_prism(st, dist8))
    X = np.asarray(sc.X)
    for i in range(4):
        R = np.asarray(sc.R[i]); t = np.asarray(sc.t[i])
        f = float(sc.K[i, 0, 0]); cx, cy = np.asarray(sc.K[i, :2, 2])
        k1, k2, k3, k4, p1, p2, sx1, sy1 = np.asarray(dist8[i])
        xc = (X - t) @ R
        a = xc[:, 0] / xc[:, 2]; b = xc[:, 1] / xc[:, 2]
        r = np.sqrt(a * a + b * b)
        th = np.arctan(r)
        u_ = a * th / r
        v_ = b * th / r
        r2 = u_ * u_ + v_ * v_
        radial = k1 * r2 + k2 * r2**2 + k3 * r2**3 + k4 * r2**4
        du = (u_ * radial + 2 * p1 * u_ * v_ + p2 * (r2 + 2 * u_ * u_)
              + sx1 * r2)
        dv = (v_ * radial + p1 * (r2 + 2 * v_ * v_) + 2 * p2 * u_ * v_
              + sy1 * r2)
        u_px = f * (u_ + du) + cx
        v_px = f * (v_ + dv) + cy
        np.testing.assert_allclose(x_fw[:, i, 0], u_px, atol=1e-12)
        np.testing.assert_allclose(x_fw[:, i, 1], v_px, atol=1e-12)


def test_thin_prism_derivs_match_autodiff():
    """The asymmetric two-stage chain D = (I + J_du) M and the
    f-column correction must equal jax autodiff exactly (the one model
    whose distortion Jacobian is not symmetric)."""
    from mvrecon_tpu.models.bundle_adjustment import _state_error

    sc, dist8, xd = _thin_prism_scene(n_images=6)
    nf = 6
    X0, t0 = _perturbed_state(sc, 0.02)
    st = BAState(X=X0, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=t0, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    free = gauge_mask(nf, "x-right_z-forward", jnp.float64)
    derivs, _ = _compute_derivs(st, xd, vis, free, 1.0, None, dist8,
                                "thin_prism")
    npts = X0.shape[0]

    def efun(flat):
        Xv = flat[: 3 * npts].reshape(npts, 3)
        fv = flat[3 * npts: 3 * npts + nf]
        uv = flat[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
        tv = flat[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
        st2 = BAState(X=Xv, f=fv, u=uv, t=tv, R=st.R)
        return _state_error(st2, xd, vis, 1.0, None, dist8, "thin_prism")

    flat = jnp.concatenate([st.X.ravel(), st.f, st.u.ravel(), st.t.ravel()])
    gr = np.asarray(jax.grad(efun)(flat))
    np.testing.assert_allclose(
        gr[: 3 * npts].reshape(npts, 3), np.asarray(derivs.d_P), atol=1e-10
    )
    dF = np.asarray(derivs.d_F).reshape(nf, 9)
    fr = np.asarray(free).reshape(nf, 9)
    gf = gr[3 * npts: 3 * npts + nf]
    gu = gr[3 * npts + nf: 3 * npts + 3 * nf].reshape(nf, 2)
    gt = gr[3 * npts + 3 * nf: 3 * npts + 6 * nf].reshape(nf, 3)
    np.testing.assert_allclose(gf * fr[:, 0], dF[:, 0], atol=1e-10)
    np.testing.assert_allclose(gu * fr[:, 1:3], dF[:, 1:3], atol=1e-10)
    np.testing.assert_allclose(gt * fr[:, 3:6], dF[:, 3:6], atol=1e-10)

    def res_of_omega(w):
        Rw = jnp.matmul(rodrigues(w), st.R)
        st2 = BAState(X=st.X, f=st.f, u=st.u, t=st.t, R=Rw)
        return _state_error(st2, xd, vis, 1.0, None, dist8, "thin_prism")

    gw = np.asarray(jax.grad(res_of_omega)(jnp.zeros((nf, 3), jnp.float64)))
    np.testing.assert_allclose(gw * fr[:, 6:9], dF[:, 6:9], atol=1e-10)


def test_fit_thin_prism_exact_recovery_and_chunked_parity():
    """All 8 thin-prism parameters are linear in the prediction given
    geometry: the refit recovers them exactly (per-camera + tied), and
    the chunked refit matches the dense one."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        fit_distortion_chunked,
    )

    sc, dist8, xd = _thin_prism_scene(n_images=6)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    k_fit = fit_distortion(st, xd, vis, 1.0, model="thin_prism")
    np.testing.assert_allclose(np.asarray(k_fit), np.asarray(dist8),
                               atol=1e-7)

    shared_k = jnp.broadcast_to(
        jnp.asarray([-0.05, 0.012, -0.003, 0.0015, 0.01, -0.008,
                     0.005, -0.004]), (6, 8)
    )
    xd_s = _render_thin_prism(st, shared_k)
    k_tied = fit_distortion(st, xd_s, vis, 1.0, shared=True,
                            model="thin_prism")
    np.testing.assert_allclose(np.asarray(k_tied), np.asarray(shared_k),
                               atol=1e-9)

    k_chunk = fit_distortion_chunked(st, xd, vis, 1.0, chunk_size=32,
                                     model="thin_prism")
    # chunked accumulation reorders the normal-equation sums; the
    # quartic k4 column's conditioning amplifies the reassociation to
    # ~1e-9 on exact data
    np.testing.assert_allclose(np.asarray(k_chunk), np.asarray(k_fit),
                               atol=1e-8)


def test_thin_prism_e2e_and_colmap_roundtrip(tmp_path):
    """BA under the fixed true thin-prism model recovers the geometry;
    a THIN_PRISM_FISHEYE COLMAP model (text + binary) round-trips with
    the model tag and projection parity at GT; dense == chunked."""
    from mvrecon_tpu.models.bundle_adjustment import _state_error
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )
    from mvrecon_tpu.runtime.io import load_colmap, save_colmap

    sc, dist8, xd = _thin_prism_scene(n_images=8, noise=0.0005)
    X0, t0 = _perturbed_state(sc, 0.005)
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=12, delta_tol=1e-12,
                   distortion_model="thin_prism")
    res = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                        distortion=dist8, **common)
    res_pin = bundle_adjust(xd, X0, sc.K, sc.R, t0,
                            config=LMConfig(max_iter=12, delta_tol=1e-12),
                            **common)
    assert (
        float(aligned_rmse(res.X, sc.X))
        < 0.6 * float(aligned_rmse(res_pin.X, sc.X))
    )
    res_c = bundle_adjust_chunked(xd, X0, sc.K, sc.R, t0, config=cfg,
                                  chunk_size=32, distortion=dist8, **common)
    np.testing.assert_allclose(float(res_c.error), float(res.error),
                               rtol=1e-8)

    for binary in (False, True):
        mdir = str(tmp_path / f"m{int(binary)}")
        save_colmap(mdir, np.asarray(xd).transpose(1, 0, 2),
                    np.ones(xd.shape[:2]), np.asarray(sc.X),
                    np.asarray(sc.R), np.asarray(sc.t),
                    np.asarray(sc.K[:, 0, 0]),
                    principal_point=np.asarray(sc.K[:, :2, 2]),
                    distortion=np.asarray(dist8), binary=binary,
                    distortion_model="thin_prism")
        d = load_colmap(mdir)
        assert str(d["distortion_model"]) == "thin_prism"
        np.testing.assert_allclose(d["distortion"], np.asarray(dist8),
                                   atol=1e-12)
        st_l = BAState(
            X=jnp.asarray(d["X"]), f=jnp.asarray(d["f"]),
            u=jnp.asarray(d["K"][:, :2, 2]), t=jnp.asarray(d["t"]),
            R=jnp.asarray(d["R"]),
        )
        e = _state_error(
            st_l, jnp.asarray(d["x"].transpose(1, 0, 2)),
            jnp.asarray(d["visibility"]), 1.0, None,
            jnp.asarray(d["distortion"]), "thin_prism",
        )
        e_direct = _state_error(
            st_l, xd.astype(jnp.float64), jnp.ones(xd.shape[:2]), 1.0,
            None, jnp.asarray(d["distortion"]), "thin_prism",
        )
        np.testing.assert_allclose(float(e), float(e_direct), rtol=1e-9)


# ---------------- undistort_points (Newton inverse of the chain) ----------

def test_undistort_points_roundtrip_all_models():
    """distort(undistort(x)) == x and undistort(distort(x)) == x to fp
    tolerance for every supported family — the Newton inverse on the
    exact chain Jacobian converges from the observed-point init."""
    from mvrecon_tpu.models.bundle_adjustment import (
        distort_points, undistort_points,
    )

    sc = make_synthetic_scene(jax.random.key(0), n_images=6, n_slices=4,
                              n_angles=25, dtype=jnp.float64)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    K = build_K(st.f, st.u, 1.0)
    _, p, q, r = calc_pqr(st.X, K, st.R, st.t)
    x_pin = jnp.stack([p / r, q / r], axis=-1)  # (P, F, 2) pinhole

    rng = np.random.default_rng(0)
    cases = {
        "radial": jnp.asarray(np.stack(
            [-0.3 + 0.05 * rng.standard_normal(6),
             0.05 + 0.02 * rng.standard_normal(6)], -1)),
        "opencv": _opencv_scene(n_images=6)[1],
        "fisheye": _fisheye_scene(n_images=6)[1],
        "full_opencv": _full_opencv_scene(n_images=6)[1],
        "fov": _fov_scene(n_images=6)[1],
        "thin_prism": _thin_prism_scene(n_images=6)[1],
    }
    for model, dist in cases.items():
        xd = distort_points(x_pin, st.f, st.u, 1.0, dist, model)
        back = undistort_points(xd, st.f, st.u, 1.0, dist, model)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x_pin),
                                   atol=1e-11, err_msg=model)
        fwd = distort_points(back, st.f, st.u, 1.0, dist, model)
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(xd),
                                   atol=1e-11, err_msg=model)

    # consistency with the rendered observations: distort_points on the
    # pinhole projection == the model renderers used across this suite
    xd_r = distort_points(x_pin, st.f, st.u, 1.0, cases["fisheye"],
                          "fisheye")
    np.testing.assert_allclose(
        np.asarray(xd_r), np.asarray(_render_fisheye(st, cases["fisheye"])),
        atol=1e-12,
    )


def test_undistort_feeds_pinhole_ba():
    """Undistorted observations through plain pinhole BA reach the same
    geometry as distorted observations through the modeled BA — the
    interop path for pinhole-only downstream consumers."""
    from mvrecon_tpu.models.bundle_adjustment import undistort_points

    sc, dist, xd = _distorted_scene(n_images=8, noise=0.001)
    X0, t0 = _perturbed_state(sc, 0.005)
    common = dict(f0=1.0, axis="x-up_z-forward")
    cfg = LMConfig(max_iter=15, delta_tol=1e-12)
    st = BAState(X=sc.X, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=sc.t, R=sc.R)
    res_model = bundle_adjust(xd, X0, sc.K, sc.R, t0, config=cfg,
                              distortion=dist, **common)
    x_undist = undistort_points(xd, st.f, st.u, 1.0, dist)
    res_pin = bundle_adjust(x_undist, X0, sc.K, sc.R, t0, config=cfg,
                            **common)
    assert (
        float(aligned_rmse(res_pin.X, sc.X))
        < 1.2 * float(aligned_rmse(res_model.X, sc.X))
    )


def test_cli_bal_output_colmap_pinhole(tmp_path, capsys):
    """``bal --output-colmap-pinhole``: the exported model is
    SIMPLE_PINHOLE with observations undistorted through the exact
    chain inverse — reloading it and evaluating the *pinhole* error at
    the refined state reproduces the modeled residual level (the
    image_undistorter contract for NeRF/3DGS-style consumers)."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.models.bundle_adjustment import _state_error
    from mvrecon_tpu.runtime.io import load_colmap, save_colmap

    sc, dist4, xd = _fisheye_scene(n_images=6, noise=0.001)
    X0, t0 = _perturbed_state(sc, 0.003)
    mdir = str(tmp_path / "model")
    out_dir = str(tmp_path / "pinhole")
    save_colmap(mdir, np.asarray(xd).transpose(1, 0, 2),
                np.ones(xd.shape[:2]), np.asarray(X0), np.asarray(sc.R),
                np.asarray(t0), np.asarray(sc.K[:, 0, 0]),
                distortion=np.asarray(dist4), distortion_model="fisheye")
    main(["bal", mdir, "--float64", "--max-iter", "10",
          "--output-colmap-pinhole", out_dir])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    e_model = rec["reprojection_error"]
    d = load_colmap(out_dir)
    assert d["distortion"].shape[-1] == 2 and not d["distortion"].any()
    st_l = BAState(
        X=jnp.asarray(d["X"]), f=jnp.asarray(d["f"]),
        u=jnp.asarray(d["K"][:, :2, 2]), t=jnp.asarray(d["t"]),
        R=jnp.asarray(d["R"]),
    )
    e_pin = float(_state_error(
        st_l, jnp.asarray(d["x"].transpose(1, 0, 2)),
        jnp.asarray(d["visibility"]), 1.0,
    ))
    # the undistorted observations' pinhole error equals the modeled
    # error up to the (tiny) Jacobian reweighting of the noise
    assert e_pin < 2.0 * e_model + 1e-12, (e_pin, e_model)
