"""Covariance estimation for bundle adjustment (models/covariance.py).

The reference (/root/reference) has no uncertainty quantification; the
oracles here are therefore mathematical:

- an *exact* oracle: the full residual Jacobian by jax autodiff on a
  small problem, Sigma = sigma^2 (J^T W J)^{-1} restricted to the free
  (gauge-unpinned) parameters, compared block-for-block against the
  Schur-based computation;
- a *statistical* oracle: Monte-Carlo over noise realizations — the
  empirical scatter of the BA estimates must match the predicted
  covariance (chi^2-consistent traces);
- parity: chunked == dense, Huber weighting, distorted chain support.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.bundle_adjustment import (
    BAState,
    _residuals,
    bundle_adjust,
    gauge_mask,
    normalize_gauge,
)
from mvrecon_tpu.models.covariance import ba_covariance, ba_covariance_chunked
from mvrecon_tpu.ops.rotations import rodrigues


def _scene(n_images=6, n_slices=3, n_angles=10, noise=0.002, seed=0):
    # noise=0.0 in the generator: sc.x must be the *exact* render so the
    # injected noise below is the only stochastic term (sigma^2 claims)
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=n_images, n_slices=n_slices,
        n_angles=n_angles, noise=0.0, dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    x = np.asarray(sc.x).transpose(1, 0, 2)  # (P, F, 2)
    x = jnp.asarray(x + noise * rng.standard_normal(x.shape))
    return sc, x


def _normalized_inputs(sc, x, axis="x-right_z-forward"):
    """Run BA, then re-express its result in the normalized gauge frame
    so the global-frame restore in ba_covariance is the identity and
    block comparisons against the normalized-frame oracle are direct."""
    res = bundle_adjust(
        x, sc.X, sc.K, sc.R, sc.t, axis=axis,
        config=LMConfig(max_iter=40, delta_tol=1e-14),
    )
    Xn, Rn, tn, _ = normalize_gauge(res.X, res.R, res.t, axis)
    return res, Xn, Rn, tn


def _oracle_cov(x, X, K, R, t, vis, axis, f0=1.0, dist=None):
    """sigma^2 (J^T W J)^{-1} via the full autodiff Jacobian (free
    parameters only), returned as (point 3x3 blocks, camera 9x9 blocks)
    with pinned entries zero."""
    npts, nf = X.shape[0], R.shape[0]
    st = BAState(X=X, f=K[:, 0, 0], u=K[:, :2, 2], t=t, R=R)
    free = gauge_mask(nf, axis, x.dtype)

    def resvec(flat):
        Xv = flat[: 3 * npts].reshape(npts, 3)
        cam = flat[3 * npts:].reshape(nf, 9)
        s2 = BAState(
            X=Xv, f=cam[:, 0], u=cam[:, 1:3], t=cam[:, 3:6],
            R=jnp.matmul(rodrigues(cam[:, 6:9]), st.R),
        )
        rp, rq = _residuals(s2, x, vis, f0, dist)
        return jnp.stack([rp, rq], -1).ravel()

    flat0 = jnp.concatenate([
        st.X.ravel(), jnp.concatenate(
            [st.f[:, None], st.u, st.t, jnp.zeros((nf, 3), x.dtype)], axis=1
        ).ravel(),
    ])
    J = jax.jacfwd(resvec)(flat0)  # (2 P F, 3P + 9F)
    w = jnp.repeat(vis.ravel(), 2)
    jtj = (J * w[:, None]).T @ J

    free_full = np.concatenate([np.ones(3 * npts), np.asarray(free)])
    idx = np.nonzero(free_full)[0]
    jtj_f = np.asarray(jtj)[np.ix_(idx, idx)]
    cov_f = np.linalg.inv(jtj_f)
    n = 3 * npts + 9 * nf
    cov = np.zeros((n, n))
    cov[np.ix_(idx, idx)] = cov_f

    e = float(jnp.sum(w * resvec(flat0) ** 2))
    dof = 2 * float(jnp.sum(vis > 0)) - len(idx)
    sigma2 = e / dof
    cov *= sigma2
    pc = np.stack([cov[3 * i: 3 * i + 3, 3 * i: 3 * i + 3]
                   for i in range(npts)])
    cc = np.stack([
        cov[3 * npts + 9 * f_: 3 * npts + 9 * f_ + 9,
            3 * npts + 9 * f_: 3 * npts + 9 * f_ + 9]
        for f_ in range(nf)
    ])
    return pc, cc, sigma2


def test_covariance_matches_autodiff_oracle():
    """Schur-based point/camera covariance blocks == the full-Jacobian
    normal-matrix inverse, block for block, on the normalized state."""
    sc, x = _scene()
    axis = "x-right_z-forward"
    res, Xn, Rn, tn = _normalized_inputs(sc, x, axis)
    vis = jnp.ones(x.shape[:2], jnp.float64)

    cov = ba_covariance(x, Xn, res.K, Rn, tn, axis=axis)
    pc_o, cc_o, sigma2_o = _oracle_cov(x, Xn, res.K, Rn, tn, vis, axis)

    np.testing.assert_allclose(float(cov.sigma2), sigma2_o, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cov.point_cov), pc_o,
                               rtol=1e-6, atol=1e-14)
    np.testing.assert_allclose(np.asarray(cov.camera_cov), cc_o,
                               rtol=1e-6, atol=1e-14)


def test_covariance_global_frame_transform():
    """On a state handed over in the *global* frame the returned blocks
    are the normalized-frame blocks pushed through the gauge similarity
    (points/translations by scale R0, rotations by R0)."""
    sc, x = _scene()
    axis = "x-right_z-forward"
    res = bundle_adjust(
        x, sc.X, sc.K, sc.R, sc.t, axis=axis,
        config=LMConfig(max_iter=40, delta_tol=1e-14),
    )
    cov_g = ba_covariance(x, res.X, res.K, res.R, res.t, axis=axis)

    Xn, Rn, tn, info = normalize_gauge(res.X, res.R, res.t, axis)
    cov_n = ba_covariance(x, Xn, res.K, Rn, tn, axis=axis)
    r0 = np.asarray(info["R0"])
    s = float(info["scale"])
    m = s * r0
    expect_pc = np.einsum("ij,pjk,lk->pil", m, np.asarray(cov_n.point_cov), m)
    np.testing.assert_allclose(np.asarray(cov_g.point_cov), expect_pc,
                               rtol=1e-6, atol=1e-15)
    tmat = np.zeros((9, 9))
    tmat[0, 0] = 1.0
    tmat[1:3, 1:3] = np.eye(2)
    tmat[3:6, 3:6] = m
    tmat[6:9, 6:9] = r0
    expect_cc = np.einsum(
        "ij,fjk,lk->fil", tmat, np.asarray(cov_n.camera_cov), tmat
    )
    np.testing.assert_allclose(np.asarray(cov_g.camera_cov), expect_cc,
                               rtol=1e-6, atol=1e-15)


def test_covariance_chunked_matches_dense():
    """ba_covariance_chunked == ba_covariance exactly (same blocks,
    accumulated over chunks), including with visibility and Huber."""
    sc, x = _scene(n_images=5, n_slices=3, n_angles=9)
    rng = np.random.default_rng(3)
    vis = jnp.asarray(
        (rng.uniform(size=x.shape[:2]) < 0.8).astype(np.float64)
    )
    # every point needs >= 2 views for a determined position
    vis = vis.at[:, :2].set(1.0)
    res = bundle_adjust(
        x, sc.X, sc.K, sc.R, sc.t, visibility=vis,
        config=LMConfig(max_iter=30, delta_tol=1e-14),
    )
    for cfg in (LMConfig(), LMConfig(robust="huber", huber_delta=0.05)):
        cov_d = ba_covariance(x, res.X, res.K, res.R, res.t,
                              visibility=vis, config=cfg)
        cov_c = ba_covariance_chunked(x, res.X, res.K, res.R, res.t,
                                      visibility=vis, config=cfg,
                                      chunk_size=8)
        # chunked accumulation reorders the fp sums: agreement to
        # near-roundoff, not bit-exact
        np.testing.assert_allclose(np.asarray(cov_c.point_cov),
                                   np.asarray(cov_d.point_cov),
                                   rtol=1e-6, atol=1e-15)
        np.testing.assert_allclose(np.asarray(cov_c.camera_cov),
                                   np.asarray(cov_d.camera_cov),
                                   rtol=1e-6, atol=1e-15)
        np.testing.assert_allclose(float(cov_c.sigma2),
                                   float(cov_d.sigma2), rtol=1e-12)


def test_covariance_distorted_chain():
    """Covariance through the radial-distortion chain matches the
    autodiff oracle with the same distorted residuals."""
    from tests.test_distortion import _distorted_scene

    sc, dist, xd = _distorted_scene(n_images=5, n_slices=2, n_angles=8,
                                    noise=0.002)
    axis = "x-up_z-forward"
    res = bundle_adjust(
        xd, sc.X, sc.K, sc.R, sc.t, axis=axis, distortion=dist,
        config=LMConfig(max_iter=30, delta_tol=1e-14),
    )
    Xn, Rn, tn, _ = normalize_gauge(res.X, res.R, res.t, axis)
    vis = jnp.ones(xd.shape[:2], jnp.float64)
    cov = ba_covariance(xd, Xn, res.K, Rn, tn, axis=axis, distortion=dist)
    pc_o, cc_o, _ = _oracle_cov(xd, Xn, res.K, Rn, tn, vis, axis,
                                dist=dist)
    np.testing.assert_allclose(np.asarray(cov.point_cov), pc_o,
                               rtol=1e-6, atol=1e-14)
    np.testing.assert_allclose(np.asarray(cov.camera_cov), cc_o,
                               rtol=1e-6, atol=1e-14)


def test_covariance_monte_carlo_calibration():
    """Statistical validation: over noise realizations, the empirical
    scatter of the BA point estimates (in the normalized gauge frame)
    must match the predicted covariance — mean Mahalanobis distance^2 of
    the 3D point errors ~ 3, and the empirical/predicted trace ratio
    near 1.

    The noise level is deliberately tiny: this scene's deep, narrow-
    baseline triangulation amplifies pixel noise ~50x into 3D, so at
    sigma = 3e-3 the 3D errors reach ~10% of the scene and the
    *linearization itself* breaks (measured: mean d^2 6.7 at 3e-3,
    4.4 at 8e-4, 3.2 at 1e-4 — converging to the chi^2_3 mean as
    noise -> 0). sigma = 1e-4 sits in the asymptotic regime the
    covariance claims to describe."""
    n_runs = 40
    noise = 1e-4
    sc = make_synthetic_scene(
        jax.random.key(0), n_images=6, n_slices=2, n_angles=8,
        noise=0.0, dtype=jnp.float64,
    )
    axis = "x-right_z-forward"
    x_clean = np.asarray(sc.x).transpose(1, 0, 2)
    rng = np.random.default_rng(11)
    cfg = LMConfig(max_iter=40, delta_tol=1e-14)

    # truth in the normalized frame of the *noise-free* geometry
    Xn_true, _, _, _ = normalize_gauge(sc.X, sc.R, sc.t, axis)

    ests = []
    pred = None
    for i in range(n_runs):
        x = jnp.asarray(x_clean + noise * rng.standard_normal(x_clean.shape))
        res = bundle_adjust(x, sc.X, sc.K, sc.R, sc.t, axis=axis, config=cfg)
        Xn, Rn, tn, _ = normalize_gauge(res.X, res.R, res.t, axis)
        ests.append(np.asarray(Xn))
        if i == 0:
            cov = ba_covariance(x, Xn, res.K, Rn, tn, axis=axis)
            pred = np.asarray(cov.point_cov)
            # sigma^2 must recover the injected noise level (one-run
            # chi^2 fluctuation: std ~ sqrt(2/dof) ~ 14% at this size)
            np.testing.assert_allclose(float(cov.sigma2), noise**2,
                                       rtol=0.45)
    ests = np.stack(ests)  # (runs, P, 3)
    err = ests - np.asarray(Xn_true)[None]

    # mean squared Mahalanobis distance per point ~ chi^2_3 mean = 3
    pinv = np.linalg.inv(pred)
    d2 = np.einsum("rpi,pij,rpj->rp", err, pinv, err)
    mean_d2 = float(d2.mean())
    assert 2.2 < mean_d2 < 4.3, mean_d2

    # aggregate trace ratio near 1 (residual nonlinearity + one-run
    # sigma^2 fluctuation leave ~+-30%)
    emp_tr = float((err**2).sum(-1).mean(0).sum())
    pred_tr = float(np.trace(pred.sum(0)))
    assert 0.6 < emp_tr / pred_tr < 1.7, emp_tr / pred_tr


def test_covariance_qualitative_structure():
    """Sanity structure: fewer observing views => larger point
    uncertainty; all covariances symmetric PSD on seen points."""
    sc, x = _scene(n_images=8, n_slices=6, n_angles=20)
    rng = np.random.default_rng(7)
    vis = np.ones(x.shape[:2])
    few = rng.choice(x.shape[0], size=x.shape[0] // 3, replace=False)
    vis[few, 2:] = 0.0  # these points keep only 2 views
    vis = jnp.asarray(vis)
    res = bundle_adjust(
        x, sc.X, sc.K, sc.R, sc.t, visibility=vis,
        config=LMConfig(max_iter=30, delta_tol=1e-14),
    )
    cov = ba_covariance(x, res.X, res.K, res.R, res.t, visibility=vis)
    pc = np.asarray(cov.point_cov)
    np.testing.assert_allclose(pc, pc.transpose(0, 2, 1), atol=1e-18)
    assert (np.linalg.eigvalsh(pc) > -1e-16).all()
    many = np.setdiff1d(np.arange(x.shape[0]), few)
    tr = pc.trace(axis1=1, axis2=2)
    # The camera-induced lift is common-mode and *position-dependent*
    # (this deep narrow-FOV scene leaves per-camera intrinsics soft —
    # real structure, verified against the autodiff oracle above), so
    # it swamps the per-point view-count effect in the raw marginal
    # trace; the clean "fewer views => larger uncertainty" claim lives
    # in the conditional E^-1 part, which is exactly the per-point
    # information the observations contribute.
    assert tr.min() > 0
    from mvrecon_tpu.models.bundle_adjustment import (
        BAState, _compute_derivs, gauge_mask, normalize_gauge as _ng,
    )
    from mvrecon_tpu.ops.linalg import inv3x3
    Xn, Rn, tn, _ = _ng(res.X, res.R, res.t, "x-right_z-forward")
    st = BAState(X=Xn, f=res.K[:, 0, 0], u=res.K[:, :2, 2], t=tn, R=Rn)
    nf = res.K.shape[0]
    free = gauge_mask(nf, "x-right_z-forward", jnp.float64)
    d_, _ = _compute_derivs(st, x, vis, free, 1.0, None, None)
    cond_tr = np.asarray(inv3x3(d_.matE)).trace(axis1=1, axis2=2)
    assert cond_tr[few].mean() > 3.0 * cond_tr[many].mean()


def test_cli_bal_covariance(tmp_path, capsys):
    """CLI ``bal --covariance``: summary sigmas in the JSON record and
    the full blocks in the --output npz."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import save_bal

    sc, x = _scene(n_images=6, n_slices=2, n_angles=8)
    path = str(tmp_path / "prob.txt")
    out_npz = str(tmp_path / "res.npz")
    save_bal(path, np.asarray(x).transpose(1, 0, 2),
             np.ones(x.shape[:2]), np.asarray(sc.X), np.asarray(sc.R),
             np.asarray(sc.t), np.asarray(sc.K[:, 0, 0]))
    main(["bal", path, "--float64", "--max-iter", "20",
          "--ignore-distortion", "--covariance", "--output", out_npz])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["point_sigma_median"] > 0
    assert rec["sigma"] > 0
    d = np.load(out_npz)
    assert d["point_cov"].shape == (x.shape[0], 3, 3)
    assert d["camera_cov"].shape == (6, 9, 9)


def test_sharded_covariance_matches_dense():
    """Point-sharded covariance == dense (one psum completes the camera
    Schur complement; point marginals stay local), with visibility,
    Huber, and distortion."""
    from tests.test_distortion import _distorted_scene

    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_covariance import sharded_ba_covariance

    mesh = make_mesh({"points": 4})
    sc, dist, xd = _distorted_scene(n_images=5, n_slices=2, n_angles=8,
                                    noise=0.002)
    axis = "x-up_z-forward"
    for cfg, d in ((LMConfig(), None),
                   (LMConfig(robust="huber", huber_delta=0.05), dist)):
        res = bundle_adjust(
            xd, sc.X, sc.K, sc.R, sc.t, axis=axis, distortion=d,
            config=LMConfig(max_iter=25, delta_tol=1e-14),
        )
        cov_d = ba_covariance(xd, res.X, res.K, res.R, res.t, axis=axis,
                              config=cfg, distortion=d)
        cov_s = sharded_ba_covariance(mesh, xd, res.X, res.K, res.R,
                                      res.t, axis=axis, config=cfg,
                                      distortion=d)
        np.testing.assert_allclose(np.asarray(cov_s.point_cov),
                                   np.asarray(cov_d.point_cov),
                                   rtol=2e-6, atol=1e-15)
        np.testing.assert_allclose(np.asarray(cov_s.camera_cov),
                                   np.asarray(cov_d.camera_cov),
                                   rtol=2e-6, atol=1e-15)
        np.testing.assert_allclose(float(cov_s.sigma2),
                                   float(cov_d.sigma2), rtol=1e-10)
        assert int(cov_s.n_obs) == int(cov_d.n_obs)


def test_covariance_vmaps_over_scenes():
    """ba_covariance composes with vmap (the scenes-DP axis of the
    batched pipeline): per-scene covariance blocks equal the per-scene
    calls bit-exactly — uncertainty for a whole scene batch is one
    vmapped call."""
    scenes = [
        make_synthetic_scene(jax.random.key(i), n_images=5, n_slices=2,
                             n_angles=8, noise=0.0, dtype=jnp.float64)
        for i in range(3)
    ]
    rng = np.random.default_rng(0)
    xs, Xs, Ks, Rs, ts = [], [], [], [], []
    for sc in scenes:
        x = (np.asarray(sc.x).transpose(1, 0, 2)
             + 0.002 * rng.standard_normal((16, 5, 2)))
        res = bundle_adjust(jnp.asarray(x), sc.X, sc.K, sc.R, sc.t,
                            config=LMConfig(max_iter=25, delta_tol=1e-14))
        xs.append(x)
        Xs.append(res.X)
        Ks.append(res.K)
        Rs.append(res.R)
        ts.append(res.t)
    x_b = jnp.asarray(np.stack(xs))
    args = tuple(jnp.stack(v) for v in (Xs, Ks, Rs, ts))

    cov_b = jax.vmap(lambda x, X, K, R, t: ba_covariance(x, X, K, R, t))(
        x_b, *args
    )
    assert cov_b.point_cov.shape == (3, 16, 3, 3)
    assert cov_b.camera_cov.shape == (3, 5, 9, 9)
    for i in range(3):
        ci = ba_covariance(x_b[i], *(a[i] for a in args))
        np.testing.assert_array_equal(np.asarray(cov_b.point_cov[i]),
                                      np.asarray(ci.point_cov))
        np.testing.assert_array_equal(np.asarray(cov_b.sigma2[i]),
                                      np.asarray(ci.sigma2))


def test_covariance_streamed_matches_dense():
    """ba_covariance_streamed (host-RAM observations, double-buffered
    chunk feed) == ba_covariance on the same data, including visibility
    and Huber (f64 on CPU for an exact comparison)."""
    from mvrecon_tpu.models.covariance import ba_covariance_streamed

    sc, x = _scene(n_images=5, n_slices=3, n_angles=9)
    rng = np.random.default_rng(3)
    vis = (rng.uniform(size=x.shape[:2]) < 0.85).astype(np.float64)
    vis[:, :2] = 1.0
    res = bundle_adjust(
        x, sc.X, sc.K, sc.R, sc.t, visibility=jnp.asarray(vis),
        config=LMConfig(max_iter=25, delta_tol=1e-14),
    )
    for cfg in (LMConfig(), LMConfig(robust="huber", huber_delta=0.05)):
        cov_d = ba_covariance(x, res.X, res.K, res.R, res.t,
                              visibility=jnp.asarray(vis), config=cfg)
        cov_s = ba_covariance_streamed(
            np.asarray(x), res.X, res.K, res.R, res.t, visibility=vis,
            config=cfg, chunk_size=16, dtype=jnp.float64,
        )
        np.testing.assert_allclose(np.asarray(cov_s.point_cov),
                                   np.asarray(cov_d.point_cov),
                                   rtol=1e-6, atol=1e-15)
        np.testing.assert_allclose(np.asarray(cov_s.camera_cov),
                                   np.asarray(cov_d.camera_cov),
                                   rtol=1e-6, atol=1e-15)
        np.testing.assert_allclose(float(cov_s.sigma2),
                                   float(cov_d.sigma2), rtol=1e-10)


def test_cli_bal_covariance_ply_quality(tmp_path, capsys):
    """``bal --covariance --output-ply``: the PLY gains a float quality
    vertex property carrying the per-point position sigma (cameras get
    quality 0)."""
    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import save_bal

    sc, x = _scene(n_images=5, n_slices=2, n_angles=8)
    path = str(tmp_path / "prob.txt")
    ply = str(tmp_path / "cloud.ply")
    save_bal(path, np.asarray(x).transpose(1, 0, 2),
             np.ones(x.shape[:2]), np.asarray(sc.X), np.asarray(sc.R),
             np.asarray(sc.t), np.asarray(sc.K[:, 0, 0]))
    main(["bal", path, "--float64", "--max-iter", "15",
          "--ignore-distortion", "--covariance", "--output-ply", ply])
    capsys.readouterr()
    txt = open(ply).read().splitlines()
    assert "property float quality" in txt
    hdr_end = txt.index("end_header")
    npts, nf = x.shape[0], 5
    assert len(txt) - (hdr_end + 1) == npts + nf
    qs = [float(line.split()[-1]) for line in txt[hdr_end + 1:]]
    assert all(q > 0 for q in qs[:npts])
    assert all(q == 0.0 for q in qs[npts:])


def test_cli_reconstruct_covariance(tmp_path, capsys):
    """CLI ``reconstruct --covariance``: sigma summary in the JSON and
    the blocks in the output npz, with PLY quality."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.geometry.scenes import make_synthetic_scene
    from mvrecon_tpu.runtime.io import save_observations

    # full-size scene: the self-calibration stage needs the demo-scale
    # point count (a 30-point scene fails with status 2)
    sc = make_synthetic_scene(jax.random.key(3), n_images=8,
                              dtype=jnp.float64)
    inp = str(tmp_path / "obs.npz")
    outp = str(tmp_path / "res.npz")
    ply = str(tmp_path / "res.ply")
    save_observations(inp, np.asarray(sc.x))
    main(["reconstruct", inp, "--float64", "--max-iter", "20",
          "--covariance", "--output", outp, "--output-ply", ply])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["point_sigma_median"] > 0
    d = np.load(outp)
    assert d["point_cov"].shape[1:] == (3, 3)
    assert "property float quality" in open(ply).read()
