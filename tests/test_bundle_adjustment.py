"""Parity tests: bundle adjustment vs the reference oracle.

Strategy (SURVEY.md §4): unit-test every derivative/Hessian block against
the reference's own computation on identical state, then end-to-end LM on
the seeded demo scenes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.models.bundle_adjustment import (
    BAState,
    _compute_derivs,
    _damped_solve,
    build_K,
    bundle_adjust,
    calc_pqr,
    gauge_mask,
    normalize_gauge,
    reprojection_error,
    restore_gauge,
)

from conftest import make_ref_scene


@pytest.fixture(scope="module")
def ba_setup(ref, quiet):
    """Reference BundleAdjuster (post-init, normalized frame) + matching
    JAX state, built from the affine demo init (affine_reconstruction.py:
    43-57)."""
    _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
    with quiet():
        X_, R_ = ref.affine.paraperspective_self_calibration(
            [x.copy() for x in x_list], np.ones(12)
        )
    t_ = -3 * R_[:, :, 2]
    K_ = np.broadcast_to(np.eye(3), R_.shape).copy()
    x = np.stack(x_list).transpose(1, 0, 2)

    adjuster = ref.ba.BundleAdjuster(x, X_, K_, R_, t_, axis="x-up_z-forward")

    state = BAState(
        X=jnp.asarray(adjuster._X),
        f=jnp.asarray(adjuster._f),
        u=jnp.asarray(adjuster._u),
        t=jnp.asarray(adjuster._t),
        R=jnp.asarray(adjuster._R),
    )
    return adjuster, state, x, (X_, K_, R_, t_)


def _gauge_flip(R_, t_, ax=1):
    """The documented sign deviation from the reference: +1 where the
    world-frame and camera-0-frame baseline signs agree (conventions
    coincide), -1 where they disagree (the reference's normalize uses
    the world-frame sign, making its restore a scene NEGATION about
    camera 0 — the mirror that broke composition; see normalize_gauge)."""
    d = np.asarray(t_)[1] - np.asarray(t_)[0]
    return float(np.sign(d[ax]) * np.sign(np.asarray(R_)[0][:, ax] @ d))


def test_normalize_gauge_parity(ref, ba_setup):
    adjuster, state, x, (X_, K_, R_, t_) = ba_setup
    Xn, Rn, tn, info = normalize_gauge(
        jnp.asarray(X_), jnp.asarray(R_), jnp.asarray(t_), "x-up_z-forward"
    )
    flip = _gauge_flip(R_, t_)
    np.testing.assert_allclose(np.asarray(Xn), flip * adjuster._X, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Rn), adjuster._R, atol=1e-10)
    np.testing.assert_allclose(np.asarray(tn), flip * adjuster._t, atol=1e-10)
    np.testing.assert_allclose(
        float(info["scale"]), adjuster._init_camera0_params["c0c1_len"], atol=1e-12
    )


def test_restore_gauge_parity(ref, ba_setup):
    """restore_gauge must match the reference's inverse transform
    (bundle_adjustment.py:242-258). Note the reference restore is not an
    exact inverse of normalize (it rescales by |c0c1| while normalize
    divides by a *camera-frame signed* scalar); parity is with its actual
    behavior."""
    adjuster, state, _, (X_, K_, R_, t_) = ba_setup
    Xn, Rn, tn, info = normalize_gauge(
        jnp.asarray(X_), jnp.asarray(R_), jnp.asarray(t_), "x-up_z-forward"
    )
    Xb, Rb, tb = restore_gauge(info, Xn, Rn, tn)
    X_ref, R_ref, t_ref = ref.ba.BundleAdjuster._inverse_transform_to_global_coordinates(
        adjuster._init_camera0_params,
        np.asarray(Xn),
        np.asarray(Rn),
        np.asarray(tn),
    )
    np.testing.assert_allclose(np.asarray(Xb), X_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Rb), R_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(tb), t_ref, atol=1e-10)


def test_pqr_and_error_parity(ref, ba_setup):
    adjuster, state, x, _ = ba_setup
    K_ref = adjuster._get_K(adjuster._f, adjuster._u)
    P_ref, p_ref, q_ref, r_ref = adjuster._calc_pqr(
        adjuster._X, K_ref, adjuster._R, adjuster._t
    )
    e_ref = adjuster._calc_reprojection_error(p_ref, q_ref, r_ref)

    K = build_K(state.f, state.u, 1.0)
    np.testing.assert_allclose(np.asarray(K), K_ref, atol=1e-12)
    pmat, p, q, r = calc_pqr(state.X, K, state.R, state.t)
    np.testing.assert_allclose(np.asarray(pmat), P_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-10)

    vis = jnp.ones(x.shape[:2], dtype=state.X.dtype)
    e = reprojection_error(jnp.asarray(x), p, q, r, vis, 1.0)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-10)


def _reference_derivs(adjuster):
    """Run the reference's derivative stack on its current state."""
    K = adjuster._get_K(adjuster._f, adjuster._u)
    P, p, q, r = adjuster._calc_pqr(adjuster._X, K, adjuster._R, adjuster._t)
    dpdX, dqdX, drdX = adjuster._calc_X_diff_pqr(P)
    dpc, dqc, drc = adjuster._calc_camera_params_diff_pqr(p, q, r)
    d_P = adjuster._calc_d_P(p, q, r, dpdX, dqdX, drdX)
    d_F = adjuster._calc_d_F(p, q, r, dpc, dqc, drc)
    matE = adjuster._calc_matE(p, q, r, dpdX, dqdX, drdX)
    matF = adjuster._calc_matF(p, q, r, dpdX, dqdX, drdX, dpc, dqc, drc)
    matG = adjuster._calc_matG(p, q, r, dpc, dqc, drc)
    return d_P, d_F, matE, matF, matG


def test_derivative_blocks_parity(ref, ba_setup):
    adjuster, state, x, _ = ba_setup
    d_P_ref, d_F_ref, matE_ref, matF_ref, matG_ref = _reference_derivs(adjuster)

    vis = jnp.ones(x.shape[:2], dtype=state.X.dtype)
    free = gauge_mask(12, "x-up_z-forward", state.X.dtype)
    derivs, _ = _compute_derivs(state, jnp.asarray(x), vis, free, 1.0)

    np.testing.assert_allclose(
        np.asarray(derivs.d_P).ravel(), d_P_ref, atol=1e-9
    )
    # Ours keeps the gauge-fixed entries as zeros; the reference deletes them.
    free_np = np.asarray(free).astype(bool)
    np.testing.assert_allclose(np.asarray(derivs.d_F)[free_np], d_F_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(derivs.matE), matE_ref, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(derivs.matF)[:, :, free_np], matF_ref, atol=1e-9
    )
    # matG: reference returns the reduced block-diagonal matrix.
    from mvrecon_tpu.ops.linalg import blockdiag_scatter

    g_full = np.asarray(blockdiag_scatter(derivs.matG))
    np.testing.assert_allclose(g_full[np.ix_(free_np, free_np)], matG_ref, atol=1e-9)


def test_damped_solve_parity(ref, ba_setup):
    """One damped Schur solve must reproduce the reference's (delta_xi_F,
    delta_X) (reference inner loop bundle_adjustment.py:118-152)."""
    adjuster, state, x, _ = ba_setup
    d_P_ref, d_F_ref, matE_ref, matF_ref, matG_ref = _reference_derivs(adjuster)

    c = 1e-4
    matEc = matE_ref.copy()
    idx3 = np.arange(3)
    matEc[:, idx3, idx3] *= 1 + c
    matGc = matG_ref.copy()
    idxg = np.arange(matG_ref.shape[0])
    matGc[idxg, idxg] *= 1 + c
    matEinv = np.linalg.inv(matEc)
    FtEinv = matF_ref.transpose(0, 2, 1) @ matEinv
    A = matGc - (FtEinv @ matF_ref).sum(axis=0)
    n_points = matE_ref.shape[0]
    delta_X_E = d_P_ref.reshape(n_points, 3)[..., None]
    b = (FtEinv @ delta_X_E).squeeze().sum(axis=0) - d_F_ref
    delta_xi_ref = np.linalg.solve(A, b)
    delta_X_ref = -(matEinv @ (matF_ref @ delta_xi_ref[:, None] + delta_X_E)).squeeze()

    vis = jnp.ones(x.shape[:2], dtype=state.X.dtype)
    free = gauge_mask(12, "x-up_z-forward", state.X.dtype)
    derivs, _ = _compute_derivs(state, jnp.asarray(x), vis, free, 1.0)
    delta_xi, delta_x = _damped_solve(derivs, jnp.asarray(c, state.X.dtype), free)

    free_np = np.asarray(free).astype(bool)
    np.testing.assert_allclose(np.asarray(delta_xi)[free_np], delta_xi_ref, atol=1e-8)
    assert np.all(np.asarray(delta_xi)[~free_np] == 0.0)
    np.testing.assert_allclose(np.asarray(delta_x), delta_X_ref, atol=1e-8)


@pytest.mark.parametrize("scene", ["affine", "perspective"])
def test_bundle_adjust_end_to_end_parity(ref, quiet, scene):
    """Full LM runs on both demo scenes: the final reprojection error must
    match the reference's to 1e-6 (relative) and the recovered parameters
    to 1e-4 (both optimizers descend the same protocol)."""
    if scene == "affine":
        _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
        with quiet():
            X_, R_ = ref.affine.paraperspective_self_calibration(
                [x.copy() for x in x_list], np.ones(12)
            )
        t_ = -3 * R_[:, :, 2]
        K_ = np.broadcast_to(np.eye(3), R_.shape).copy()
        max_iter = 30
    else:
        _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
        with quiet():
            X_, R_, t_, K_ = ref.perspective.perspective_self_calibration(
                [x.copy() for x in x_list], 1.0, tol=1e-2, method="dual"
            )
        # calibration K is projective-scale (K22 != 1); our BA normalizes
        # it (intrinsics_from_K, docs/PARITY.md #6) while the reference
        # reads K[0,0] raw, so feed BOTH the normalized K to compare the
        # same trajectory
        K_ = K_ / K_[:, 2:3, 2:3]
        max_iter = 30

    x = np.stack(x_list).transpose(1, 0, 2)

    adjuster = ref.ba.BundleAdjuster(
        x.copy(), X_.copy(), K_.copy(), R_.copy(), t_.copy(), axis="x-up_z-forward"
    )
    with quiet():
        X_ref, K_ref, R_ref, t_ref = adjuster.optimize(2.0, 1e-8, max_iter=max_iter)

    res = bundle_adjust(
        jnp.asarray(x),
        jnp.asarray(X_),
        jnp.asarray(K_),
        jnp.asarray(R_),
        jnp.asarray(t_),
        f0=1.0,
        axis="x-up_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=max_iter),
    )

    # final error parity
    K_final = adjuster._get_K(adjuster._f, adjuster._u)
    _, p, q, r = adjuster._calc_pqr(adjuster._X, K_final, adjuster._R, adjuster._t)
    e_ref = adjuster._calc_reprojection_error(p, q, r)
    np.testing.assert_allclose(float(res.error), e_ref, rtol=1e-6)

    # parameter parity up to the documented sign deviation (the affine
    # scene's calibration output has disagreeing world/camera-0 baseline
    # signs, where the reference restore mirrors the scene about camera
    # 0 — flip == -1 maps its output to ours exactly)
    flip = _gauge_flip(R_, t_)
    t0_ref = t_ref[0]
    np.testing.assert_allclose(
        np.asarray(res.X), t0_ref + flip * (X_ref - t0_ref), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(res.K), K_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.R), R_ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.t), t0_ref + flip * (t_ref - t0_ref), atol=1e-4
    )


def test_bundle_adjust_error_monotone(ref, quiet):
    """Property: the recorded per-iteration error is non-increasing."""
    _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
    with quiet():
        X_, R_ = ref.affine.paraperspective_self_calibration(
            [x.copy() for x in x_list], np.ones(12)
        )
    t_ = -3 * R_[:, :, 2]
    K_ = np.broadcast_to(np.eye(3), R_.shape).copy()
    x = np.stack(x_list).transpose(1, 0, 2)

    res = bundle_adjust(
        jnp.asarray(x),
        jnp.asarray(X_),
        jnp.asarray(K_),
        jnp.asarray(R_),
        jnp.asarray(t_),
        f0=1.0,
        axis="x-up_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=15, record_log=True),
    )
    n = int(res.n_iter)
    errs = np.asarray(res.log["reprojection_error"])[: n + 1]
    assert (np.diff(errs) <= 1e-12).all()


def test_bundle_adjust_visibility_mask(ref, quiet):
    """Masked observations must not influence the solution: zeroing 10%
    of observations AND masking them equals masking alone."""
    _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
    with quiet():
        X_, R_ = ref.affine.paraperspective_self_calibration(
            [x.copy() for x in x_list], np.ones(12)
        )
    t_ = -3 * R_[:, :, 2]
    K_ = np.broadcast_to(np.eye(3), R_.shape).copy()
    x = np.stack(x_list).transpose(1, 0, 2)

    rng = np.random.default_rng(0)
    vis = rng.uniform(size=x.shape[:2]) > 0.1

    x_garbled = x.copy()
    x_garbled[~vis] = 1e3  # garbage where masked

    kwargs = dict(
        f0=1.0, axis="x-up_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=10),
    )
    res_a = bundle_adjust(
        jnp.asarray(x), jnp.asarray(X_), jnp.asarray(K_), jnp.asarray(R_),
        jnp.asarray(t_), visibility=jnp.asarray(vis), **kwargs,
    )
    res_b = bundle_adjust(
        jnp.asarray(x_garbled), jnp.asarray(X_), jnp.asarray(K_), jnp.asarray(R_),
        jnp.asarray(t_), visibility=jnp.asarray(vis), **kwargs,
    )
    np.testing.assert_allclose(np.asarray(res_a.X), np.asarray(res_b.X), atol=1e-10)
    np.testing.assert_allclose(float(res_a.error), float(res_b.error), rtol=1e-10)


def test_bundle_adjust_x_right_axis_parity(ref, quiet):
    """End-to-end LM parity in the reference's *default* gauge mode
    ("x-right_z-forward", index mask [3..8, 12] and the t1_x-based scale
    at bundle_adjustment.py:62-72, 227-238) — the other axis mode is
    covered by the demo-scene parity test."""
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    with quiet():
        X_, R_, t_, K_ = ref.perspective.perspective_self_calibration(
            [x.copy() for x in x_list], 1.0, tol=1e-2, method="dual"
        )
    K_ = K_ / K_[:, 2:3, 2:3]  # normalized K to both (PARITY #6)
    x = np.stack(x_list).transpose(1, 0, 2)

    adjuster = ref.ba.BundleAdjuster(
        x.copy(), X_.copy(), K_.copy(), R_.copy(), t_.copy(),
        axis="x-right_z-forward",
    )
    with quiet():
        X_ref, K_ref, R_ref, t_ref = adjuster.optimize(2.0, 1e-8, max_iter=20)

    res = bundle_adjust(
        jnp.asarray(x), jnp.asarray(X_), jnp.asarray(K_), jnp.asarray(R_),
        jnp.asarray(t_), f0=1.0, axis="x-right_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=20),
    )
    K_final = adjuster._get_K(adjuster._f, adjuster._u)
    _, p, q, r = adjuster._calc_pqr(adjuster._X, K_final, adjuster._R, adjuster._t)
    e_ref = adjuster._calc_reprojection_error(p, q, r)
    np.testing.assert_allclose(float(res.error), e_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.X), X_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.R), R_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.t), t_ref, atol=1e-4)


def test_camera_side_solve_matches_full_kkt():
    """The flipped Schur elimination (3P < 9F regime: closed-form 9x9
    camera-block inverse + (3P, 3P) dense solve) must equal a brute-force
    solve of the full damped KKT system exactly (f64). Also pins the
    gauge semantics: fixed camera params move exactly zero."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvrecon_tpu.geometry.scenes import make_synthetic_scene
    from mvrecon_tpu.models.bundle_adjustment import (
        BAState, _compute_derivs, _damped_solve, gauge_mask, normalize_gauge,
    )

    # P=20, F=10 -> 60 < 90 triggers the camera side
    sc = make_synthetic_scene(jax.random.key(0), n_images=10, n_slices=1,
                              n_angles=20, dtype=jnp.float64)
    k1, k2 = jax.random.split(jax.random.key(1))
    X0 = sc.X + 0.02 * jax.random.normal(k1, sc.X.shape, jnp.float64)
    t0 = sc.t + 0.02 * jax.random.normal(k2, sc.t.shape, jnp.float64)
    Xn, Rn, tn, _ = normalize_gauge(X0, sc.R, t0, "x-up_z-forward")
    st = BAState(X=Xn, f=sc.K[:, 0, 0], u=sc.K[:, :2, 2], t=tn, R=Rn)
    x = sc.x.transpose(1, 0, 2)
    vis = jnp.ones(x.shape[:2], jnp.float64)
    free = gauge_mask(10, "x-up_z-forward", jnp.float64)
    derivs, _ = _compute_derivs(st, x, vis, free, 1.0, None)
    c = jnp.float64(1e-3)
    dxi, dx = _damped_solve(derivs, c, free, None)  # auto -> camera side

    p3 = derivs.matE.shape[0] * 3
    f9 = derivs.matF.shape[2]
    assert p3 < f9  # the flipped branch is the one under test
    E = np.zeros((p3, p3))
    matEc = np.asarray(derivs.matE + 1e-3 * derivs.matE * jnp.eye(3))
    for p in range(p3 // 3):
        E[3 * p:3 * p + 3, 3 * p:3 * p + 3] = matEc[p]
    F = np.asarray(derivs.matF).reshape(p3, f9)
    matGc = np.asarray(derivs.matG + 1e-3 * derivs.matG * jnp.eye(9))
    G = np.zeros((f9, f9))
    for f_ in range(f9 // 9):
        G[9 * f_:9 * f_ + 9, 9 * f_:9 * f_ + 9] = matGc[f_]
    fr = np.asarray(free)
    G = G * np.outer(fr, fr) + np.diag(1 - fr)
    A = np.block([[E, F], [F.T, G]])
    b = -np.concatenate(
        [np.asarray(derivs.d_P).ravel(), np.asarray(derivs.d_F)]
    )
    sol = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(dx), sol[:p3].reshape(-1, 3), atol=1e-9)
    np.testing.assert_allclose(np.asarray(dxi), sol[p3:], atol=1e-9)
    assert (np.asarray(dxi)[fr == 0] == 0.0).all()


def test_restore_normalize_roundtrip_is_identity():
    """restore_gauge(info, *normalize_gauge(state)) == state for ANY
    camera configuration — including poses where the world-frame and
    camera-0-frame baseline signs disagree (with the reference's
    world-frame sign convention those inputs came back NEGATED about
    camera 0: an E-invariant mirror that broke segmented resume and
    scene-compaction composition; see normalize_gauge's docstring)."""
    import jax

    from mvrecon_tpu.models.bundle_adjustment import (
        normalize_gauge,
        restore_gauge,
    )
    from mvrecon_tpu.ops.rotations import rodrigues

    rng = np.random.default_rng(11)
    for trial in range(20):
        X = jnp.asarray(rng.standard_normal((30, 3)))
        omega = jnp.asarray(rng.standard_normal((5, 3)))
        R = rodrigues(omega)  # arbitrary rotations: adversarial frames
        t = jnp.asarray(2.0 * rng.standard_normal((5, 3)))
        for axis in ("x-right_z-forward", "x-up_z-forward"):
            Xn, Rn, tn, info = normalize_gauge(X, R, t, axis)
            Xr, Rr, tr = restore_gauge(info, Xn, Rn, tn)
            np.testing.assert_allclose(Xr, X, atol=1e-12)
            np.testing.assert_allclose(Rr, R, atol=1e-12)
            np.testing.assert_allclose(tr, t, atol=1e-12)
