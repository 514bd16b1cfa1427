"""Parity tests: perspective self-calibration vs the reference oracle."""

import numpy as np
import jax.numpy as jnp

from mvrecon_tpu.models.perspective import (
    STATUS_OK,
    calc_omega,
    correct_world_coordinates,
    euclidean_upgrading,
    homogenize,
    perspective_self_calibration,
    projective_depths,
    reprojection_error,
    update_intrinsics,
)

from conftest import make_ref_scene


def _stacked(x_list):
    return jnp.asarray(np.stack(x_list))


def test_homogenize_parity(ref):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    expected = ref.perspective._create_data_matrix([x.copy() for x in x_list], 1.0)
    got = np.asarray(homogenize(_stacked(x_list), 1.0))
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_reprojection_error_parity(ref):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 8, 3))
    x[..., 2] = 1.0
    m = rng.normal(size=(24, 4))
    s = rng.normal(size=(4, 50))
    expected = ref.perspective._compute_reprojection_error(x, m, s, 1.5)
    got = float(reprojection_error(jnp.asarray(x), jnp.asarray(m), jnp.asarray(s), 1.5))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_projective_depths_dual_parity(ref, quiet):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    xh_np = ref.perspective._create_data_matrix([x.copy() for x in x_list], 1.0)
    with quiet():
        z_ref = ref.perspective._compute_projective_depth_dual_method(xh_np, 1.0, 0.01)
    xh = homogenize(_stacked(x_list), 1.0)
    z, err, iters = projective_depths(xh, f0=1.0, tolerance=0.01, method="dual")
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-8)
    assert float(err) < 0.01


def test_projective_depths_primary_parity(ref, quiet):
    # Primary method is slower; use a smaller scene.
    _, _, _, _, x_list = make_ref_scene(ref, n_images=6)
    xh_np = ref.perspective._create_data_matrix([x.copy() for x in x_list], 1.0)
    with quiet():
        z_ref = ref.perspective._compute_projective_depth_primary_method(
            xh_np, 1.0, 0.05, max_iter=30
        )
    xh = homogenize(_stacked(x_list), 1.0)
    z, err, iters = projective_depths(
        xh, f0=1.0, tolerance=0.05, method="primary", max_iter=30
    )
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-8)


def test_calc_omega_parity(ref, quiet):
    """Omega from a realistic projective camera set."""
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    xh_np = ref.perspective._create_data_matrix([x.copy() for x in x_list], 1.0)
    with quiet():
        z = ref.perspective._compute_projective_depth_dual_method(xh_np, 1.0, 0.01)
    w = xh_np * z[..., None]
    m, s = ref.perspective.factorization_method(w.reshape(w.shape[0], -1).T)
    p = m.reshape(-1, 3, 4)
    q = np.linalg.inv(ref.perspective._get_initial_intrinsic_params(10, 1.0)) @ p

    omega_ref, sigma_ref, w_ref = ref.perspective._calc_omega(q)
    omega, sigma, wrows, ok = calc_omega(jnp.asarray(q))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), np.real(sigma_ref), atol=1e-8)
    # Omega is sign/branch-canonical after the rank-3 correction.
    np.testing.assert_allclose(np.asarray(omega), np.real(omega_ref), atol=1e-8)


def test_update_K_parity(ref, quiet):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    xh_np = ref.perspective._create_data_matrix([x.copy() for x in x_list], 1.0)
    with quiet():
        z = ref.perspective._compute_projective_depth_dual_method(xh_np, 1.0, 0.01)
    w = xh_np * z[..., None]
    m, s = ref.perspective.factorization_method(w.reshape(w.shape[0], -1).T)
    p = m.reshape(-1, 3, 4)
    k0 = ref.perspective._get_initial_intrinsic_params(10, 1.0)
    q = np.linalg.inv(k0) @ p
    omega_ref, _, _ = ref.perspective._calc_omega(q)

    k_ref, j_ref = ref.perspective._update_K(k0.copy(), np.real(omega_ref), q)
    k, j = update_intrinsics(jnp.asarray(k0), jnp.asarray(np.real(omega_ref)), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(k), k_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(j), j_ref, atol=1e-8)


def test_euclidean_upgrading_tracks_then_beats_reference(ref, quiet):
    """The reference's upgrade loop can terminate *accidentally*: LAPACK
    ``eig`` returns an arbitrarily-signed eigenvector, and a sign flip mid-
    loop (observed at iteration 3 on the seed-123 scene) sends it down the
    negated-Omega branch, spikes J, and breaks the loop. Our Omega is
    trace-canonicalized, so the loop stops only on merit. The test asserts
    (a) exact trajectory parity while the reference's eig signs are
    consistent, and (b) our final self-calibration cost is <= the
    reference's."""
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    xh_np = ref.perspective._create_data_matrix([x.copy() for x in x_list], 1.0)
    with quiet():
        z = ref.perspective._compute_projective_depth_dual_method(xh_np, 1.0, 0.01)
    w = xh_np * z[..., None]
    m, s = ref.perspective.factorization_method(w.reshape(w.shape[0], -1).T)
    p = m.reshape(-1, 3, 4)

    # (a) step-by-step trajectory parity for the first two iterations
    k_ref = ref.perspective._get_initial_intrinsic_params(10, 1.0)
    k_jax = jnp.asarray(k_ref)
    j_ref_seq, j_jax_seq = [], []
    for _ in range(2):
        q_ref = np.linalg.inv(k_ref) @ p
        om_ref, _, _ = ref.perspective._calc_omega(q_ref)
        k_ref, j_ref = ref.perspective._update_K(k_ref, np.real(om_ref), q_ref)
        j_ref_seq.append(np.median(j_ref))

        q_jax = jnp.linalg.inv(k_jax) @ jnp.asarray(p)
        om_jax, _, _, ok = calc_omega(q_jax)
        assert bool(ok)
        k_jax, j_jax = update_intrinsics(k_jax, om_jax, q_jax)
        j_jax_seq.append(float(jnp.median(j_jax)))
        np.testing.assert_allclose(np.asarray(k_jax), np.real(k_ref), atol=1e-8)
    np.testing.assert_allclose(j_jax_seq, j_ref_seq, rtol=1e-6)

    # (b) full loops: ours must do at least as well as the reference
    h_jax, k_full, ok = euclidean_upgrading(jnp.asarray(p), 1.0)
    assert bool(ok)
    q_j = jnp.linalg.inv(k_full) @ jnp.asarray(p)
    om_j, _, _, _ = calc_omega(q_j)
    _, j_final_jax = update_intrinsics(k_full, om_j, q_j)

    with quiet():
        h_ref, k_ref_full = ref.perspective._euclidean_upgrading(p, 1.0)
    q_r = np.linalg.inv(k_ref_full) @ p
    om_r, _, _ = ref.perspective._calc_omega(q_r)
    _, j_final_ref = ref.perspective._update_K(np.real(k_ref_full).copy(), np.real(om_r), q_r)

    assert float(jnp.median(j_final_jax)) <= np.median(np.real(j_final_ref)) + 1e-12


def _rms_reprojection(ref, X, K, R, t, x_list):
    reproj = ref.camera.calc_projected_points(
        np.asarray(X), np.asarray(K), np.asarray(R), np.asarray(t)
    )
    diffs = [np.asarray(a) - b for a, b in zip(reproj, x_list)]
    return float(np.sqrt(np.mean([np.mean(d**2) for d in diffs])))


def test_perspective_self_calibration_end_to_end_quality(ref, quiet):
    """Full pipeline on the seeded demo scene
    (euclidiean_reconstruction.py:42). Because of the reference's
    accidental-termination quirk (see above), outputs are compared by
    reconstruction quality: our RMS reprojection error must match or beat
    the reference's."""
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    with quiet():
        x_ref, r_ref, t_ref, k_ref = ref.perspective.perspective_self_calibration(
            [x.copy() for x in x_list], 1.0, tol=1e-2, method="dual"
        )
    res = perspective_self_calibration(_stacked(x_list), f0=1.0, tol=1e-2, method="dual")
    assert int(res.status) == STATUS_OK

    rms_ref = _rms_reprojection(ref, x_ref, k_ref, r_ref, t_ref, x_list)
    rms_jax = _rms_reprojection(ref, res.X, res.K, res.R, res.t, x_list)
    assert np.isfinite(rms_jax)
    assert rms_jax <= rms_ref * 1.05 + 1e-9
    # and the scene must actually be reconstructed (sub-pixel at f0=1)
    assert rms_jax < 0.05


def test_correct_world_coordinates_parity(ref):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(40, 3))
    # random proper rotations via QR sign fix
    def rot():
        q, r_ = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.diag(r_))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        return q

    R = np.stack([rot() for _ in range(6)])
    t = rng.normal(size=(6, 3))

    for method in ("first_camera", "predict"):
        x_ref, r_ref, t_ref = ref.perspective.correct_world_coordinates(
            X.copy(), R.copy(), t.copy(), method=method
        )
        x_j, r_j, t_j = correct_world_coordinates(
            jnp.asarray(X), jnp.asarray(R), jnp.asarray(t), method=method
        )
        np.testing.assert_allclose(np.asarray(x_j), x_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(r_j), r_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(t_j), t_ref, atol=1e-10)


def test_omega_negative_spectrum_branch(ref):
    """The rank-3 correction's second branch (sigma[1] < 0 after trace
    canonicalization) must follow the reference's formulas
    (perspective_camera_calibration.py:329-330, :397-399)."""
    from mvrecon_tpu.models.perspective import _homography_from_omega

    rng = np.random.default_rng(11)
    # spectrum (+5, -1, -1.5, -2): trace positive, sigma[2] < 0, sigma[1] < 0
    q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    sigma = np.array([5.0, -1.0, -1.5, -2.0])
    omega = (q * sigma) @ q.T

    eigval, eigvec = np.linalg.eigh(omega)
    s_desc = eigval[::-1]
    w_rows = eigvec[:, ::-1].T
    assert s_desc[2] <= 0 and s_desc[1] < 0

    # reference branch-2 formulas (on the same canonical spectrum)
    omega_ref = -((s_desc[2:, None] * w_rows[2:]).T @ w_rows[2:])
    coef = np.hstack(([1.0], np.sqrt(-s_desc[1:])))
    h_ref = (coef[:, None] * w_rows)[::-1].T

    from mvrecon_tpu.models.perspective import calc_omega as _  # noqa: F401
    import mvrecon_tpu.models.perspective as mp

    h = mp._homography_from_omega(jnp.asarray(s_desc), jnp.asarray(w_rows))
    np.testing.assert_allclose(np.asarray(h), h_ref, atol=1e-12)

    def rank_neg(sig, w):
        return -jnp.einsum("k,ki,kj->ij", sig[2:], w[2:], w[2:])

    om = rank_neg(jnp.asarray(s_desc), jnp.asarray(w_rows))
    np.testing.assert_allclose(np.asarray(om), omega_ref, atol=1e-12)


def test_lowrank_depths_match_eigh_depths():
    """The exact low-rank eigensolve fast path must reproduce the dense
    eigh semantics it replaces (VERDICT r1 weak #5 / ADVICE #4). Depths are
    compared up to the per-image sign gauge (flipping one image's depth
    column leaves the rank-4 fit and its reprojection error unchanged)."""
    from mvrecon_tpu.geometry.scenes import make_synthetic_scene
    import jax

    def canon(z):
        z = np.asarray(z)
        return z * np.where(z.sum(axis=0, keepdims=True) < 0, -1.0, 1.0)

    scene = make_synthetic_scene(jax.random.key(3), n_images=10, noise=0.003)
    xh = homogenize(scene.x, 1.0)
    for method in ("primary", "dual"):
        z_e, err_e, it_e = projective_depths(xh, tolerance=0.01, method=method)
        for alias in ("lowrank", "power"):
            z_p, err_p, it_p = projective_depths(
                xh, tolerance=0.01, method=method, eig_method=alias
            )
            assert int(it_p) == int(it_e)
            np.testing.assert_allclose(canon(z_p), canon(z_e), atol=1e-9)
            assert abs(float(err_p) - float(err_e)) < 1e-9


def test_compat_wrapper_warns_on_depth_max_iter(ref):
    """The drop-in wrapper must surface the reference's non-convergence
    warning (reference prints it at :141-143/:232-234)."""
    import warnings as _warnings
    from mvrecon_tpu.perspective_camera_calibration import (
        perspective_self_calibration as compat,
    )
    from mvrecon_tpu.geometry.scenes import make_synthetic_scene
    import jax

    scene = make_synthetic_scene(jax.random.key(0), n_images=8, noise=0.01)
    x_list = [np.asarray(scene.x[i]) for i in range(8)]
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        compat(x_list, tol=1e-12, method="dual")  # unreachable tolerance
    assert any(
        issubclass(w.category, RuntimeWarning) and "max_iter" in str(w.message)
        for w in caught
    )


def test_cheirality_flip_resolves_sign_ambiguity():
    """The dual-quadric upgrade's H is sign-ambiguous; metric
    reconstruction must resolve it by camera-0 cheirality (reference
    ``:442-448``): H and -H give the *identical* scene, and the flip
    branch actually fires for one of the two signs."""
    from mvrecon_tpu.geometry.scenes import make_synthetic_scene
    from mvrecon_tpu.models.perspective import (
        cheirality_score,
        euclidean_upgrading,
        homogenize,
        metric_cameras,
        metric_points,
        metric_reconstruction,
        projective_depths,
    )
    from mvrecon_tpu.ops.factorization import factorization_method
    import jax

    scene = make_synthetic_scene(jax.random.key(123), n_images=10)
    xh = homogenize(scene.x, 1.0)
    z, _, _ = projective_depths(xh, 1.0, 1e-2, "dual")
    w = (xh * z[..., None]).reshape(xh.shape[0], -1).T  # (3F, P)
    m, s = factorization_method(w, 4)
    p = m.reshape(-1, 3, 4)
    h, k, ok = euclidean_upgrading(p, 1.0)
    assert bool(ok)

    res_pos = metric_reconstruction(p, s, k, h)
    res_neg = metric_reconstruction(p, s, k, -h)
    for a, b in zip(res_pos, res_neg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)
    # both fixed outputs have positive cheirality...
    assert float(cheirality_score(*res_pos)) > 0
    # ...and the raw (pre-fix) decomposition violates cheirality for this
    # scene (the SVD orthonormalization inside metric_cameras absorbs H's
    # sign, so both signs land on the same raw configuration) — i.e. the
    # flip branch demonstrably fires
    scores = []
    for hh in (h, -h):
        x_raw = metric_points(s, hh)
        r_raw, t_raw = metric_cameras(p, k, hh)
        scores.append(float(cheirality_score(x_raw, r_raw, t_raw)))
    assert min(scores) <= 0


def test_kr_chunked_gram_matches_oneshot(monkeypatch):
    """The chunked Khatri-Rao Gram accumulation (the above-HBM-budget
    branch of the dual depth step, built for the 100k x 1000 full-pipeline
    north star where the one-shot (F, P, 12) factor alone is 4.47 GB) must
    be arithmetically identical to the one-shot contraction it replaces —
    including under the zero-padding of a non-divisible point count."""
    import mvrecon_tpu.models.perspective as mp

    rng = np.random.default_rng(0)
    npts, nf = 700, 5  # 700 = 5*128 + 60: exercises the padded tail chunk
    v4 = jnp.asarray(rng.standard_normal((npts, 4)))
    xn = jnp.asarray(rng.standard_normal((nf, 3, npts)))

    y = (
        np.asarray(v4).T[None, :, None, :] * np.asarray(xn)[:, None, :, :]
    ).reshape(nf, 12, npts)
    gram_ref = np.einsum("fap,fbp->fab", y, y)

    # one-shot branch (default budget: chunk >= npts)
    assert mp._kr_chunk(npts, nf, 8) >= npts
    np.testing.assert_allclose(
        np.asarray(mp._kr_gram(v4, xn)), gram_ref, rtol=1e-12, atol=1e-12
    )

    # chunked branch: force 128-point chunks
    monkeypatch.setattr(mp, "_KR_CHUNK_BYTES", 128 * nf * 12 * 8)
    assert mp._kr_chunk(npts, nf, 8) == 128
    np.testing.assert_allclose(
        np.asarray(mp._kr_gram(v4, xn)), gram_ref, rtol=1e-10, atol=1e-10
    )

    vec = jnp.asarray(rng.standard_normal((nf, 12)))
    xi_ref = np.einsum("fa,fap->fp", np.asarray(vec), y)
    np.testing.assert_allclose(
        np.asarray(mp._kr_xi(v4, xn, vec)), xi_ref, rtol=1e-10, atol=1e-10
    )


def test_kr_chunked_depth_step_matches_oneshot(monkeypatch):
    """One dual depth step through the chunked-Gram branch must reproduce
    the one-shot low-rank branch up to the per-image depth-sign gauge
    (flipping one image's depth column leaves W^T W, the rank-4 fit, and
    the reprojection error invariant — pinned by
    test_lowrank_depths_match_eigh_depths)."""
    from mvrecon_tpu.geometry.scenes import make_synthetic_scene
    import mvrecon_tpu.models.perspective as mp
    import jax

    def canon(z):
        z = np.asarray(z)
        return z * np.where(z.sum(axis=0, keepdims=True) < 0, -1.0, 1.0)

    scene = make_synthetic_scene(jax.random.key(5), n_images=6, noise=0.002)
    xh = homogenize(scene.x, 1.0)  # (P, F, 3)
    npts, nf = xh.shape[0], xh.shape[1]
    z0 = jnp.ones((npts, nf), dtype=xh.dtype)

    z_one, e_one = mp._depth_step_dual(xh, z0, 1.0, eig_method="lowrank")

    monkeypatch.setattr(
        mp, "_KR_CHUNK_BYTES", 128 * nf * 12 * xh.dtype.itemsize
    )
    assert mp._kr_chunk(npts, nf, xh.dtype.itemsize) < npts
    z_ch, e_ch = mp._depth_step_dual(xh, z0, 1.0, eig_method="lowrank")

    np.testing.assert_allclose(float(e_ch), float(e_one), rtol=1e-10)
    np.testing.assert_allclose(canon(z_ch), canon(z_one), atol=1e-8)
