"""Randomized stress parity: multiple seeds/configurations against the
reference oracle (guards against seed-123-only coincidences)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.models.affine import affine_self_calibration
from mvrecon_tpu.models.bundle_adjustment import bundle_adjust
from mvrecon_tpu.models.perspective import projective_depths, homogenize

from conftest import make_ref_scene


@pytest.mark.parametrize("seed,n_images", [(7, 9), (99, 15), (2024, 11)])
def test_affine_parity_across_seeds(ref, seed, n_images):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=n_images, seed=seed)
    f = np.ones(n_images)
    s_ref, r_ref = ref.affine.paraperspective_self_calibration(
        [x.copy() for x in x_list], f
    )
    s, r = affine_self_calibration(
        jnp.asarray(np.stack(x_list)), model="paraperspective", f=jnp.asarray(f)
    )
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-6)


@pytest.mark.parametrize("seed", [5, 42])
def test_depth_dual_parity_across_seeds(ref, quiet, seed):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=7, seed=seed)
    xh_np = ref.perspective._create_data_matrix([x.copy() for x in x_list], 1.0)
    with quiet():
        z_ref = ref.perspective._compute_projective_depth_dual_method(
            xh_np, 1.0, 0.02, max_iter=40
        )
    z, _, _ = projective_depths(
        homogenize(jnp.asarray(np.stack(x_list)), 1.0),
        f0=1.0, tolerance=0.02, method="dual", max_iter=40,
    )
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-8)


@pytest.mark.parametrize("seed,noise", [(31, 0.002), (77, 0.01)])
def test_ba_parity_across_seeds_and_noise(ref, quiet, seed, noise):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10, seed=seed, noise=noise)
    with quiet():
        X_, R_ = ref.affine.paraperspective_self_calibration(
            [x.copy() for x in x_list], np.ones(10)
        )
    t_ = -3 * R_[:, :, 2]
    K_ = np.broadcast_to(np.eye(3), R_.shape).copy()
    x = np.stack(x_list).transpose(1, 0, 2)

    adjuster = ref.ba.BundleAdjuster(
        x.copy(), X_.copy(), K_.copy(), R_.copy(), t_.copy(), axis="x-up_z-forward"
    )
    with quiet():
        X_ref, K_ref, _, t_ref = adjuster.optimize(2.0, 1e-8, max_iter=12)
    K_final = adjuster._get_K(adjuster._f, adjuster._u)
    _, p, q, r = adjuster._calc_pqr(adjuster._X, K_final, adjuster._R, adjuster._t)
    e_ref = adjuster._calc_reprojection_error(p, q, r)

    res = bundle_adjust(
        jnp.asarray(x), jnp.asarray(X_), jnp.asarray(K_), jnp.asarray(R_),
        jnp.asarray(t_), f0=1.0, axis="x-up_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=12),
    )
    np.testing.assert_allclose(float(res.error), e_ref, rtol=1e-6)
    # parity up to the documented sign deviation (docs/PARITY.md #5: on
    # scenes whose world/camera-0 baseline signs disagree, the
    # reference's restore mirrors the scene about camera 0; flip == -1
    # maps its output to ours exactly — see test_bundle_adjustment.py)
    from test_bundle_adjustment import _gauge_flip

    flip = _gauge_flip(R_, t_)
    t0_ref = t_ref[0]
    np.testing.assert_allclose(
        np.asarray(res.X), t0_ref + flip * (X_ref - t0_ref), atol=1e-4
    )
