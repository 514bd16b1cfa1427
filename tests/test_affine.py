"""Parity tests: affine self-calibration vs the reference oracle on the
seeded demo scene (SURVEY.md §4: end-to-end parity on seed-123 scenes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mvrecon_tpu.models.affine import (
    affine_self_calibration,
    observation_matrix,
)

from conftest import make_ref_scene


def _stacked(x_list):
    return jnp.asarray(np.stack(x_list))  # (F, P, 2)


def test_observation_matrix_parity(ref):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
    w_ref, t_ref = ref.affine._get_observation_matrix([x.copy() for x in x_list])
    w, t = observation_matrix(_stacked(x_list))
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-12)


@pytest.mark.parametrize("model", ["orthographic", "symmetric", "paraperspective"])
def test_affine_calibration_parity(ref, model):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
    f = np.ones(12)

    if model == "orthographic":
        s_ref, r_ref = ref.affine.orthographic_self_calibration([x.copy() for x in x_list])
        s, r = affine_self_calibration(_stacked(x_list), model="orthographic")
    elif model == "symmetric":
        s_ref, r_ref = ref.affine.symmetric_affine_self_calibration(
            [x.copy() for x in x_list]
        )
        s, r = affine_self_calibration(_stacked(x_list), model="symmetric")
    else:
        s_ref, r_ref = ref.affine.paraperspective_self_calibration(
            [x.copy() for x in x_list], f
        )
        s, r = affine_self_calibration(
            _stacked(x_list), model="paraperspective", f=jnp.asarray(f)
        )

    s = np.asarray(s)
    r = np.asarray(r)
    assert s.shape == s_ref.shape
    assert r.shape == r_ref.shape
    # The metric upgrade is defined up to the SVD/eig sign conventions; on
    # CPU-x64 both use LAPACK so results should agree to fp tolerance.
    np.testing.assert_allclose(s, s_ref, atol=1e-6)
    np.testing.assert_allclose(r, r_ref, atol=1e-6)


def test_affine_calibration_zero_noise_recovers_shape(ref):
    """Property test: with zero noise the recovered shape must match the
    (centered, metrically-aligned) ground truth up to a 3D linear isometry +
    scale — checked via pairwise-distance correlation."""
    X, K, R, t, x_list = make_ref_scene(ref, n_images=12, noise=0.0)
    s, r = affine_self_calibration(
        _stacked(x_list), model="paraperspective", f=jnp.ones(12)
    )
    s = np.asarray(s)
    assert np.isfinite(s).all()
    # compare pairwise distance structure (isometry-invariant)
    d_gt = np.linalg.norm(X[:50, None] - X[None, :50], axis=-1)
    d_rc = np.linalg.norm(s[:50, None] - s[None, :50], axis=-1)
    iu = np.triu_indices(50, 1)
    corr = np.corrcoef(d_gt[iu], d_rc[iu])[0, 1]
    assert corr > 0.99
