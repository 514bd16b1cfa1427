"""Robust (Huber IRLS) bundle adjustment vs gross outliers."""

import numpy as np
import jax
import jax.numpy as jnp

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.bundle_adjustment import bundle_adjust
from mvrecon_tpu.models.bundle_adjustment import normalize_gauge  # noqa: F401
from mvrecon_tpu.ops.procrustes import aligned_rmse


def _outlier_problem():
    scene = make_synthetic_scene(jax.random.key(21), n_images=10, noise=0.003)
    rng = np.random.default_rng(0)
    x = np.asarray(scene.x).copy()  # (F, P, 2)
    # 3% gross outliers: +-0.3 offsets (60x the noise sigma)
    mask = rng.uniform(size=x.shape[:2]) < 0.03
    x[mask] += rng.choice([-0.3, 0.3], size=(mask.sum(), 2))
    x_obs = jnp.asarray(x.transpose(1, 0, 2))  # (P, F, 2)

    k1, k2 = jax.random.split(jax.random.key(5))
    X0 = scene.X + 0.02 * jax.random.normal(k1, scene.X.shape, dtype=scene.X.dtype)
    t0 = scene.t + 0.02 * jax.random.normal(k2, scene.t.shape, dtype=scene.t.dtype)
    return scene, x_obs, X0, t0


def test_huber_beats_plain_lm_with_outliers():
    scene, x_obs, X0, t0 = _outlier_problem()

    plain = bundle_adjust(
        x_obs, X0, scene.K, scene.R, t0, f0=1.0, axis="x-up_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=25),
    )
    robust = bundle_adjust(
        x_obs, X0, scene.K, scene.R, t0, f0=1.0, axis="x-up_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=25,
                        robust="huber", huber_delta=0.02),
    )

    err_plain = float(aligned_rmse(plain.X, scene.X))
    err_robust = float(aligned_rmse(robust.X, scene.X))
    assert np.isfinite(err_robust)
    # Huber must substantially reduce the outlier-driven 3D error.
    assert err_robust < err_plain * 0.5
    assert err_robust < 0.02


def test_huber_matches_plain_without_outliers():
    """With no outliers and delta above the residual level, Huber weights
    are ~1 and the result matches plain LM."""
    scene = make_synthetic_scene(jax.random.key(33), n_images=10, noise=0.002)
    k1, k2 = jax.random.split(jax.random.key(6))
    X0 = scene.X + 0.01 * jax.random.normal(k1, scene.X.shape, dtype=scene.X.dtype)
    t0 = scene.t + 0.01 * jax.random.normal(k2, scene.t.shape, dtype=scene.t.dtype)
    x_obs = scene.x.transpose(1, 0, 2)

    cfg = dict(f0=1.0, axis="x-up_z-forward")
    plain = bundle_adjust(
        x_obs, X0, scene.K, scene.R, t0,
        config=LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=15), **cfg,
    )
    robust = bundle_adjust(
        x_obs, X0, scene.K, scene.R, t0,
        config=LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=15,
                        robust="huber", huber_delta=1.0), **cfg,
    )
    np.testing.assert_allclose(
        np.asarray(robust.X), np.asarray(plain.X), atol=1e-6
    )


def test_huber_chunked_matches_dense():
    """Robust IRLS must agree between the dense and chunked cores."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import bundle_adjust_chunked

    scene, x_obs, X0, t0 = _outlier_problem()
    cfg = LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=12,
                   robust="huber", huber_delta=0.02)

    dense = bundle_adjust(
        x_obs, X0, scene.K, scene.R, t0, f0=1.0, axis="x-up_z-forward", config=cfg
    )
    chunked = bundle_adjust_chunked(
        x_obs, X0, scene.K, scene.R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, chunk_size=64,
    )
    np.testing.assert_allclose(float(chunked.error), float(dense.error), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(chunked.X), np.asarray(dense.X), atol=1e-7)
