"""Robust (Huber IRLS) bundle adjustment vs gross outliers."""

import numpy as np
import pytest

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


# ---------------- robust loss family (ceres LossFunction parity) -----------

def test_robust_weight_formulas():
    """The IRLS weights equal the analytic rho'(s) of each loss."""
    import jax.numpy as jnp

    from mvrecon_tpu.models.bundle_adjustment import robust_weight

    m = jnp.asarray([0.0, 0.01, 0.05, 0.2, 5.0])
    d = 0.05
    s = (np.asarray(m) / d) ** 2
    np.testing.assert_allclose(
        np.asarray(robust_weight(m, d, "huber")),
        np.minimum(1.0, d / np.maximum(np.asarray(m), 1e-12)), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(robust_weight(m, d, "cauchy")), 1 / (1 + s), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(robust_weight(m, d, "soft_l1")),
        1 / np.sqrt(1 + s), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(robust_weight(m, d, "arctan")),
        1 / (1 + s * s), rtol=1e-12,
    )
    with pytest.raises(ValueError):
        robust_weight(m, d, "tukey")


@pytest.mark.parametrize("kind", ["cauchy", "soft_l1", "arctan"])
def test_robust_family_resists_outliers(kind):
    """Each non-Huber loss holds the geometry near the inlier accuracy
    under gross outliers where the plain loss is dragged off (the same
    contract the Huber test pins)."""
    from mvrecon_tpu.ops.procrustes import aligned_rmse

    scene, x, X0, t0 = _outlier_problem()
    cfg = LMConfig(max_iter=25, delta_tol=1e-12, robust=kind,
                   huber_delta=0.05)
    res = bundle_adjust(x, X0, scene.K, scene.R, t0, f0=1.0,
                        axis="x-up_z-forward", config=cfg)
    res_plain = bundle_adjust(
        x, X0, scene.K, scene.R, t0, f0=1.0, axis="x-up_z-forward",
        config=LMConfig(max_iter=25, delta_tol=1e-12),
    )
    rmse = float(aligned_rmse(res.X, scene.X))
    rmse_plain = float(aligned_rmse(res_plain.X, scene.X))
    assert rmse < 0.5 * rmse_plain, (kind, rmse, rmse_plain)


def test_robust_family_chunked_and_sharded_parity():
    """The cauchy loss through the chunked and point-sharded cores
    equals the dense core (the IRLS weight threading is shared)."""
    from mvrecon_tpu.models.bundle_adjustment_chunked import (
        bundle_adjust_chunked,
    )
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba import sharded_bundle_adjust

    scene, x, X0, t0 = _outlier_problem()
    cfg = LMConfig(max_iter=10, delta_tol=1e-12, robust="cauchy",
                   huber_delta=0.05)
    common = dict(f0=1.0, axis="x-up_z-forward", config=cfg)
    res_d = bundle_adjust(x, X0, scene.K, scene.R, t0, **common)
    res_c = bundle_adjust_chunked(x, X0, scene.K, scene.R, t0,
                                  chunk_size=64, **common)
    np.testing.assert_allclose(float(res_c.error), float(res_d.error),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res_c.X), np.asarray(res_d.X),
                               atol=1e-8)
    mesh = make_mesh({"points": 4})
    res_s = sharded_bundle_adjust(mesh, x, X0, scene.K, scene.R, t0,
                                  **common)
    np.testing.assert_allclose(float(res_s.error), float(res_d.error),
                               rtol=1e-9)


def test_cli_bal_robust_loss(tmp_path, capsys):
    """CLI ``bal --huber D --robust-loss cauchy`` runs the cauchy IRLS
    end-to-end."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import save_bal

    scene, x, X0, t0 = _outlier_problem()
    path = str(tmp_path / "prob.txt")
    save_bal(path, np.asarray(x).transpose(1, 0, 2), np.ones(x.shape[:2]),
             np.asarray(X0), np.asarray(scene.R), np.asarray(t0),
             np.asarray(scene.K[:, 0, 0]))
    main(["bal", path, "--float64", "--max-iter", "10",
          "--ignore-distortion", "--huber", "0.05",
          "--robust-loss", "cauchy"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(rec["reprojection_error"])
