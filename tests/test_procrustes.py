"""Umeyama alignment + reconstruction-accuracy metric."""

import numpy as np
import jax
import jax.numpy as jnp

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.pipelines import euclidean_reconstruction
from mvrecon_tpu.ops.procrustes import aligned_rmse, apply_similarity, umeyama


def test_umeyama_recovers_known_transform():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 3))
    # a known similarity
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    s, t = 2.7, np.array([0.3, -1.2, 4.0])
    y = s * x @ q.T + t

    sim = umeyama(jnp.asarray(x), jnp.asarray(y), allow_reflection=False)
    np.testing.assert_allclose(float(sim.scale), s, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sim.R), q, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sim.t), t, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(apply_similarity(sim, jnp.asarray(x))), y, atol=1e-9
    )


def test_umeyama_handles_reflection():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(80, 3))
    y = x.copy()
    y[:, 2] *= -1  # mirror
    err = float(aligned_rmse(jnp.asarray(x), jnp.asarray(y), allow_reflection=True))
    assert err < 1e-10
    # without reflections the mirror cannot be matched
    err_rigid = float(aligned_rmse(jnp.asarray(x), jnp.asarray(y), allow_reflection=False))
    assert err_rigid > 0.1


def test_reconstruction_accuracy_metric_e2e():
    """The full pipeline's point cloud must align to ground truth at the
    noise level — the quantitative accuracy check the reference does
    visually."""
    scene = make_synthetic_scene(jax.random.key(123), n_images=10)
    res = euclidean_reconstruction(
        scene.x, config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=50)
    )
    err = float(aligned_rmse(res.X, scene.X))
    # sigma=0.005 pixel noise at ~5 unit camera distance -> cm-scale 3D error
    assert err < 0.05
