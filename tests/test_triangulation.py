"""Triangulation: exact on clean data, robust to noise and visibility."""

import numpy as np
import jax
import jax.numpy as jnp

from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.ops.triangulation import triangulate


def test_triangulate_exact_on_clean_data():
    scene = make_synthetic_scene(jax.random.key(0), n_images=8, noise=0.0)
    from mvrecon_tpu.geometry.camera import project_points

    x_clean = project_points(scene.X, scene.K, scene.R, scene.t)
    X = triangulate(x_clean, scene.K, scene.R, scene.t)
    np.testing.assert_allclose(np.asarray(X), np.asarray(scene.X), atol=1e-8)


def test_triangulate_noisy():
    scene = make_synthetic_scene(jax.random.key(1), n_images=10, noise=0.003)
    X = triangulate(scene.x, scene.K, scene.R, scene.t)
    err = np.linalg.norm(np.asarray(X) - np.asarray(scene.X), axis=1)
    assert np.median(err) < 0.05


def test_triangulate_with_visibility():
    scene = make_synthetic_scene(jax.random.key(2), n_images=10, noise=0.0)
    from mvrecon_tpu.geometry.camera import project_points

    x_clean = project_points(scene.X, scene.K, scene.R, scene.t)
    rng = np.random.default_rng(0)
    vis = rng.uniform(size=(x_clean.shape[1], x_clean.shape[0])) > 0.4  # (P, F)
    vis[:, :3] = True  # guarantee >= 3 views per point

    x_garbled = np.asarray(x_clean).copy()
    x_garbled[~vis.T] = 123.0  # garbage where invisible

    X = triangulate(jnp.asarray(x_garbled), scene.K, scene.R, scene.t,
                    visibility=jnp.asarray(vis))
    np.testing.assert_allclose(np.asarray(X), np.asarray(scene.X), atol=1e-6)


def test_triangulate_vmapped_over_scenes():
    """Triangulation vmaps over a scenes axis (batched rigs)."""
    from mvrecon_tpu.geometry.camera import project_points

    scenes = [make_synthetic_scene(jax.random.key(s), n_images=6, noise=0.0)
              for s in (0, 1)]
    x = jnp.stack([project_points(s.X, s.K, s.R, s.t) for s in scenes])
    K = jnp.stack([s.K for s in scenes])
    R = jnp.stack([s.R for s in scenes])
    t = jnp.stack([s.t for s in scenes])
    X = jax.vmap(lambda a, b, c, d: triangulate(a, b, c, d))(x, K, R, t)
    gt = jnp.stack([s.X for s in scenes])
    np.testing.assert_allclose(np.asarray(X), np.asarray(gt), atol=1e-7)
