"""Triangulation: exact on clean data, robust to noise and visibility."""

import numpy as np
import jax
import jax.numpy as jnp

from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.ops.triangulation import triangulate, triangulate_sparse


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


def test_triangulate_sparse_matches_dense():
    """The observation-list DLT equals the dense masked DLT on the same
    visibility pattern, and zero-weight (padding) rows are inert."""
    scene = make_synthetic_scene(jax.random.key(3), n_images=10, noise=0.002)
    P, F = scene.X.shape[0], scene.K.shape[0]
    rng = np.random.default_rng(1)
    vis = rng.uniform(size=(P, F)) > 0.4
    vis[:, :3] = True

    X_dense = triangulate(scene.x, scene.K, scene.R, scene.t,
                          visibility=jnp.asarray(vis))

    pi, ci = np.nonzero(vis)
    xy = np.asarray(scene.x)[ci, pi]  # scene.x is (F, P, 2)
    X_sp = triangulate_sparse(
        jnp.asarray(pi, jnp.int32), jnp.asarray(ci, jnp.int32),
        jnp.asarray(xy), P, scene.K, scene.R, scene.t,
    )
    np.testing.assert_allclose(np.asarray(X_sp), np.asarray(X_dense),
                               atol=1e-9)

    # zero-weight padding rows (garbage xy) must not change the result
    n_pad = 17
    pi_p = np.concatenate([pi, np.full(n_pad, P - 1)])
    ci_p = np.concatenate([ci, np.zeros(n_pad, np.int64)])
    xy_p = np.concatenate([xy, 321.0 * np.ones((n_pad, 2))])
    w_p = np.concatenate([np.ones(pi.shape[0]), np.zeros(n_pad)])
    order = np.argsort(pi_p, kind="stable")
    X_pad = triangulate_sparse(
        jnp.asarray(pi_p[order], jnp.int32), jnp.asarray(ci_p[order], jnp.int32),
        jnp.asarray(xy_p[order]), P, scene.K, scene.R, scene.t,
        weights=jnp.asarray(w_p[order]),
    )
    np.testing.assert_allclose(np.asarray(X_pad), np.asarray(X_sp),
                               atol=1e-9)


def test_triangulate_sparse_unseen_points_zero():
    scene = make_synthetic_scene(jax.random.key(4), n_images=6, noise=0.0)
    from mvrecon_tpu.geometry.camera import project_points

    x_clean = project_points(scene.X, scene.K, scene.R, scene.t)
    P = scene.X.shape[0]
    # drop every observation of point 5
    pi, ci = np.nonzero(np.ones((P, 6), bool))
    keep = pi != 5
    pi, ci = pi[keep], ci[keep]
    xy = np.asarray(x_clean)[ci, pi]
    X = np.asarray(triangulate_sparse(
        jnp.asarray(pi, jnp.int32), jnp.asarray(ci, jnp.int32),
        jnp.asarray(xy), P, scene.K, scene.R, scene.t,
    ))
    np.testing.assert_allclose(X[5], 0.0)
    mask = np.arange(P) != 5
    np.testing.assert_allclose(X[mask], np.asarray(scene.X)[mask], atol=1e-7)


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
