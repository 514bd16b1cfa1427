"""Synthetic scene generation with explicit ``jax.random`` keys.

Capability parity: reference ``lib/utils.py:32-63`` (``sample_normal_dist``,
``add_noise``, ``sample_hemisphere_points``, ``set_points``). The reference
relies on the global NumPy RNG stream (``np.random.seed(123)`` in the demo
drivers); here every sampler takes an explicit PRNG key (parity tests inject
identical point/noise arrays rather than reproducing NumPy's stream, per
SURVEY.md §2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import default_dtype
from .camera import intrinsics, look_at, project_points


def curved_tube_points(
    n_slices: int = 10, n_angles: int = 20, dtype=None
) -> jax.Array:
    """The canonical "curved tube" test cloud: ``n_slices`` x-slices in
    [-1, 1] x ``n_angles`` angles in [pi/2, 3pi/2], radius 1/(x+2)
    (reference ``utils.py:55-63``; 200 points at defaults)."""
    dtype = dtype or default_dtype()
    x = jnp.linspace(-1.0, 1.0, n_slices, dtype=dtype)
    theta = jnp.linspace(jnp.pi / 2, 3 * jnp.pi / 2, n_angles, dtype=dtype)
    r = 1.0 / (x + 2.0)
    xx = jnp.repeat(x, n_angles)
    rr = jnp.repeat(r, n_angles)
    tt = jnp.tile(theta, n_slices)
    return jnp.stack([xx, rr * jnp.cos(tt), rr * jnp.sin(tt)], axis=-1)


def sample_hemisphere_points(key: jax.Array, num: int, r: float, dtype=None) -> jax.Array:
    """``num`` random positions on the radius-``r`` hemisphere with x >= 0:
    theta ~ U(0, pi/2), phi ~ U(0, 2 pi) (reference ``utils.py:40-52``)."""
    dtype = dtype or default_dtype()
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (num,), dtype=dtype, maxval=jnp.pi / 2)
    phi = jax.random.uniform(k2, (num,), dtype=dtype, maxval=2 * jnp.pi)
    return jnp.stack(
        [
            r * jnp.cos(theta),
            r * jnp.sin(theta) * jnp.cos(phi),
            r * jnp.sin(theta) * jnp.sin(phi),
        ],
        axis=-1,
    )


def add_noise(key: jax.Array, x: jax.Array, scale: float) -> jax.Array:
    """x + N(0, scale) (reference ``utils.py:36-37``)."""
    return x + scale * jax.random.normal(key, x.shape, dtype=x.dtype)


class SyntheticScene(NamedTuple):
    """Ground truth + noisy observations for one synthetic scene."""

    X: jax.Array  # (P, 3) ground-truth points
    K: jax.Array  # (F, 3, 3)
    R: jax.Array  # (F, 3, 3)
    t: jax.Array  # (F, 3)
    x: jax.Array  # (F, P, 2) noisy projections


def make_synthetic_scene(
    key: jax.Array,
    n_images: int = 10,
    f: float = 1.0,
    f0: float = 1.0,
    radius: float = 5.0,
    target_scale: float = 0.5,
    noise: float = 0.005,
    n_slices: int = 10,
    n_angles: int = 20,
    dtype=None,
) -> SyntheticScene:
    """End-to-end synthetic scene matching the reference demo setup
    (``euclidiean_reconstruction.py:16-40`` / ``affine_reconstruction.py:
    17-41``): hemisphere cameras at radius 5 looking at N(0, 0.5) jittered
    targets, curved-tube cloud, sigma=0.005 pixel noise."""
    dtype = dtype or default_dtype()
    k_pos, k_tgt, k_noise = jax.random.split(key, 3)
    pos = sample_hemisphere_points(k_pos, n_images, radius, dtype=dtype)
    targets = target_scale * jax.random.normal(k_tgt, (n_images, 3), dtype=dtype)
    R, t = look_at(pos, targets)
    K = intrinsics(jnp.full((n_images,), f, dtype=dtype), f0)
    X = curved_tube_points(n_slices, n_angles, dtype=dtype)

    npts = X.shape[0]
    if npts * n_images > 100_000_000:
        # Chunk the projection over points: the homogeneous (F, P, 3)
        # intermediate would otherwise dominate HBM at the 10^8-observation
        # scale (e.g. 1M points x 500 views = 6 GB for one temporary).
        chunk = max(1, 50_000_000 // n_images)
        pad = (-npts) % chunk
        Xp = jnp.concatenate([X, jnp.zeros((pad, 3), dtype)], axis=0) if pad else X
        xc = jax.lax.map(
            lambda xs: project_points(xs, K, R, t),
            Xp.reshape(-1, chunk, 3),
        )  # (n_chunks, F, chunk, 2)
        x_clean = xc.transpose(1, 0, 2, 3).reshape(n_images, -1, 2)[:, :npts]
    else:
        x_clean = project_points(X, K, R, t)
    x = add_noise(k_noise, x_clean, noise)
    return SyntheticScene(X=X, K=K, R=R, t=t, x=x)
