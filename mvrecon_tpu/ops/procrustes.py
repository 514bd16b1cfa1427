"""Similarity alignment (Umeyama) and reconstruction-quality metrics.

Self-calibrated reconstructions are defined up to a similarity transform
(rotation + translation + scale, possibly a reflection); comparing a
reconstruction to ground truth requires aligning first. The reference has
no evaluation utilities (its quality checks are visual); this is the
closed-form least-squares alignment — one 3x3 SVD, jittable and vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import HIGHEST


class Similarity(NamedTuple):
    scale: jax.Array  # ()
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)


def umeyama(source: jax.Array, target: jax.Array, allow_reflection: bool = False) -> Similarity:
    """Least-squares similarity transform aligning source (P, 3) onto
    target (P, 3): argmin_s,R,t ||s R x + t - y||^2 (Umeyama 1991)."""
    mu_s = source.mean(axis=0)
    mu_t = target.mean(axis=0)
    xs = source - mu_s
    yt = target - mu_t

    cov = jnp.einsum("pi,pj->ij", yt, xs, precision=HIGHEST) / source.shape[0]
    u, d, vt = jnp.linalg.svd(cov)

    if allow_reflection:
        s_diag = jnp.ones(3, dtype=source.dtype)
    else:
        det_sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
        s_diag = jnp.array([1.0, 1.0, 0.0], dtype=source.dtype).at[2].set(det_sign)
        s_diag = jnp.where(s_diag == 0, 1.0, s_diag)  # det_sign==0 edge

    var_s = jnp.mean(jnp.sum(xs * xs, axis=1))
    scale = jnp.sum(d * s_diag) / var_s
    R = (u * s_diag[None, :]) @ vt
    t = mu_t - scale * R @ mu_s
    return Similarity(scale=scale, R=R, t=t)


def apply_similarity(sim: Similarity, x: jax.Array) -> jax.Array:
    return sim.scale * jnp.einsum("ij,pj->pi", sim.R, x) + sim.t


def aligned_rmse(source: jax.Array, target: jax.Array, allow_reflection: bool = True) -> jax.Array:
    """RMSE between point clouds after optimal similarity alignment —
    the standard reconstruction-accuracy metric. Reflections are allowed
    by default because affine/projective self-calibration recovers shape
    only up to an orientation flip."""
    sim = umeyama(source, target, allow_reflection=allow_reflection)
    diff = apply_similarity(sim, source) - target
    return jnp.sqrt(jnp.mean(jnp.sum(diff * diff, axis=1)))
