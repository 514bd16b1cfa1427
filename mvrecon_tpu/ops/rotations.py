"""SO(3) primitives: safe Rodrigues exponential map and helpers.

Capability parity: reference ``lib/utils.py:5-29`` (``unit_vec``,
``get_rotation_matrix``). The reference special-cases ``omega == 0`` with a
Python branch (``utils.py:14-15``); under ``jit`` that must be a traced
``where``-guarded Taylor-safe expression instead — no data-dependent Python
control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unit_vec(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """x / ||x|| along ``axis`` (reference ``utils.py:5-7``)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


def _hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [w]_x for (..., 3) input."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(omega: jax.Array) -> jax.Array:
    """Axis-angle (3,) -> rotation matrix (3, 3), exp([omega]_x).

    Equivalent to reference ``utils.py:10-29`` (R1*R2 + R3*R4 expands to the
    classic Rodrigues formula ``I + sin(t) K + (1-cos(t)) K^2`` with
    ``K = [unit(omega)]_x``), but expressed with Taylor-safe coefficients
    ``sin(t)/t`` and ``(1-cos(t))/t^2`` so that omega -> 0 smoothly yields
    identity (and stays differentiable) instead of the reference's Python
    branch at ``utils.py:14-15``.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < 1e-16
    # Gradient-safe: branch BEFORE the sqrt (d sqrt/d x at 0 is inf, and
    # jnp.where differentiates both branches), then select series vs exact.
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    K = _hat(omega)
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def rodrigues_batched(omega: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrices (vectorized)."""
    return rodrigues(omega)
