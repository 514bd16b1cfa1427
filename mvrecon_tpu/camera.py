"""Reference-compatible ``camera`` module (API parity with
``lib/camera.py``): a ``Camera`` class plus the batch helpers
``calc_projected_points`` / ``get_camera_parames``. The functional batched
core lives in ``geometry/camera.py``."""

from __future__ import annotations

import jax.numpy as jnp

from .geometry.camera import (
    camera_matrix,
    intrinsics,
    look_at,
    project_points,
    project_points_orthographic,
)
from .ops.rotations import unit_vec  # noqa: F401 (referenced by users of lib.camera)


class Camera:
    """Pinhole camera (reference ``lib/camera.py:7-71``)."""

    def __init__(self, R, t, K=None):
        self._R = jnp.asarray(R)
        self._t = jnp.asarray(t)
        self._K = jnp.eye(3, dtype=self._R.dtype) if K is None else jnp.asarray(K)

    def get_camera_matrix(self):
        """P = K [R^T | -R^T t] (reference ``camera.py:13-14``)."""
        return camera_matrix(self._K, self._R, self._t)

    def get_parameters(self):
        return self._K, self._R, self._t

    def project_points(self, X, method: str = "perspective"):
        """(P, 3) -> (P, 2) (reference ``camera.py:19-41``)."""
        X = jnp.asarray(X)
        if method == "perspective":
            return project_points(X, self._K[None], self._R[None], self._t[None])[0]
        if method == "orthographic":
            return project_points_orthographic(X, self._R[None], self._t[None])[0]
        raise ValueError(f"unknown projection method: {method}")

    @staticmethod
    def create(origin=(0.0, 0.0, 0.0), target=(0.0, 0.0, 1.0), f: float = 1.0, f0: float = 1.0):
        """Look-at constructor, world-top = +X, K = diag(f, f, f0)
        (reference ``camera.py:57-71``)."""
        origin = jnp.asarray(origin, dtype=jnp.result_type(float))
        target = jnp.asarray(target, dtype=origin.dtype)
        R, t = look_at(origin, target)
        K = intrinsics(jnp.asarray(f, dtype=origin.dtype), f0)
        return Camera(R, t, K)


def calc_projected_points(X, K, R, t):
    """Project through all cameras at once -> list of (P, 2)
    (reference ``camera.py:74-81``; batched internally)."""
    x = project_points(jnp.asarray(X), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t))
    return [x[i] for i in range(x.shape[0])]


def get_camera_parames(camera_list):
    """Stack (K, R, t) from a list of Cameras (reference ``camera.py:84-98``)."""
    K = jnp.stack([c.get_parameters()[0] for c in camera_list])
    R = jnp.stack([c.get_parameters()[1] for c in camera_list])
    t = jnp.stack([c.get_parameters()[2] for c in camera_list])
    return K, R, t
