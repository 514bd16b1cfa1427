"""Pinhole camera model — functional, batched over cameras.

Capability parity: reference ``lib/camera.py`` (class ``Camera``). The
reference stores one camera per Python object and loops over camera lists
(``camera.py:74-98``); here a "camera rig" is just stacked arrays
``K (F,3,3), R (F,3,3), t (F,3)`` and every op is batched/einsum so the
whole rig projects in one XLA program (vmap-able over scenes).

Conventions (identical to the reference):
- camera matrix  P = K [R^T | -R^T t]   (``camera.py:13-14``)
- look-at with world-top = +X: camera_y = unit(z x top),
  camera_x = unit(y x z), R columns = (x, y, z)  (``camera.py:43-55``)
- K = diag(f, f, f0)  (``camera.py:69``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import HIGHEST
from ..ops.rotations import unit_vec


def intrinsics(f: jax.Array, f0: jax.Array | float = 1.0, u: jax.Array | None = None) -> jax.Array:
    """Build (..., 3, 3) K = [[f, 0, u0], [0, f, v0], [0, 0, f0]].

    ``u`` is the principal point (..., 2); defaults to 0 (the reference's
    ``np.diag((f, f, f0))`` at ``camera.py:69``).
    """
    f = jnp.asarray(f)
    batch = f.shape
    dt = f.dtype
    k = jnp.zeros(batch + (3, 3), dtype=dt)
    k = k.at[..., 0, 0].set(f)
    k = k.at[..., 1, 1].set(f)
    k = k.at[..., 2, 2].set(jnp.asarray(f0, dtype=dt))
    if u is not None:
        k = k.at[..., :2, 2].set(u)
    return k


def camera_matrix(K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """P = K [R^T | -R^T t] for (..., 3, 3)/(..., 3) inputs -> (..., 3, 4)
    (reference ``camera.py:13-14``)."""
    rt = jnp.swapaxes(R, -1, -2)
    trans = -jnp.einsum("...ij,...j->...i", rt, t)
    return jnp.einsum(
        "...ij,...jk->...ik", K, jnp.concatenate([rt, trans[..., None]], axis=-1),
        precision=HIGHEST,
    )


def look_at(origin: jax.Array, target: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(R, t) from camera position and look-at target, world-top = +X
    (reference ``camera.py:43-55``). Batched over leading dims."""
    origin = jnp.asarray(origin)
    target = jnp.asarray(target)
    world_top = jnp.array([1.0, 0.0, 0.0], dtype=origin.dtype)
    camera_z = unit_vec(target - origin)
    camera_y = unit_vec(jnp.cross(camera_z, jnp.broadcast_to(world_top, camera_z.shape)))
    camera_x = unit_vec(jnp.cross(camera_y, camera_z))
    R = jnp.stack([camera_x, camera_y, camera_z], axis=-1)  # columns = x, y, z
    return R, origin


def project_points(X: jax.Array, K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Perspective-project points X (P, 3) through cameras (F, 3, 3)/(F, 3)
    -> (F, P, 2) with homogeneous divide (reference ``camera.py:30-34``,
    batched form of ``calc_projected_points`` at ``camera.py:74-81``)."""
    P = camera_matrix(K, R, t)  # (F, 3, 4)
    Xh = jnp.concatenate([X, jnp.ones((*X.shape[:-1], 1), dtype=X.dtype)], axis=-1)
    proj = jnp.einsum("fij,pj->fpi", P, Xh, precision=HIGHEST)
    return proj[..., :2] / proj[..., 2:3]


def project_points_orthographic(X: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Orthographic projection: camera-frame x, y without divide
    (reference ``camera.py:36-41``)."""
    rt = jnp.swapaxes(R, -1, -2)
    Xc = jnp.einsum("fij,pj->fpi", rt, X) - jnp.einsum("fij,fj->fi", rt, t)[:, None, :]
    return Xc[..., :2]
