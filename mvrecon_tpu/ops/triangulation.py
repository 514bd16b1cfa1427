"""Multi-view triangulation with known cameras.

The reference recovers structure only through factorization (no standalone
triangulation module), but a reconstruction framework needs one: given
calibrated cameras and tracked observations, recover 3D points directly.
This is the homogeneous DLT (direct linear transform) solved per point,
batched over all points with one (P, 2F, 4) stacked system — the smallest-
singular-vector problem maps to a batched 4x4 symmetric eigendecomposition
(Gram trick) so the whole thing is einsum + eigh on the MXU, vmappable over
scenes.

With a visibility mask, invisible rows are zeroed (they contribute nothing
to the normal matrix), so ragged tracks triangulate without ragged shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import HIGHEST


def _camera_matrix(K, R, t):
    # imported lazily: geometry.camera itself imports the ops package
    from ..geometry.camera import camera_matrix

    return camera_matrix(K, R, t)


@partial(jax.jit, static_argnames=("f0",))
def triangulate(
    x: jax.Array,
    K: jax.Array,
    R: jax.Array,
    t: jax.Array,
    visibility: jax.Array | None = None,
    f0: float = 1.0,
) -> jax.Array:
    """DLT-triangulate observations x (F, P, 2) through cameras
    (K, R, t) -> points (P, 3).

    Per point, rows of the design matrix are (x/f0 * P3 - P1) and
    (y/f0 * P3 - P2) per camera; the point is the least-squares null
    vector, computed from the 4x4 Gram matrix's smallest eigenvector.
    """
    pmat = _camera_matrix(K, R, t)  # (F, 3, 4)
    p1, p2, p3 = pmat[:, 0], pmat[:, 1], pmat[:, 2]  # (F, 4)

    u = x[..., 0] / f0  # (F, P)
    v = x[..., 1] / f0

    # rows: (F, P, 4)
    row_u = u[..., None] * p3[:, None, :] - p1[:, None, :]
    row_v = v[..., None] * p3[:, None, :] - p2[:, None, :]

    if visibility is not None:
        vis = jnp.asarray(visibility, dtype=x.dtype).T[..., None]  # (F, P, 1)
        row_u = row_u * vis
        row_v = row_v * vis

    # Gram matrix per point: (P, 4, 4)
    gram = jnp.einsum("fpi,fpj->pij", row_u, row_u, precision=HIGHEST)
    gram = gram + jnp.einsum("fpi,fpj->pij", row_v, row_v, precision=HIGHEST)

    _, vecs = jnp.linalg.eigh(gram)
    xh = vecs[..., :, 0]  # smallest eigenvector (P, 4)
    # normalize homogeneous coordinate; guard sign/zero
    w = xh[..., 3:]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return xh[..., :3] / w
