"""Small-matrix linear algebra kernels.

TPU rationale: the pipelines are dominated by *batched tiny* problems
(3x3 inverses at 100k points, 6x6/10x10 symmetric eigenproblems, batched
F x F / P x P eigh). General LAPACK-style ``np.linalg.eig`` (reference
``affine_camera_calibration.py:120,207``, ``perspective_camera_calibration
.py:311,315``) has no TPU lowering — but every matrix the reference feeds it
(B, A, Omega) is symmetric by construction, so ``eigh`` is the TPU-native
replacement. 3x3 inverses (reference ``bundle_adjustment.py:128``) use the
closed-form adjugate: one fused VPU expression instead of a LU factorization,
which is what lets the Schur point-block elimination stay on-device at 100k
points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3x3(m: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of (..., 3, 3) matrices.

    Replaces ``np.linalg.inv`` on the BA point blocks (reference
    ``bundle_adjustment.py:128``): elementwise VPU math, no factorization,
    vmap/shard-friendly.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d

    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, D, G], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([C, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve3x3(m: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (..., 3, 3) @ x = (..., 3) via the adjugate inverse."""
    return jnp.einsum("...ij,...j->...i", inv3x3(m), b)


def min_eigvec_sym(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(eigenvalue, eigenvector) of the smallest eigenvalue of a symmetric
    matrix. ``eigh`` returns ascending order, so index 0.

    Replaces the reference's min-eigenvalue selection over ``np.linalg.eig``
    output (``affine_camera_calibration.py:120-121,207-208``,
    ``perspective_camera_calibration.py:311-312``).
    """
    w, v = jnp.linalg.eigh(a)
    return w[..., 0], v[..., :, 0]


def max_eigvec_sym(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(eigenvalue, eigenvector) of the largest eigenvalue of a symmetric
    matrix (reference max-eig selection at
    ``perspective_camera_calibration.py:115,207``)."""
    w, v = jnp.linalg.eigh(a)
    return w[..., -1], v[..., :, -1]


def orthonormalize(r: jax.Array) -> jax.Array:
    """Project (..., 3, 3) matrices to the nearest orthogonal matrix via
    SVD polar factor U @ Vt (reference ``affine_camera_calibration.py:
    338-339``, ``perspective_camera_calibration.py:434-437``)."""
    u, _, vt = jnp.linalg.svd(r, full_matrices=False)
    return u @ vt


def chol3x3(m: jax.Array) -> jax.Array:
    """Closed-form Cholesky L (lower) of (..., 3, 3) SPD matrices —
    elementwise VPU math, batched."""
    a11, a21, a31 = m[..., 0, 0], m[..., 1, 0], m[..., 2, 0]
    a22, a32, a33 = m[..., 1, 1], m[..., 2, 1], m[..., 2, 2]
    l11 = jnp.sqrt(a11)
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(a22 - l21 * l21)
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(a33 - l31 * l31 - l32 * l32)
    z = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([l11, z, z], axis=-1),
            jnp.stack([l21, l22, z], axis=-1),
            jnp.stack([l31, l32, l33], axis=-1),
        ],
        axis=-2,
    )


def solve_lower3(l: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution L y = b for (..., 3, 3) lower-triangular L and
    (..., 3, N) rhs (closed form, batched)."""
    y0 = b[..., 0, :] / l[..., 0, 0, None]
    y1 = (b[..., 1, :] - l[..., 1, 0, None] * y0) / l[..., 1, 1, None]
    y2 = (
        b[..., 2, :] - l[..., 2, 0, None] * y0 - l[..., 2, 1, None] * y1
    ) / l[..., 2, 2, None]
    return jnp.stack([y0, y1, y2], axis=-2)


def inv_lower3(l: jax.Array) -> jax.Array:
    """Closed-form inverse of (..., 3, 3) lower-triangular matrices.
    Turning L^-1 into an explicit operand lets the big triangular solve
    L^-1 B become ONE batched matmul-shaped einsum (better layout/fusion
    on TPU than the 3-step substitution, which materializes a stack)."""
    i11 = 1.0 / l[..., 0, 0]
    i22 = 1.0 / l[..., 1, 1]
    i33 = 1.0 / l[..., 2, 2]
    i21 = -l[..., 1, 0] * i11 * i22
    i31 = (l[..., 1, 0] * l[..., 2, 1] - l[..., 2, 0] * l[..., 1, 1]) * i11 * i22 * i33
    i32 = -l[..., 2, 1] * i22 * i33
    z = jnp.zeros_like(i11)
    return jnp.stack(
        [
            jnp.stack([i11, z, z], axis=-1),
            jnp.stack([i21, i22, z], axis=-1),
            jnp.stack([i31, i32, i33], axis=-1),
        ],
        axis=-2,
    )


def blockdiag_scatter(blocks: jax.Array) -> jax.Array:
    """(F, K, K) -> (F*K, F*K) block-diagonal matrix, statically shaped.

    TPU-native replacement for ``scipy.linalg.block_diag`` (reference
    ``bundle_adjustment.py:656``): writes blocks onto the (i == j) diagonal
    of the (F, K, F, K) view with one scatter-free ``where`` over an iota
    mask — XLA fuses it into the consumer.
    """
    nf, k, _ = blocks.shape
    eye_f = jnp.eye(nf, dtype=blocks.dtype)
    out = jnp.einsum("fg,fkl->fkgl", eye_f, blocks)
    return out.reshape(nf * k, nf * k)
