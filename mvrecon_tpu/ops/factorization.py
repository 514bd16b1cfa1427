"""Tomasi–Kanade-style rank-r factorization of the observation matrix.

Capability parity: reference ``lib/factorization.py:5-15``. The reference
computes a *full* SVD and keeps the leading ``n_rank`` factors; the leading
factors of the reduced SVD are identical, so we use
``full_matrices=False`` (never materializing the (2F, 2F) / (P, P) basis)
and batch over leading dimensions for the multi-scene vmap path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_rank",))
def factorization_method(w: jax.Array, n_rank: int = 4) -> tuple[jax.Array, jax.Array]:
    """Factor W (..., M, P) into motion M (..., M, n_rank) and shape
    S (..., n_rank, P) via SVD (reference ``factorization.py:5-15``).

    ``n_rank=4`` is the projective default; affine paths use 3.
    """
    u, s, vt = jnp.linalg.svd(w, full_matrices=False)
    m = u[..., :, :n_rank]
    shape = s[..., :n_rank, None] * vt[..., :n_rank, :]
    return m, shape
