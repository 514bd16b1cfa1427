"""Reference-compatible ``factorization`` module
(API parity with ``lib/factorization.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from .ops.factorization import factorization_method as _factorization_method


def factorization_method(W, n_rank: int = 4):
    """Factor observation matrix W into motion M and shape S via SVD
    (reference ``lib/factorization.py:5-15``). Accepts array-likes."""
    return _factorization_method(jnp.asarray(W), n_rank=n_rank)
