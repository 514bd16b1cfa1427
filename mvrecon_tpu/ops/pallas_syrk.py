"""Pallas TPU kernel: symmetric rank-k update S = Y^T Y (SYRK).

This is the hot op of large-scale bundle adjustment: the reduced camera
system accumulates `sum_p F_p^T Einv_p F_p`, which (via the closed-form
3x3 Cholesky of the damped point blocks) is exactly `Y^T Y` with
Y = L^-1 F of shape (3C, 9F) per point-chunk. The product is symmetric —
a plain XLA matmul computes all N^2 output tiles; this kernel enumerates
ONLY the lower-triangular tile pairs (~2x fewer MXU FLOPs and ~2x fewer
HBM tile fetches at 9F = 9000) and the wrapper mirrors the result.

Design (round 2 — the round-1 kernel lost to XLA because its dense
(i, j, k) grid still *fetched* the skipped upper tiles):

- the grid is (T, Kt) where T = nt (nt + 1) / 2 packs the lower triangle;
  the (i, j) tile coordinates for each packed index are precomputed on
  the host and handed to the kernel via ``PrefetchScalarGridSpec`` scalar
  prefetch, so index maps (and therefore DMAs) never touch upper tiles;
- the reduction index k is minor-most: each output tile stays resident in
  VMEM across its whole k-loop and is accumulated in f32;
- inputs may be bf16 (one MXU pass — the fast path the build scan uses
  under ``MVRECON_PRECISION=default``) or f32.

Measured (v5e, K = 12288, N = 9000): XLA einsum 43 ms (DEFAULT) / 97 ms
(HIGHEST); this kernel 24 ms with bf16 inputs — ~1.8x over the best XLA
path, matching the 2x FLOP saving minus mirror overhead. See
``scripts/bench_syrk.py``.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _syrk_kernel(i_map_ref, j_map_ref, yi_ref, yj_ref, out_ref):
    del i_map_ref, j_map_ref  # consumed by the index maps
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        yi_ref[:],
        yj_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lower_tile_maps(nt: int) -> tuple[np.ndarray, np.ndarray]:
    """Packed lower-triangle tile coordinates: t -> (i, j) with i >= j."""
    pairs = [(i, j) for i in range(nt) for j in range(i + 1)]
    idx = np.asarray(pairs, dtype=np.int32)
    return np.ascontiguousarray(idx[:, 0]), np.ascontiguousarray(idx[:, 1])


def syrk_lower(
    y: jax.Array, tile_n: int = 512, tile_k: int = 1024, interpret: bool = False
) -> jax.Array:
    """Padded lower-triangle-only S = Y^T Y for Y (K, N): returns
    (n_pad, n_pad) f32 with only the (block) lower triangle valid —
    unvisited upper tiles hold garbage. Callers that accumulate many
    SYRKs (the chunked Schur scan) sum these and mirror ONCE at the end
    via :func:`mirror_lower` instead of paying the mirror per chunk."""
    k_dim, n_dim = y.shape
    n_pad = _round_up(n_dim, tile_n)
    k_pad = _round_up(k_dim, tile_k)
    y = jnp.pad(y, ((0, k_pad - k_dim), (0, n_pad - n_dim)))

    nt = n_pad // tile_n
    i_map, j_map = _lower_tile_maps(nt)
    n_lower = i_map.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_lower, k_pad // tile_k),
        in_specs=[
            pl.BlockSpec(
                (tile_k, tile_n),
                lambda t, k, i_map, j_map: (k, i_map[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_k, tile_n),
                lambda t, k, i_map, j_map: (k, j_map[t]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, tile_n),
            lambda t, k, i_map, j_map: (i_map[t], j_map[t]),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _syrk_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_pad * tile_n * tile_n * n_lower,
            bytes_accessed=2 * k_pad * n_pad * y.dtype.itemsize
            + n_pad * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(i_map), jnp.asarray(j_map), y, y)


def mirror_lower(lower: jax.Array, n_dim: int, tile_n: int = 512) -> jax.Array:
    """Complete a :func:`syrk_lower` result: mask the (uninitialized)
    upper tiles, transpose the strictly-lower tiles onto the upper side
    (diagonal tiles are already complete and symmetric), unpad."""
    n_pad = lower.shape[0]
    tile_row = jnp.arange(n_pad) // tile_n
    lower_block = tile_row[:, None] >= tile_row[None, :]
    strict_lower_block = tile_row[:, None] > tile_row[None, :]
    lo = jnp.where(lower_block, lower, 0.0)
    full = lo + jnp.where(strict_lower_block, lo, 0.0).T
    return full[:n_dim, :n_dim]


@partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def syrk(
    y: jax.Array, tile_n: int = 512, tile_k: int = 1024, interpret: bool = False
) -> jax.Array:
    """S = Y^T Y for Y (K, N): lower-triangular tiles on the MXU, mirrored.

    Accepts f32 or bf16 input; accumulates in f32 and returns f32 (N, N).
    """
    lower = syrk_lower(y, tile_n=tile_n, tile_k=tile_k, interpret=interpret)
    return mirror_lower(lower, y.shape[1], tile_n=tile_n)


# The Pallas SYRK is the default TPU build-scan path (measured ~1.8x over
# the einsum at the north-star chunk shape); MVRECON_USE_PALLAS_SYRK=0
# opts out back to the XLA einsum.
_USE_PALLAS = os.environ.get("MVRECON_USE_PALLAS_SYRK", "1") == "1"


def use_pallas_syrk(dtype) -> bool:
    return _USE_PALLAS and jax.default_backend() == "tpu" and dtype == jnp.float32


def syrk_or_fallback(y: jax.Array, precision) -> jax.Array:
    """Symmetric product Y^T Y.

    On TPU: the packed lower-triangle Pallas kernel, with bf16 inputs when
    ``precision`` is DEFAULT (single MXU pass) and f32 inputs otherwise.
    Elsewhere (CPU tests/parity): the XLA einsum at ``precision``.
    """
    if use_pallas_syrk(y.dtype):
        if precision == jax.lax.Precision.DEFAULT:
            y = y.astype(jnp.bfloat16)
        return syrk(y)
    return jnp.einsum("km,kn->mn", y, y, precision=precision)


def syrk_lower_or_fallback(y: jax.Array, precision, n_acc: int) -> jax.Array:
    """Accumulation-friendly variant: returns an (n_acc, n_acc) partial
    whose mirror is deferred to :func:`finish_syrk_accumulator` —
    per-chunk calls in a scan sum these directly. ``n_acc`` must be
    ``syrk_accumulator_dim(N)``."""
    n_dim = y.shape[1]
    if use_pallas_syrk(y.dtype):
        if precision == jax.lax.Precision.DEFAULT:
            y = y.astype(jnp.bfloat16)
        return syrk_lower(y)
    full = jnp.einsum("km,kn->mn", y, y, precision=precision)
    return jnp.pad(full, ((0, n_acc - n_dim), (0, n_acc - n_dim)))


def syrk_accumulator_dim(n_dim: int, tile_n: int = 512) -> int:
    """Accumulator side length for :func:`syrk_lower_or_fallback`."""
    return _round_up(n_dim, tile_n) if use_pallas_syrk(jnp.float32) else n_dim


def finish_syrk_accumulator(acc: jax.Array, n_dim: int, dtype) -> jax.Array:
    """Mirror/unpad an accumulated :func:`syrk_lower_or_fallback` sum."""
    if use_pallas_syrk(dtype):
        return mirror_lower(acc, n_dim)
    return acc[:n_dim, :n_dim]
