"""Pallas TPU kernel: symmetric rank-k update S = Y^T Y (SYRK).

This is the hot op of large-scale bundle adjustment: the reduced camera
system accumulates `sum_p F_p^T Einv_p F_p`, which (via the closed-form
3x3 Cholesky of the damped point blocks) is exactly `Y^T Y` with
Y = L^-1 F of shape (3C, 9F) per point-chunk. The product is symmetric —
a plain XLA matmul computes all N^2 output tiles, this kernel computes
only the lower-triangular ones (~2x fewer MXU FLOPs at 9F = 9000) and the
wrapper mirrors the result.

Grid layout: (i, j, k) with the reduction dimension k minor-most so each
output tile is revisited consecutively and accumulated in VMEM; upper
tiles (i < j) skip their MXU work entirely (predicated out with pl.when).

Falls back to a jnp einsum off-TPU (tests run the fallback on CPU and the
kernel in interpret mode; numerics match to f32 accumulation order).

MEASURED VERDICT (v5e, K=12288, N=9000, f32): XLA's einsum runs this
product at ~52 TF/s — essentially the f32 MXU roofline — in 42.6 ms;
this kernel does 47.7-58.6 ms despite issuing half the FLOPs, because
XLA's matmul pipelines HBM->VMEM better than the (i, j, k) block schedule
here. The default build path therefore uses the einsum; the kernel stays
available (MVRECON_USE_PALLAS_SYRK=1) as the starting point for a future
fused generate-and-reduce kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _syrk_kernel(yi_ref, yj_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i >= j)
    def _accumulate():
        out_ref[:] += jax.lax.dot_general(
            yi_ref[:],
            yj_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def syrk(y: jax.Array, tile_n: int = 512, tile_k: int = 512, interpret: bool = False) -> jax.Array:
    """S = Y^T Y for Y (K, N): lower-triangular tiles on the MXU, mirrored.

    Accepts f32 or bf16 input; accumulates in f32 and returns f32 (N, N).
    """
    k_dim, n_dim = y.shape
    n_pad = _round_up(n_dim, tile_n)
    k_pad = _round_up(k_dim, tile_k)
    y = jnp.pad(y, ((0, k_pad - k_dim), (0, n_pad - n_dim)))

    grid = (n_pad // tile_n, n_pad // tile_n, k_pad // tile_k)
    lower = pl.pallas_call(
        _syrk_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_k, tile_n), lambda i, j, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, tile_n), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(y, y)

    # Mirror: strictly-lower block tiles transpose onto the upper side;
    # diagonal tiles are already complete (and symmetric).
    nt = n_pad // tile_n
    tile_row = jnp.arange(n_pad) // tile_n
    strict_lower_block = tile_row[:, None] > tile_row[None, :]
    full = lower + jnp.where(strict_lower_block, lower, 0.0).T
    return full[:n_dim, :n_dim]


def syrk_or_fallback(y: jax.Array, precision) -> jax.Array:
    """Symmetric product Y^T Y. Default: XLA einsum (measured at the MXU
    roofline, see module docstring). MVRECON_USE_PALLAS_SYRK=1 opts into
    the Pallas kernel on TPU."""
    import os

    if (
        os.environ.get("MVRECON_USE_PALLAS_SYRK") == "1"
        and jax.default_backend() == "tpu"
        and y.dtype == jnp.float32
    ):
        if precision == jax.lax.Precision.DEFAULT:
            y = y.astype(jnp.bfloat16)
        return syrk(y)
    return jnp.einsum("km,kn->mn", y, y, precision=precision)
