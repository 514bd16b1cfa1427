"""SYRK micro-benchmark at the north-star chunk shape: XLA einsum vs the
packed lower-triangle Pallas kernel (f32 and bf16 inputs).

Usage: python scripts/bench_syrk.py [K] [N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mvrecon_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

from mvrecon_tpu.ops.pallas_syrk import syrk


def bench(name, fn, flops, *args, n=5):
    out = fn(*args)
    np.asarray(jnp.ravel(out)[:4])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.ravel(out)[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms  {flops / best / 1e12:.1f} TF/s", flush=True)
    return out


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 3 * 4096
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
    flops = 2 * K * N * N
    y = jax.random.normal(jax.random.key(0), (K, N), dtype=jnp.float32)
    yb = y.astype(jnp.bfloat16)
    P = jax.lax.Precision

    r_ref = bench("einsum f32 HIGHEST", jax.jit(
        lambda y: jnp.einsum("km,kn->mn", y, y, precision=P.HIGHEST)), flops, y)
    bench("einsum f32 DEFAULT", jax.jit(
        lambda y: jnp.einsum("km,kn->mn", y, y, precision=P.DEFAULT)), flops, y)
    r_f32 = bench("pallas syrk f32-in", jax.jit(syrk), flops, y)
    r_bf16 = bench("pallas syrk bf16-in", jax.jit(syrk), flops, yb)

    a = np.asarray(r_ref)
    scale = np.abs(a).max()
    print(f"max|err| f32-in:  {np.abs(np.asarray(r_f32) - a).max() / scale:.2e} (rel)")
    print(f"max|err| bf16-in: {np.abs(np.asarray(r_bf16) - a).max() / scale:.2e} (rel)")


if __name__ == "__main__":
    main()
