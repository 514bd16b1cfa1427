"""Benchmark: mid-scale bundle adjustment on one TPU chip.

Workload: P=10,000 points x F=100 views, full visibility, 10 LM iterations
(forced via delta_tol=0), float32 on TPU.

Baseline: the reference implementation (takah29/3d-reconstruction-from-
multi-view-exp, pure NumPy float64, single CPU process) on the *identical*
workload — measured with scripts/measure_reference_baseline.py on this
machine and recorded below (see BASELINE.md). The reference has no
published numbers (README has only qualitative images), so the baseline is
our own measurement of its wall-clock, per BASELINE.md's instruction.

Prints exactly one JSON line:
  {"metric": ..., "value": <tpu seconds>, "unit": "s", "vs_baseline": <speedup>}
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from mvrecon_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.bundle_adjustment import bundle_adjust

# Reference NumPy wall-clock for the same P/F/iterations (CPU, float64),
# measured on this machine; see BASELINE.md ("mid-scale BA baseline").
# Measured 2026-08-16 on this machine (see BASELINE.md):
#   python scripts/measure_reference_baseline.py 10000 100 10 -> 5650.26 s
#   (94 minutes; >33 GB resident - the reference materializes a
#   (P, 9F-7, 9F-7) float64 Schur intermediate. The smaller 2000x50 config
#   measured 651.36 s.)
REFERENCE_CPU_WALL_S = 5650.26

N_POINTS = 10_000
N_VIEWS = 100
N_ITERS = 10


def build_problem(dtype=jnp.float32):
    key = jax.random.key(0)
    scene = make_synthetic_scene(
        key,
        n_images=N_VIEWS,
        n_slices=N_POINTS // 20,
        n_angles=20,
        dtype=dtype,
    )
    k1, k2 = jax.random.split(key)
    X0 = scene.X + 0.05 * jax.random.normal(k1, scene.X.shape, dtype=dtype)
    t0 = scene.t + 0.05 * jax.random.normal(k2, scene.t.shape, dtype=dtype)
    x = scene.x.transpose(1, 0, 2)  # (P, F, 2)
    return x, X0, scene.K, scene.R, t0


def main():
    config = LMConfig(scale_factor=2.0, delta_tol=0.0, max_iter=N_ITERS)
    x, X0, K, R, t0 = build_problem()

    def run():
        res = bundle_adjust(
            x, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=config
        )
        # Force full materialization on the host: on tunneled backends
        # block_until_ready can return before execution, so timing must
        # round-trip actual result bytes.
        err = float(res.error)
        _ = np.asarray(res.X[:8])
        return res, err

    (res, err) = run()  # compile + warm-up
    times = []
    for _ in range(3):
        start = time.perf_counter()
        res, err = run()
        times.append(time.perf_counter() - start)
    wall = min(times)
    assert np.isfinite(err), "BA diverged"

    baseline = REFERENCE_CPU_WALL_S
    vs_baseline = (baseline / wall) if baseline else None
    print(
        json.dumps(
            {
                "metric": f"ba_{N_POINTS}pts_{N_VIEWS}views_{N_ITERS}iter_wall",
                "value": round(wall, 4),
                "unit": "s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
