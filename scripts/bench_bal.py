"""BAL-style ragged-visibility proof point (VERDICT r2 next-step #8).

Generates a realistic sparse-track bundle-adjustment problem in the
standard BAL text format (Agarwal et al., ECCV 2010) — sliding-window
visibility (each point seen only by a consecutive camera window, as in
real sequential capture), pixel noise, a fraction of gross outliers, and
a perturbed initialization — then ingests it through ``runtime.io.load_bal``
and runs Huber-robust BA with the sparse visibility mask. This exercises
the visibility path at realistic sparsity (the synthetic suite's masks
are dense-ish) and the robust loss against real outliers.

Usage: python scripts/bench_bal.py [n_points] [n_cams] [vis_frac] [outlier_frac] [iters]
Writes/reads /tmp/mvrecon_bal_problem.txt; prints one JSON line.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from mvrecon_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.camera import project_points
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.bundle_adjustment import bundle_adjust
from mvrecon_tpu.ops.procrustes import aligned_rmse
from mvrecon_tpu.runtime.io import load_bal, save_bal

PATH = "/tmp/mvrecon_bal_problem.txt"


def make_problem(n_points, n_cams, vis_frac, outlier_frac, seed=0):
    """Sequential-capture scene: window visibility + noise + outliers."""
    sc = make_synthetic_scene(
        jax.random.key(seed), n_images=n_cams, n_slices=n_points // 20,
        n_angles=20, noise=0.0, dtype=jnp.float64,
    )
    x = np.asarray(sc.x)  # (F, P, 2) noise-free
    rng = np.random.default_rng(seed)

    # sliding window: point p is visible in a window of ~vis_frac * F
    # consecutive cameras centred at a point-dependent position
    window = max(2, int(vis_frac * n_cams))
    centers = rng.integers(0, n_cams, n_points)
    lo = np.clip(centers - window // 2, 0, n_cams - window)
    cams = np.arange(n_cams)
    vis = ((cams[None, :] >= lo[:, None]) & (cams[None, :] < (lo + window)[:, None]))
    vis = vis.astype(float)  # (P, F)

    x = x + 0.005 * rng.standard_normal(x.shape)  # pixel noise
    n_out = int(outlier_frac * vis.sum())
    pi, ci = np.nonzero(vis > 0)
    pick = rng.choice(len(pi), n_out, replace=False)
    x[ci[pick], pi[pick]] += rng.standard_normal((n_out, 2)) * 0.5  # gross outliers

    save_bal(
        PATH, x, vis, np.asarray(sc.X), np.asarray(sc.R), np.asarray(sc.t),
        np.asarray(sc.K[:, 0, 0]),
    )
    return np.asarray(sc.X)


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_cams = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    vis_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    outlier_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.02
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 30

    X_gt = make_problem(n_points, n_cams, vis_frac, outlier_frac)
    d = load_bal(PATH)
    n_obs = int(d["visibility"].sum())
    print(
        f"BAL problem: {n_cams} cams, {n_points} pts, {n_obs} observations "
        f"({n_obs / (n_points * n_cams):.1%} visibility)", flush=True,
    )

    dtype = jnp.float32
    x = jnp.asarray(d["x"].transpose(1, 0, 2), dtype)  # (P, F, 2)
    vis = jnp.asarray(d["visibility"], dtype)
    # perturbed init (BAL inits are noisy; ours is GT + noise)
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(d["X"] + 0.05 * rng.standard_normal(d["X"].shape), dtype)
    t0 = jnp.asarray(d["t"] + 0.05 * rng.standard_normal(d["t"].shape), dtype)
    K0 = jnp.asarray(d["K"], dtype)
    R0 = jnp.asarray(d["R"], dtype)

    config = LMConfig(
        scale_factor=4.0, delta_tol=1e-4, max_iter=iters,
        accept_divisor=1.0, init_damping=3e-3, damping="nielsen",
        robust="huber", huber_delta=0.02,
    )

    def run():
        res = bundle_adjust(
            x, X0, K0, R0, t0, f0=1.0, axis="x-up_z-forward",
            config=config, visibility=vis,
        )
        err = float(res.error)
        np.asarray(jnp.ravel(res.X)[:4])
        return res, err

    res, err = run()  # compile
    t0_ = time.perf_counter()
    res, err = run()
    wall = time.perf_counter() - t0_

    rmse = float(aligned_rmse(res.X, jnp.asarray(X_gt, dtype)))
    # inlier noise floor: Huber-weighted E of noise-only residuals ~ n_inlier*2*sigma^2
    floor = (1 - outlier_frac) * n_obs * 2 * 0.005**2
    out = {
        "metric": "bal_huber_ba",
        "cams": n_cams, "points": n_points, "observations": n_obs,
        "visibility_frac": round(n_obs / (n_points * n_cams), 4),
        "outlier_frac": outlier_frac,
        "wall_s": round(wall, 3),
        "n_iter": int(res.n_iter),
        "robust_E": err,
        "E_vs_inlier_floor": round(err / floor, 3),
        "aligned_rmse_vs_gt": rmse,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
