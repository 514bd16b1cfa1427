"""Perspective (Euclidean) reconstruction demo — the framework's analog of
the reference driver ``euclidiean_reconstruction.py:13-66``: synthetic
hemisphere scene -> perspective self-calibration (dual method) -> bundle
adjustment -> visualization.

Run: python examples/euclidean_reconstruction.py [--no-viz] [--seed 123]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mvrecon_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.camera import project_points
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.pipelines import euclidean_reconstruction


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-viz", action="store_true", help="headless run")
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--n-images", type=int, default=10)
    parser.add_argument("--method", choices=["primary", "dual"], default="dual")
    parser.add_argument("--tol", type=float, default=1e-2)
    args = parser.parse_args()

    scene = make_synthetic_scene(jax.random.key(args.seed), n_images=args.n_images)

    if not args.no_viz:
        from mvrecon_tpu.viz import show_3d_scene_data

        show_3d_scene_data(scene.X, scene.R, scene.t)

    res = euclidean_reconstruction(
        scene.x,
        f0=1.0,
        tol=args.tol,
        method=args.method,
        # record the per-iteration BA log for the convergence animation
        # (the reference driver's get_log/animate replay) when plotting
        config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100,
                        record_log=not args.no_viz),
    )
    print(f"calibration status: {int(res.status)}")
    print(f"BA iterations: {int(res.n_iter)}, final reprojection error E = {float(res.error):.3e}")

    if not args.no_viz:
        from mvrecon_tpu.viz import show_2d_projection_data, show_3d_scene_data

        show_3d_scene_data(res.X, res.R, res.t)
        reproj = project_points(res.X, res.K, res.R, res.t)
        show_2d_projection_data(
            [scene.x[i] for i in range(scene.x.shape[0])],
            [reproj[i] for i in range(reproj.shape[0])],
            n_col=5,
        )

        # convergence animation (reference euclidiean_reconstruction.py:57-66)
        if res.ba_log is not None:
            from mvrecon_tpu.runtime.logging import device_log_to_records
            from mvrecon_tpu.viz import animate

            animate(device_log_to_records(res.ba_log, int(res.n_iter)))


if __name__ == "__main__":
    main()
