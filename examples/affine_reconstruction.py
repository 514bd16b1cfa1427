"""Affine reconstruction demo — the framework's analog of the reference
driver ``affine_reconstruction.py:14-65``: synthetic hemisphere scene ->
paraperspective self-calibration -> heuristic camera init -> bundle
adjustment -> visualization.

Run: python examples/affine_reconstruction.py [--no-viz] [--seed 123]
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
from mvrecon_tpu.models.pipelines import affine_reconstruction


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-viz", action="store_true", help="headless run")
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--n-images", type=int, default=12)
    parser.add_argument(
        "--model",
        choices=["orthographic", "symmetric", "paraperspective"],
        default="paraperspective",
    )
    args = parser.parse_args()

    scene = make_synthetic_scene(jax.random.key(args.seed), n_images=args.n_images)

    if not args.no_viz:
        from mvrecon_tpu.viz import show_3d_scene_data

        show_3d_scene_data(scene.X, scene.R, scene.t)

    f = jnp.ones((args.n_images,), dtype=scene.x.dtype)
    res = affine_reconstruction(
        scene.x,
        f,
        model=args.model,
        config=LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100),
    )
    print(f"BA iterations: {int(res.n_iter)}, final reprojection error E = {float(res.error):.3e}")

    if not args.no_viz:
        from mvrecon_tpu.viz import show_2d_projection_data, show_3d_scene_data

        show_3d_scene_data(res.X, res.R, res.t)
        reproj = project_points(res.X, res.K, res.R, res.t)
        show_2d_projection_data(
            [scene.x[i] for i in range(scene.x.shape[0])],
            [reproj[i] for i in range(reproj.shape[0])],
            n_col=6,
        )


if __name__ == "__main__":
    main()
