"""Reconstruction with uncertainty quantification — bundle adjustment
followed by per-point / per-camera covariance estimation
(``models/covariance.py``; no analog in the reference — this is the
capability production stacks get from ceres' ``Covariance``).

Synthetic hemisphere scene -> BA from a perturbed init -> covariance
blocks at the optimum -> summary statistics (and optionally a PLY whose
``quality`` property carries each point's position sigma, colored on a
white->red ramp for MeshLab/CloudCompare).

Run: python examples/uncertainty_reconstruction.py [--ply cloud.ply]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvrecon_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.bundle_adjustment import bundle_adjust
from mvrecon_tpu.models.covariance import ba_covariance


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=123)
    parser.add_argument("--n-images", type=int, default=10)
    parser.add_argument("--noise", type=float, default=0.005)
    parser.add_argument("--ply", type=str, default=None,
                        help="write the cloud with per-point sigma here")
    args = parser.parse_args()

    dtype = jnp.float32
    scene = make_synthetic_scene(
        jax.random.key(args.seed), n_images=args.n_images,
        noise=args.noise, dtype=dtype,
    )
    k1, k2 = jax.random.split(jax.random.key(args.seed))
    X0 = scene.X + 0.03 * jax.random.normal(k1, scene.X.shape, dtype)
    t0 = scene.t + 0.03 * jax.random.normal(k2, scene.t.shape, dtype)
    x = scene.x.transpose(1, 0, 2)  # (P, F, 2)

    res = bundle_adjust(
        x, X0, scene.K, scene.R, t0, f0=1.0, axis="x-up_z-forward",
        config=LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=50),
    )
    print(f"BA: E = {float(res.error):.5f} in {int(res.n_iter)} iterations")

    cov = ba_covariance(
        x, res.X, res.K, res.R, res.t, f0=1.0, axis="x-up_z-forward"
    )
    pt_sig = np.sqrt(np.asarray(cov.point_cov).trace(axis1=1, axis2=2) / 3.0)
    cam_sig = np.sqrt(
        np.asarray(cov.camera_cov)[:, 3:6, 3:6].trace(axis1=1, axis2=2) / 3.0
    )
    print(f"estimated observation sigma: {float(jnp.sqrt(cov.sigma2)):.5f} "
          f"(injected {args.noise})")
    print(f"point position sigma: median {np.median(pt_sig):.5f}, "
          f"max {pt_sig.max():.5f}")
    print("camera position sigma per view (camera 0 pins the gauge):")
    for i, s in enumerate(cam_sig):
        print(f"  cam {i}: {s:.5f}")

    if args.ply:
        from mvrecon_tpu.runtime.io import save_ply

        save_ply(args.ply, np.asarray(res.X), cameras=np.asarray(res.t),
                 quality=pt_sig)
        print(f"wrote {args.ply} (quality = position sigma)")


if __name__ == "__main__":
    main()
