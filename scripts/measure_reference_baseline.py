"""Measure the reference implementation's CPU wall-clock on the bench
workload (BASELINE.md: the reference publishes no numbers, so we measure
its demos/workloads ourselves). Writes the result to stdout; paste into
bench.py's REFERENCE_CPU_WALL_S.

Usage: python scripts/measure_reference_baseline.py [n_points] [n_views]
"""

import contextlib
import io
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
import lib.camera as rc  # noqa: E402
import lib.utils as ru  # noqa: E402
from lib.bundle_adjustment import BundleAdjuster  # noqa: E402


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    np.random.seed(0)
    pos = ru.sample_hemisphere_points(n_views, 5)
    targets = np.random.normal(0, 0.5, (n_views, 3))
    cams = [rc.Camera.create(p, t, f=1.0, f0=1.0) for p, t in zip(pos, targets)]
    K, R, t = rc.get_camera_parames(cams)
    X = np.random.normal(0, 0.8, (n_points, 3))
    x_list = rc.calc_projected_points(X, K, R, t)
    for x in x_list:
        x += 0.005 * np.random.randn(*x.shape)
    x = np.stack(x_list).transpose(1, 0, 2)

    Xi = X + 0.05 * np.random.randn(*X.shape)
    ti = t + 0.05 * np.random.randn(*t.shape)
    ba = BundleAdjuster(x, Xi, K.copy(), R.copy(), ti, axis="x-up_z-forward")
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        ba.optimize(2.0, 0.0, max_iter=n_iters)
    wall = time.time() - t0
    print(f"reference BA: P={n_points} F={n_views} iters={n_iters} wall={wall:.2f}s")


if __name__ == "__main__":
    main()
