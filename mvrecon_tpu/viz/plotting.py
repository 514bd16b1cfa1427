"""3D/2D scene plotting and BA convergence animation (host-side).

Capability parity: reference ``lib/visualization.py`` — same X-up /
Z-forward right-handed axis remap (plot axes show (Y, Z, X), reference
``visualization.py:12-14, :41-44``), the projection-vs-reprojection overlay
grid (``:124-160``), and the LM iteration-log animation (``:163-187``).
Arrays may be JAX or NumPy; everything is converted on the host.
"""

from __future__ import annotations

import numpy as np


def _np(a):
    return np.asarray(a)


class ThreeDimensionalPlotter:
    """3D scatter + camera-basis quivers in an X-up/Z-forward frame
    (reference ``visualization.py:5-63``)."""

    def __init__(self, figsize=None, title=None):
        import matplotlib.pyplot as plt

        self.plt = plt
        self.fig = plt.figure(figsize=figsize)
        self.ax = plt.axes(projection="3d")
        self.ax.set_title(title)
        self.ax.set_xlabel("Y")
        self.ax.set_ylabel("Z")
        self.ax.set_zlabel("X")
        self.ax.set_box_aspect((1, 1, 1))

    def set_lim(self, xlim=(-5.0, 5.0), ylim=(-5.0, 5.0), zlim=(-5.0, 5.0)):
        self.ax.set_xlim3d(ylim)
        self.ax.set_ylim3d(zlim)
        self.ax.set_zlim3d(xlim)

    def plot_basis(self, basis, pos, label=None):
        basis = _np(basis).T
        pos = _np(pos)
        cols = ["r", "g", "b", "r", "r", "g", "g", "b", "b"]
        self.ax.quiver(
            [pos[1]] * 3,
            [pos[2]] * 3,
            [pos[0]] * 3,
            basis[:, 1],
            basis[:, 2],
            basis[:, 0],
            colors=cols,
        )
        if label is not None:
            self.ax.text(pos[1], pos[2], pos[0], label)

    def plot_points(self, X, color="black"):
        X = _np(X)
        self.ax.scatter(X[:, 1], X[:, 2], X[:, 0], c=color, marker=".")

    def show(self):
        self.plt.show()

    def close(self):
        self.plt.clf()
        self.plt.close()

    def pause(self, s=0.1):
        self.plt.pause(s)


class TwoDimensionalMatrixPlotter:
    """Grid of per-camera 2D scatter subplots
    (reference ``visualization.py:66-102``)."""

    def __init__(self, n_row, n_col, figsize=None, is_grid=True):
        import matplotlib.pyplot as plt

        self.plt = plt
        plt.figure(figsize=figsize)
        self.n_row = n_row
        self.n_col = n_col
        self.is_grid = is_grid

    def select(self, plot_id):
        self.current_ax = self.plt.subplot(self.n_row, self.n_col, plot_id + 1)

    def set_property(self, title, xlim=(-1.0, 1.0), ylim=(-1.0, 1.0)):
        self.current_ax.set_title(title)
        self.current_ax.set_aspect("equal")
        # x-up / y-right image convention: plot axes swapped
        self.current_ax.set_xlim(ylim)
        self.current_ax.set_ylim(xlim)
        if self.is_grid:
            self.current_ax.grid()

    def plot_points(self, x, color="black", label=None, alpha=1.0):
        x = _np(x)
        self.current_ax.scatter(x[:, 1], x[:, 0], c=color, marker=".", label=label, alpha=alpha)
        if label is not None:
            self.current_ax.legend()

    def show(self):
        self.plt.show()

    def close(self):
        self.plt.clf()
        self.plt.close()


def show_3d_scene_data(X, R, t, color=None, camera_id_list=None):
    """Points + camera poses (reference ``visualization.py:105-121``)."""
    plotter = ThreeDimensionalPlotter(figsize=(10, 10))
    plotter.set_lim()
    plotter.plot_points(X, color=color)
    for i, (R_, t_) in enumerate(zip(_np(R), _np(t))):
        plotter.plot_basis(
            R_, t_, label=f"{camera_id_list[i] if camera_id_list is not None else i}"
        )
    plotter.show()
    plotter.close()


def show_2d_projection_data(
    x_list, reproj_x_list=None, n_col=6, xlim=(-0.5, 0.5), ylim=(-0.5, 0.5), camera_id_list=None
):
    """Projection (blue) vs reprojection (red, alpha 0.3) overlays
    (reference ``visualization.py:124-160``)."""
    n_images = len(x_list)
    n_row = (n_images - 1) // n_col + 1
    plotter = TwoDimensionalMatrixPlotter(n_row, n_col, (20, 6))
    for i in range(n_row):
        width = range(n_images % n_col) if i == n_images // n_col else range(n_col)
        for j in width:
            idx = n_col * i + j
            plotter.select(idx)
            camera_id = camera_id_list[idx] if camera_id_list is not None else idx
            plotter.set_property(f"Camera {camera_id}", xlim, ylim)
            plotter.plot_points(x_list[idx], color="blue", label="Projection", alpha=1.0)
            if reproj_x_list is not None:
                plotter.plot_points(
                    reproj_x_list[idx], color="red", label="Reprojection", alpha=0.3
                )
    plotter.show()
    plotter.close()


def animate(data):
    """Loop the BA iteration log as an animation
    (reference ``visualization.py:163-187``). ``data`` is a list of dicts
    with keys points/basis/pos (the structure produced by
    ``BundleAdjuster.get_log``)."""
    import matplotlib.pyplot as plt

    plotter = ThreeDimensionalPlotter()
    while plt.fignum_exists(plotter.fig.number):
        for d in data:
            plotter.set_lim()
            plotter.plot_points(d["points"])
            for i, (R_, t_) in enumerate(zip(_np(d["basis"]), _np(d["pos"]))):
                plotter.plot_basis(R_, t_, label=str(i))
            plotter.pause(0.05)
            plotter.ax.cla()
