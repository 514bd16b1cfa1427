"""Headless smoke tests for the visualization layer (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax
import jax.numpy as jnp


def test_3d_plotter_renders():
    from mvrecon_tpu.viz.plotting import ThreeDimensionalPlotter

    p = ThreeDimensionalPlotter(title="test")
    p.set_lim()
    p.plot_points(np.random.default_rng(0).normal(size=(50, 3)))
    p.plot_basis(np.eye(3), np.zeros(3), label="cam0")
    p.fig.canvas.draw()
    p.close()


def test_2d_matrix_plotter_renders():
    from mvrecon_tpu.viz.plotting import TwoDimensionalMatrixPlotter

    p = TwoDimensionalMatrixPlotter(2, 3)
    for i in range(6):
        p.select(i)
        p.set_property(f"Camera {i}")
        p.plot_points(np.random.default_rng(i).normal(size=(20, 2)), label="x")
    p.plt.gcf().canvas.draw()
    p.close()


def test_show_functions_with_jax_arrays(monkeypatch):
    """show_* accept JAX arrays and run headlessly (show patched out)."""
    import matplotlib.pyplot as plt

    monkeypatch.setattr(plt, "show", lambda: None)
    from mvrecon_tpu.geometry.scenes import make_synthetic_scene
    from mvrecon_tpu.viz.plotting import show_2d_projection_data, show_3d_scene_data

    scene = make_synthetic_scene(jax.random.key(0), n_images=7)
    show_3d_scene_data(scene.X, scene.R, scene.t)
    x_list = [scene.x[i] for i in range(7)]
    show_2d_projection_data(x_list, x_list, n_col=3)
