"""Reference-compatible API layer: same module names, signatures, and
behavior as the reference's lib/ (SURVEY.md §7: keep the public API)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mvrecon_tpu import (
    affine_camera_calibration,
    bundle_adjustment,
    camera,
    factorization,
    minimum_spanning_tree,
    perspective_camera_calibration,
    utils,
)

from conftest import make_ref_scene


def test_camera_reference_selftest_cases(ref):
    """The reference's own inline camera self-test (lib/camera.py:101-117)."""
    X = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)

    cam1 = camera.Camera.create((0, 0, -1), (0, 0, 1), f=1)
    np.testing.assert_array_almost_equal(
        np.asarray(cam1.project_points(X)), np.array([[0, 0], [1, 0], [0, 1], [0, 0]])
    )

    cam2 = camera.Camera.create((0, -1, 0), (0, 1, 0), f=1)
    np.testing.assert_array_almost_equal(
        np.asarray(cam2.project_points(X)), np.array([[0, 0], [1, 0], [0, 0], [0, -1]])
    )


def test_camera_matrix_matches_reference(ref):
    rc = ref.camera.Camera.create((1.0, 2.0, -3.0), (0.1, -0.2, 0.3), f=1.2, f0=0.9)
    ours = camera.Camera.create((1.0, 2.0, -3.0), (0.1, -0.2, 0.3), f=1.2, f0=0.9)
    np.testing.assert_allclose(
        np.asarray(ours.get_camera_matrix()), rc.get_camera_matrix(), atol=1e-12
    )
    X = np.random.default_rng(0).normal(size=(20, 3))
    np.testing.assert_allclose(
        np.asarray(ours.project_points(X)), rc.project_points(X), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ours.project_points(X, method="orthographic")),
        rc.project_points(X, method="orthographic"),
        atol=1e-12,
    )


def test_utils_set_points_matches_reference(ref):
    np.testing.assert_allclose(np.asarray(utils.set_points()), ref.utils.set_points(), atol=1e-12)


def test_utils_rotation_matches_reference(ref):
    omega = np.array([0.3, -1.2, 0.5])
    np.testing.assert_allclose(
        np.asarray(utils.get_rotation_matrix(omega)),
        ref.utils.get_rotation_matrix(omega),
        atol=1e-12,
    )


def test_factorization_compat(ref):
    rng = np.random.default_rng(1)
    w = rng.normal(size=(24, 100))
    m, s = factorization.factorization_method(w, n_rank=3)
    m_ref, s_ref = ref.factorization.factorization_method(w, n_rank=3)
    np.testing.assert_allclose(np.asarray(m @ s), m_ref @ s_ref, atol=1e-10)


def test_affine_compat_accepts_list(ref):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
    s, r = affine_camera_calibration.paraperspective_self_calibration(
        [x.copy() for x in x_list], np.ones(12)
    )
    s_ref, r_ref = ref.affine.paraperspective_self_calibration(
        [x.copy() for x in x_list], np.ones(12)
    )
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-6)


def test_mst_matches_reference(ref):
    """Note: the reference's UnionFind indexes NumPy arrays with the raw
    edge values, so it only works with *integer* weights (float weights
    make hstack promote the ids to float -> IndexError on NumPy 2; its own
    __main__ demo uses ints). Parity is tested on its supported domain;
    float weights are covered by test_mst_native_kernel_used."""
    edges = np.array(
        [(0, 1), (0, 2), (0, 3), (1, 3), (2, 4), (3, 4), (3, 5), (4, 6), (5, 6)]
    )
    weights = np.array([2, 3, 5, 7, 2, 15, 1, 11, 8])

    ours = minimum_spanning_tree.MinimumSpanningTree(edges, weights.astype(float))
    theirs = ref.mst.MinimumSpanningTree(edges.copy(), weights.copy())

    res_ours = ours.solve()
    res_ref = theirs.solve()
    np.testing.assert_allclose(np.asarray(res_ours), res_ref)

    adj_o, dist_o = ours.to_adjacency_matrix(res_ours)
    adj_r, dist_r = theirs.to_adjacency_matrix(res_ref.astype(np.int64))
    np.testing.assert_array_equal(adj_o, adj_r)
    np.testing.assert_allclose(dist_o, dist_r)


def test_mst_native_kernel_used():
    from mvrecon_tpu.runtime.native import mst_native

    # the C++ kernel should be built in this environment
    assert mst_native.available()
    rng = np.random.default_rng(0)
    n = 200
    edges = rng.integers(0, n, size=(2000, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    weights = rng.uniform(size=len(edges))
    mst = minimum_spanning_tree.MinimumSpanningTree(edges, weights)
    res = mst.solve()
    # spanning tree over the connected component: n-1 edges if connected
    assert len(res) <= n - 1
    # acyclic by construction; validate with union-find replay
    uf = minimum_spanning_tree.UnionFind(n)
    for i, j, _ in res:
        assert uf.union(int(i), int(j))


def test_bundle_adjuster_compat_class(ref, quiet):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=12)
    with quiet():
        X_, R_ = ref.affine.paraperspective_self_calibration(
            [x.copy() for x in x_list], np.ones(12)
        )
    t_ = -3 * R_[:, :, 2]
    K_ = np.broadcast_to(np.eye(3), R_.shape).copy()
    x = np.stack(x_list).transpose(1, 0, 2)

    ba = bundle_adjustment.BundleAdjuster(x, X_, K_, R_, t_, axis="x-up_z-forward")
    X_out, K_out, R_out, t_out = ba.optimize(2.0, 1e-8, max_iter=5, is_debug=True)
    log = ba.get_log()
    assert len(log) >= 2
    assert {"points", "basis", "pos", "reprojection_error"} <= set(log[0].keys())
    errs = [entry["reprojection_error"] for entry in log]
    assert errs[-1] <= errs[0]


def test_perspective_compat(ref, quiet):
    _, _, _, _, x_list = make_ref_scene(ref, n_images=10)
    X, R, t, K = perspective_camera_calibration.perspective_self_calibration(
        [x.copy() for x in x_list], 1.0, tol=1e-2, method="dual"
    )
    assert np.asarray(X).shape == (200, 3)
    assert np.isfinite(np.asarray(X)).all()


def test_reference_public_api_surface_complete():
    """Every public symbol (top-level function/class + public methods) of
    every module in the reference's lib/ must exist in the same-named
    mvrecon_tpu compat module — a user of the reference can switch
    imports without touching call sites (SURVEY.md §7 API contract)."""
    import ast
    import importlib
    import os

    ref_dir = "/root/reference/lib"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not available")

    checked = 0
    for fn in sorted(os.listdir(ref_dir)):
        if not fn.endswith(".py"):
            continue
        tree = ast.parse(open(os.path.join(ref_dir, fn)).read())
        mod = importlib.import_module(f"mvrecon_tpu.{fn[:-3]}")
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and not node.name.startswith("_"):
                obj = getattr(mod, node.name, None)
                assert obj is not None, f"{fn}: missing {node.name}"
                checked += 1
                if isinstance(node, ast.ClassDef):
                    for sub in node.body:
                        if isinstance(sub, ast.FunctionDef) and not sub.name.startswith("_"):
                            assert hasattr(obj, sub.name), (
                                f"{fn}: missing {node.name}.{sub.name}"
                            )
                            checked += 1
    assert checked >= 40  # the reference exposes 44 public symbols today


def test_bundle_adjuster_debug_log_at_chunked_scale(monkeypatch):
    """is_debug above the dense-core budget dispatches to the chunked
    core with a scalar error-curve log instead of silently OOM-ing in
    the dense core (VERDICT r3 weak #6). The threshold is lowered so a
    small problem exercises the chunked branch."""
    import jax
    import jax.numpy as jnp

    from mvrecon_tpu import bundle_adjustment
    from mvrecon_tpu.geometry.scenes import make_synthetic_scene

    sc = make_synthetic_scene(jax.random.key(0), n_images=8,
                              dtype=jnp.float64)
    k1, k2 = jax.random.split(jax.random.key(3))
    X0 = sc.X + 0.02 * jax.random.normal(k1, sc.X.shape, dtype=jnp.float64)
    t0 = sc.t + 0.02 * jax.random.normal(k2, sc.t.shape, dtype=jnp.float64)
    x = sc.x.transpose(1, 0, 2)

    def run():
        ba = bundle_adjustment.BundleAdjuster(
            x, X0, sc.K, sc.R, t0, axis="x-up_z-forward"
        )
        ba.optimize(2.0, 0.0, max_iter=4, is_debug=True)
        return ba

    dense = run()
    monkeypatch.setattr(
        bundle_adjustment.BundleAdjuster, "CHUNKED_THRESHOLD_BYTES", 1
    )
    chunked = run()
    dlog, clog = dense.get_log(), chunked.get_log()
    assert len(clog) == len(dlog)
    assert "points" not in clog[0]  # scalar-only at chunked scale
    for a, b in zip(dlog, clog):
        assert b["reprojection_error"] == pytest.approx(
            a["reprojection_error"], rel=1e-8
        )
