"""Sparse observation-list BA core (models/bundle_adjustment_sparse.py):
parity against the dense-mask core (the reference-semantics oracle chain:
dense core == reference, pinned in test_bundle_adjustment.py), protocol
contracts, and O(n_obs)-layout invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvrecon_tpu.config import LMConfig
from mvrecon_tpu.geometry.scenes import make_synthetic_scene
from mvrecon_tpu.models.bundle_adjustment import bundle_adjust
from mvrecon_tpu.models.bundle_adjustment_sparse import (
    SparseObs,
    bundle_adjust_sparse,
    dense_to_sparse_obs,
    make_sparse_obs,
)

F64 = jnp.float64


def _problem(n_images=8, n_slices=10, vis_frac=0.6, seed=0, noise=0.02):
    key = jax.random.key(seed)
    scene = make_synthetic_scene(
        key, n_images=n_images, n_slices=n_slices, n_angles=20, dtype=F64
    )
    k1, k2 = jax.random.split(key)
    X0 = scene.X + noise * jax.random.normal(k1, scene.X.shape, dtype=F64)
    t0 = scene.t + noise * jax.random.normal(k2, scene.t.shape, dtype=F64)
    x = scene.x.transpose(1, 0, 2)  # (P, F, 2)
    rng = np.random.default_rng(seed)
    vis = (rng.random(x.shape[:2]) < vis_frac).astype(np.float64)
    return x, vis, X0, scene.K, scene.R, t0


CFG = LMConfig(
    scale_factor=4.0, delta_tol=0.0, max_iter=8, accept_divisor=1.0,
    init_damping=3e-3, damping="nielsen",
)


def _run_both(x, vis, X0, K, R, t0, config=CFG, distortion=None,
              cg_tol=1e-12, cg_max_iter=500):
    res_d = bundle_adjust(
        x, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=config,
        visibility=jnp.asarray(vis), distortion=distortion,
    )
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    res_s = bundle_adjust_sparse(
        obs, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=config,
        cg_tol=cg_tol, cg_max_iter=cg_max_iter, distortion=distortion,
    )
    return res_d, res_s


def test_parity_vs_dense_masked():
    res_d, res_s = _run_both(*_problem())
    assert float(res_s.error) == pytest.approx(float(res_d.error), rel=1e-10)
    np.testing.assert_allclose(res_s.X, res_d.X, atol=1e-9)
    np.testing.assert_allclose(res_s.R, res_d.R, atol=1e-9)
    np.testing.assert_allclose(res_s.t, res_d.t, atol=1e-9)
    np.testing.assert_allclose(res_s.K, res_d.K, atol=1e-9)
    assert int(res_s.n_iter) == int(res_d.n_iter)
    assert int(res_s.log["cg_iters_total"]) > 0


def test_parity_reference_damping_protocol():
    cfg = LMConfig(scale_factor=2.0, delta_tol=1e-10, max_iter=10)
    res_d, res_s = _run_both(*_problem(), config=cfg)
    assert float(res_s.error) == pytest.approx(float(res_d.error), rel=1e-9)
    np.testing.assert_allclose(res_s.X, res_d.X, atol=1e-8)


@pytest.mark.parametrize("robust", ["huber", "cauchy"])
def test_parity_robust_losses(robust):
    x, vis, X0, K, R, t0 = _problem()
    # inject gross outliers into visible entries
    x = np.asarray(x).copy()
    rng = np.random.default_rng(3)
    pi, ci = np.nonzero(vis > 0)
    sel = rng.choice(len(pi), size=len(pi) // 50, replace=False)
    x[pi[sel], ci[sel]] += 0.3
    cfg = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=6, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen", robust=robust,
        huber_delta=0.02,
    )
    res_d, res_s = _run_both(jnp.asarray(x), vis, X0, K, R, t0, config=cfg)
    assert float(res_s.error) == pytest.approx(float(res_d.error), rel=1e-9)
    np.testing.assert_allclose(res_s.X, res_d.X, atol=1e-8)


def test_parity_radial_distortion_refit():
    x, vis, X0, K, R, t0 = _problem()
    cfg = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=4, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen", distortion_rounds=2,
    )
    res_d, res_s = _run_both(x, vis, X0, K, R, t0, config=cfg)
    assert float(res_s.error) == pytest.approx(float(res_d.error), rel=1e-8)
    np.testing.assert_allclose(res_s.distortion, res_d.distortion, atol=1e-8)
    np.testing.assert_allclose(res_s.X, res_d.X, atol=1e-7)


@pytest.mark.parametrize("model,ncols", [("fisheye", 4), ("opencv", 4),
                                          ("fov", 1)])
def test_parity_fixed_distortion_families(model, ncols):
    x, vis, X0, K, R, t0 = _problem(n_images=6, n_slices=8)
    nf = K.shape[0]
    rng = np.random.default_rng(7)
    if model == "fov":
        dist = jnp.asarray(np.full((nf, 1), 0.4))
    else:
        dist = jnp.asarray(0.01 * rng.standard_normal((nf, ncols)))
    cfg = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=4, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen", distortion_model=model,
    )
    res_d, res_s = _run_both(x, vis, X0, K, R, t0, config=cfg,
                             distortion=dist)
    assert float(res_s.error) == pytest.approx(float(res_d.error), rel=1e-8)
    np.testing.assert_allclose(res_s.X, res_d.X, atol=1e-7)


def test_zero_weight_padding_is_invisible():
    x, vis, X0, K, R, t0 = _problem()
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    n = obs.point_idx.shape[0]
    npts = X0.shape[0]
    padded = SparseObs(
        point_idx=jnp.concatenate(
            [obs.point_idx, jnp.full((17,), npts - 1, jnp.int32)]
        ),
        cam_idx=jnp.concatenate(
            [obs.cam_idx, jnp.full((17,), K.shape[0] - 1, jnp.int32)]
        ),
        xy=jnp.concatenate([obs.xy, jnp.full((2, 17), 1e6, F64)], axis=1),
        weights=jnp.concatenate([obs.weights, jnp.zeros((17,), F64)]),
    )
    r1 = bundle_adjust_sparse(obs, X0, K, R, t0, f0=1.0,
                              axis="x-up_z-forward", config=CFG)
    r2 = bundle_adjust_sparse(padded, X0, K, R, t0, f0=1.0,
                              axis="x-up_z-forward", config=CFG)
    assert float(r1.error) == pytest.approx(float(r2.error), rel=1e-12)
    np.testing.assert_allclose(r1.X, r2.X, atol=1e-10)
    assert padded.point_idx.shape[0] == n + 17


def test_make_sparse_obs_sorts_stably():
    pi = np.array([3, 0, 2, 0, 3])
    ci = np.array([1, 2, 0, 1, 0])
    xy = np.arange(10.0).reshape(5, 2)
    obs = make_sparse_obs(pi, ci, xy)
    assert list(np.asarray(obs.point_idx)) == [0, 0, 2, 3, 3]
    # stable: point 0 keeps (2, then 1) camera order of appearance
    assert list(np.asarray(obs.cam_idx)) == [2, 1, 0, 1, 0]
    np.testing.assert_allclose(
        np.asarray(obs.xy)[:, 0], xy[1]  # first sorted obs was input row 1
    )


def test_unseen_point_is_fixed():
    x, vis, X0, K, R, t0 = _problem()
    vis = vis.copy()
    vis[5, :] = 0.0  # point 5 observed nowhere
    res_d, res_s = _run_both(x, vis, X0, K, R, t0)
    # the unseen point moves only by the gauge normalization round-trip
    np.testing.assert_allclose(res_s.X[5], res_d.X[5], atol=1e-9)
    assert float(res_s.error) == pytest.approx(float(res_d.error), rel=1e-9)


def test_segmented_resume_matches_continuous():
    x, vis, X0, K, R, t0 = _problem()
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    cfg_full = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=6, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen",
    )
    full = bundle_adjust_sparse(obs, X0, K, R, t0, f0=1.0,
                                axis="x-up_z-forward", config=cfg_full)
    import dataclasses

    cfg_a = dataclasses.replace(cfg_full, max_iter=3)
    a = bundle_adjust_sparse(obs, X0, K, R, t0, f0=1.0,
                             axis="x-up_z-forward", config=cfg_a)
    b = bundle_adjust_sparse(
        obs, a.X, a.K, a.R, a.t, f0=1.0, axis="x-up_z-forward",
        config=cfg_a, init_c=a.log["c"], init_nu=a.log["nu"],
    )
    assert float(b.error) == pytest.approx(float(full.error), rel=1e-8)
    np.testing.assert_allclose(b.X, full.X, atol=1e-7)


def test_loose_cg_still_converges():
    """The production configuration (cg_tol 1e-2, few CG iters) must
    still reach the same optimum — LM only needs descent directions."""
    x, vis, X0, K, R, t0 = _problem()
    cfg = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=20, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen",
    )
    res_d = bundle_adjust(
        x, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=cfg,
        visibility=jnp.asarray(vis),
    )
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    res_s = bundle_adjust_sparse(
        obs, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=cfg,
        cg_tol=1e-2, cg_max_iter=50,
    )
    assert float(res_s.error) <= 1.02 * float(res_d.error)


def test_bf16_factors_converge():
    """factor_dtype="bfloat16" (the capacity lever: narrow per-
    observation Jacobian factor rows) perturbs each LM step at the
    factor-rounding level but acceptance is judged on exact residuals,
    so the run must still reach the dense core's optimum."""
    x, vis, X0, K, R, t0 = _problem()
    cfg = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=20, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen",
    )
    res_d = bundle_adjust(
        x, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=cfg,
        visibility=jnp.asarray(vis),
    )
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    res_s = bundle_adjust_sparse(
        obs, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=cfg,
        cg_tol=1e-2, cg_max_iter=50, factor_dtype="bfloat16",
    )
    assert float(res_s.error) <= 1.05 * float(res_d.error)
    # the returned state is full precision
    assert res_s.X.dtype == res_d.X.dtype


def test_bf16_factors_with_distortion_refit():
    """The narrow-factor cast happens inside the distortion-chain scan
    (so full-width rows never materialize at full N) — the refit +
    chained-factor path must converge too."""
    x, vis, X0, K, R, t0 = _problem()
    cfg = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=6, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen", distortion_rounds=2,
    )
    res_d = bundle_adjust(
        x, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=cfg,
        visibility=jnp.asarray(vis),
    )
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    res_s = bundle_adjust_sparse(
        obs, X0, K, R, t0, f0=1.0, axis="x-up_z-forward", config=cfg,
        cg_tol=1e-2, cg_max_iter=50, factor_dtype="bfloat16",
    )
    # per-camera refit-from-zero k values are large and ill-conditioned
    # on this small scene (even the f32 sparse run at cg_tol 1e-2 lands
    # ~2% from the dense core's), so the pin is the converged error
    assert float(res_s.error) <= 1.05 * float(res_d.error)
    assert np.isfinite(np.asarray(res_s.distortion)).all()


def test_matvec_chunk_parity():
    """matvec_chunk (chunk-scanned CG matvec + back-substitution — the
    bounded-transient capacity path) must reproduce the unchunked run:
    same math, only the segment-accumulation grouping differs."""
    x, vis, X0, K, R, t0 = _problem()
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    kw = dict(f0=1.0, axis="x-up_z-forward", config=CFG, cg_tol=1e-12,
              cg_max_iter=500)
    res_a = bundle_adjust_sparse(obs, X0, K, R, t0, **kw)
    res_b = bundle_adjust_sparse(obs, X0, K, R, t0, matvec_chunk=257, **kw)
    assert float(res_b.error) == pytest.approx(float(res_a.error), rel=1e-10)
    np.testing.assert_allclose(res_b.X, res_a.X, atol=1e-9)
    np.testing.assert_allclose(res_b.R, res_a.R, atol=1e-9)
    assert int(res_b.n_iter) == int(res_a.n_iter)


def test_sharded_sparse_matches_single_device():
    """Point-partitioned sparse BA over a 4-device mesh == the
    single-device sparse core (which is pinned against the dense core),
    including the psum-reduced distortion refit."""
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba_sparse import (
        partition_sparse_obs,
        sharded_bundle_adjust_sparse,
    )

    x, vis, X0, K, R, t0 = _problem()
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    cfg = LMConfig(
        scale_factor=4.0, delta_tol=0.0, max_iter=6, accept_divisor=1.0,
        init_damping=3e-3, damping="nielsen", distortion_rounds=1,
    )
    r1 = bundle_adjust_sparse(obs, X0, K, R, t0, f0=1.0,
                              axis="x-up_z-forward", config=cfg,
                              cg_tol=1e-10, cg_max_iter=400)
    mesh = make_mesh({"points": 4})
    r4 = sharded_bundle_adjust_sparse(
        mesh, np.asarray(obs.point_idx), np.asarray(obs.cam_idx),
        np.asarray(obs.xy), X0, K, R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, cg_tol=1e-10, cg_max_iter=400,
    )
    assert float(r4.error) == pytest.approx(float(r1.error), rel=1e-8)
    np.testing.assert_allclose(r4.X, r1.X, atol=1e-7)
    np.testing.assert_allclose(r4.distortion, r1.distortion, atol=1e-10)

    # the partition splits at point boundaries: no point straddles shards
    obs_flat, pps = partition_sparse_obs(
        np.asarray(obs.point_idx), np.asarray(obs.cam_idx),
        np.asarray(obs.xy), X0.shape[0], 4,
    )
    n_max = obs_flat.point_idx.shape[0] // 4
    pi = np.asarray(obs_flat.point_idx).reshape(4, n_max)
    w = np.asarray(obs_flat.weights).reshape(4, n_max)
    for s in range(4):
        real = pi[s][w[s] > 0]
        assert real.min() >= 0 and real.max() < pps


def test_cli_bal_sparse(tmp_path, capsys):
    """`mvrecon_tpu bal problem.txt --sparse` runs the O(n_obs) pipeline
    end-to-end: BAL triples in, PLY + BAL out, dense arrays never built;
    the refined geometry agrees with the dense CLI path."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import load_bal, save_bal

    x, vis, X0, K, R, t0 = _problem(n_images=6, n_slices=8, vis_frac=0.5)
    path = str(tmp_path / "problem.txt")
    save_bal(
        path, np.asarray(x).transpose(1, 0, 2), vis, np.asarray(X0),
        np.asarray(R), np.asarray(t0), np.asarray(K[:, 0, 0]),
    )
    ply = str(tmp_path / "cloud.ply")
    out_bal = str(tmp_path / "refined.txt")
    argv = [
        "bal", path, "--float64", "--max-iter", "8", "--delta-tol", "0",
        "--damping", "nielsen", "--output-ply", ply,
        "--output-bal", out_bal,
    ]
    main(argv + ["--sparse"])
    rec_s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(argv)
    rec_d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec_s["sparse"] and rec_s["observations"] == int(vis.sum())
    assert rec_s["cg_iterations"] > 0
    assert rec_s["reprojection_error"] == pytest.approx(
        rec_d["reprojection_error"], rel=1e-2
    )
    assert "ply" in open(ply).read(16)
    refined = load_bal(out_bal)
    assert refined["X"].shape == (X0.shape[0], 3)
    assert int(refined["visibility"].sum()) == int(vis.sum())


def test_sparse_record_log_curve_matches_dense():
    """record_log on the sparse core yields the O(max_iter) scalar error
    curve (the chunked core's scale-aware debug-logging contract), equal
    to the dense core's per-iteration errors at tight CG tolerance."""
    import dataclasses

    x, vis, X0, K, R, t0 = _problem()
    cfg = dataclasses.replace(CFG, record_log=True)
    res_d, res_s = _run_both(x, vis, X0, K, R, t0, config=cfg)
    assert int(res_s.n_iter) == int(res_d.n_iter)
    n = int(res_s.n_iter) + 1
    curve_s = np.asarray(res_s.log["reprojection_error"])[:n]
    curve_d = np.asarray(res_d.log["reprojection_error"])[:n]
    np.testing.assert_allclose(curve_s, curve_d, rtol=1e-9)
    assert curve_s[0] > curve_s[-1]
    assert float(curve_s[-1]) == pytest.approx(float(res_s.error))


def test_sharded_sparse_record_log_curve():
    """The point-partitioned sparse core emits the same replicated error
    curve as the single-device sparse core."""
    import dataclasses

    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba_sparse import (
        sharded_bundle_adjust_sparse,
    )

    x, vis, X0, K, R, t0 = _problem()
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    cfg = dataclasses.replace(CFG, record_log=True, max_iter=5)
    r1 = bundle_adjust_sparse(obs, X0, K, R, t0, f0=1.0,
                              axis="x-up_z-forward", config=cfg,
                              cg_tol=1e-10, cg_max_iter=400)
    mesh = make_mesh({"points": 4})
    r4 = sharded_bundle_adjust_sparse(
        mesh, np.asarray(obs.point_idx), np.asarray(obs.cam_idx),
        np.asarray(obs.xy), X0, K, R, t0, f0=1.0, axis="x-up_z-forward",
        config=cfg, cg_tol=1e-10, cg_max_iter=400,
    )
    n = int(r1.n_iter) + 1
    np.testing.assert_allclose(
        np.asarray(r4.log["reprojection_error"])[:n],
        np.asarray(r1.log["reprojection_error"])[:n], rtol=1e-8,
    )


def test_cli_bal_sparse_triangulate_init(tmp_path, capsys):
    """`bal --sparse --triangulate-init` ignores the file's points and
    initializes by observation-list DLT through the file's cameras —
    the LM refinement must still reach the file-init run's error."""
    import json

    from mvrecon_tpu.cli import main
    from mvrecon_tpu.runtime.io import save_bal

    x, vis, X0, K, R, t0 = _problem(n_images=6, n_slices=8, vis_frac=0.5)
    path = str(tmp_path / "problem.txt")
    # poison the file's points: --triangulate-init must not read them
    save_bal(
        path, np.asarray(x).transpose(1, 0, 2), vis,
        np.full_like(np.asarray(X0), 1e6),
        np.asarray(R), np.asarray(t0), np.asarray(K[:, 0, 0]),
    )
    argv = [
        "bal", path, "--sparse", "--float64", "--max-iter", "10",
        "--delta-tol", "0", "--damping", "nielsen",
    ]
    main(argv + ["--triangulate-init"])
    rec_t = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec_t["triangulate_init"]
    # DLT init + 10 LM iters lands at the visibility noise floor
    noise_floor = 2 * int(vis.sum()) * 0.005**2
    assert rec_t["reprojection_error"] < 3.0 * noise_floor


def test_save_bal_sparse_matches_dense_writer(tmp_path):
    from mvrecon_tpu.runtime.io import save_bal, save_bal_sparse

    x, vis, X0, K, R, t0 = _problem(n_images=5, n_slices=6, vis_frac=0.4)
    xd = np.asarray(x).transpose(1, 0, 2)
    p1 = str(tmp_path / "dense.txt")
    p2 = str(tmp_path / "sparse.txt")
    save_bal(p1, xd, vis, np.asarray(X0), np.asarray(R), np.asarray(t0),
             np.asarray(K[:, 0, 0]))
    pi, ci = np.nonzero(vis > 0)
    save_bal_sparse(p2, pi, ci, xd[ci, pi], X0.shape[0], np.asarray(X0),
                    np.asarray(R), np.asarray(t0), np.asarray(K[:, 0, 0]))
    assert open(p1).read() == open(p2).read()


def test_factor_mode_recompute_parity():
    """factor_mode="recompute" (rematerialized factor rows — the
    >100M-observation capacity mode) must reproduce the stored-factor
    run: same operator evaluated chunk-by-chunk, so results agree to
    CG tolerance."""
    x, vis, X0, K, R, t0 = _problem()
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    kw = dict(f0=1.0, axis="x-up_z-forward", config=CFG, cg_tol=1e-12,
              cg_max_iter=500)
    res_a = bundle_adjust_sparse(obs, X0, K, R, t0, **kw)
    res_b = bundle_adjust_sparse(obs, X0, K, R, t0,
                                 factor_mode="recompute", obs_chunk=311,
                                 **kw)
    assert float(res_b.error) == pytest.approx(float(res_a.error), rel=1e-10)
    np.testing.assert_allclose(res_b.X, res_a.X, atol=1e-8)
    np.testing.assert_allclose(res_b.R, res_a.R, atol=1e-9)
    assert int(res_b.n_iter) == int(res_a.n_iter)


def test_factor_mode_recompute_robust_distortion():
    """Rematerialization composes with the IRLS robust weights and the
    distortion chain (both re-evaluated inside every chunk pass)."""
    import dataclasses

    x, vis, X0, K, R, t0 = _problem()
    dist = jnp.asarray(
        np.tile(np.array([[-0.05, 0.01]]), (K.shape[0], 1)), F64
    )
    cfg = dataclasses.replace(CFG, robust="huber", huber_delta=0.05)
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    kw = dict(f0=1.0, axis="x-up_z-forward", config=cfg, cg_tol=1e-12,
              cg_max_iter=500, distortion=dist)
    res_a = bundle_adjust_sparse(obs, X0, K, R, t0, **kw)
    res_b = bundle_adjust_sparse(obs, X0, K, R, t0,
                                 factor_mode="recompute", obs_chunk=311,
                                 **kw)
    assert float(res_b.error) == pytest.approx(float(res_a.error), rel=1e-10)
    np.testing.assert_allclose(res_b.X, res_a.X, atol=1e-8)
    assert int(res_b.n_iter) == int(res_a.n_iter)


def test_sharded_recompute_matches_single_device():
    """Rematerialization under the points-sharded core: the remat
    passes psum the camera-side reductions exactly like the stored
    path, so the 4-device run must match the single-device one."""
    from mvrecon_tpu.parallel.mesh import make_mesh
    from mvrecon_tpu.parallel.sharded_ba_sparse import (
        sharded_bundle_adjust_sparse,
    )

    x, vis, X0, K, R, t0 = _problem()
    pi, ci = np.nonzero(np.asarray(vis) > 0)
    xy = np.asarray(x)[pi, ci]
    kw = dict(f0=1.0, axis="x-up_z-forward", config=CFG, cg_tol=1e-12,
              cg_max_iter=500)
    obs = dense_to_sparse_obs(np.asarray(x), vis)
    res_1 = bundle_adjust_sparse(obs, X0, K, R, t0,
                                 factor_mode="recompute", **kw)
    mesh = make_mesh({"points": 4})
    res_4 = sharded_bundle_adjust_sparse(
        mesh, pi, ci, xy, X0, K, R, t0, factor_mode="recompute",
        obs_chunk=173, **kw,
    )
    assert float(res_4.error) == pytest.approx(float(res_1.error), rel=1e-10)
    np.testing.assert_allclose(res_4.X, res_1.X, atol=1e-8)
    assert int(res_4.n_iter) == int(res_1.n_iter)
