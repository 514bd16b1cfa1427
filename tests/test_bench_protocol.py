"""bench.py entry protocol (VERDICT r4 #1): the driver-run benchmark must
be incapable of producing a number-free artifact. Rounds 3 (rc=1) and 4
(rc=124, mid-run device wedge at the first host fetch) both shipped with
zero driver-verified perf; this pins the re-architected protocol — the
parent never touches the device, every workload runs in a killable
subprocess, and the headline has a CPU fallback chain — against exactly
those failure modes.

All runs here force the children onto the CPU backend
(MVRECON_BENCH_FORCE_PLATFORM=cpu) with tiny shapes
(MVRECON_BENCH_SMALL=1); ASSUME_DEVICE routes the *device* code path
onto CPU so the wedge test exercises the real fallback chain. No test
touches the TPU tunnel.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

BASE_ENV = {
    "MVRECON_BENCH_SMALL": "1",
    "MVRECON_BENCH_FORCE_PLATFORM": "cpu",
    "MVRECON_BENCH_ASSUME_DEVICE": "1",
}


def run_bench(extra_env, timeout=420):
    env = dict(os.environ)
    env.update(BASE_ENV)
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert len(lines) == 1, f"exactly one JSON line expected: {lines}"
    return json.loads(lines[0])


def assert_finite_headline(out):
    assert out["metric"] != "error"
    assert np.isfinite(out["value"]) and out["value"] > 0
    assert out["unit"] == "s"


@pytest.mark.slow
def test_clean_run_emits_finite_headline():
    out = run_bench({"MVRECON_BENCH_FAST": "1"})
    assert_finite_headline(out)
    assert "CPU_FALLBACK" not in out["metric"]  # the "device" path ran
    assert out["backend"]["ok"]


@pytest.mark.slow
def test_midrun_wedge_falls_back_to_cpu_headline():
    """The exact round-4 failure: probe ok, then the headline wedges on
    its first host fetch. The child must be killed and the emitted line
    must still carry a finite measured value."""
    out = run_bench({
        "MVRECON_BENCH_FAST": "1",
        "MVRECON_BENCH_INJECT_WEDGE": "headline",
        "MVRECON_BENCH_HEADLINE_TIMEOUT": "15",
    })
    assert_finite_headline(out)
    assert "CPU_FALLBACK" in out["metric"]
    assert "timeout" in out["headline_device_error"]


@pytest.mark.slow
def test_wedged_extra_field_degrades_not_kills():
    """A wedge inside an extra workload must cost only that field; the
    headline and the line survive."""
    out = run_bench({
        "MVRECON_BENCH_ONLY": "northstar,covariance",
        "MVRECON_BENCH_INJECT_WEDGE": "northstar_covariance",
        "MVRECON_BENCH_FIELD_TIMEOUT": "12",
    })
    assert_finite_headline(out)
    assert "timeout" in out["northstar"]["error"]
    assert "timeout" in out["covariance"]["error"]


@pytest.mark.slow
def test_crashed_resumable_field_resumes_mid_solve():
    """A tunneled-worker kill mid-way through the segmented sparse solve
    (the r5 bal_large_sparse failure: a 45.7 s segment stretched past the
    axon 60 s execution cap) must cost one child re-exec, not the field:
    the retried child finds the checkpoint + partial stats at the same
    --out path and CONTINUES the solve, and the final record carries the
    dead attempt's segment walls too."""
    out = run_bench({
        "MVRECON_BENCH_ONLY": "bal_large_sparse",
        "MVRECON_BENCH_INJECT_CRASH_AFTER_SEG": "2",
    })
    assert_finite_headline(out)
    rec = out["bal_large_sparse"]
    assert "error" not in rec, rec
    assert rec["resumed_from_crash"] is True
    assert rec["n_iter"] == len(rec["seg_walls_s"]) >= 3
    assert "aligned_rmse_vs_gt" in rec


@pytest.mark.slow
def test_wall_budget_skips_tail_fields():
    """When the global budget is exhausted the tail fields are recorded
    as skipped — the line still lands with the headline."""
    out = run_bench({
        "MVRECON_BENCH_ONLY": "northstar,covariance",
        "MVRECON_BENCH_WALL": "20",
    })
    assert_finite_headline(out)
    assert out["northstar"]["skipped"] == "wall budget exhausted"
