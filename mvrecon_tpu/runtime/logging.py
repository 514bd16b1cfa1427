"""Structured convergence logging.

The reference's observability is per-iteration ``print`` plus an in-memory
list of dicts consumed by the animation (SURVEY.md §5). Here the device
side produces *stacked* logs (one slot per LM iteration, written with
``.at[count].set`` inside the loop — see ``lm_optimize(record_log=True)``);
this module turns them into host-side records and renders convergence
summaries.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np


def device_log_to_records(log: dict, n_iter: int) -> list[dict[str, Any]]:
    """Stacked device log (dict of (max_iter+1, ...) arrays) -> list of
    per-iteration dicts, trimmed to the executed iterations — the exact
    structure the reference's ``BundleAdjuster.get_log`` returns
    (``bundle_adjustment.py:89-98``) and ``viz.animate`` consumes."""
    n = int(n_iter) + 1
    return [
        {
            "points": np.asarray(log["points"][i]),
            "basis": np.asarray(log["basis"][i]),
            "pos": np.asarray(log["pos"][i]),
            "reprojection_error": float(log["reprojection_error"][i]),
        }
        for i in range(n)
    ]


def scalar_log_to_records(log: dict, n_iter: int) -> list[dict[str, Any]]:
    """Scalar (chunked-core) device log -> per-iteration records. Only
    ``reprojection_error`` is available: the chunked core's O(max_iter)
    log keeps no state trajectory (see
    ``lm_optimize_chunked(record_log=True)``)."""
    n = int(n_iter) + 1
    errs = np.asarray(log["reprojection_error"])
    return [{"reprojection_error": float(errs[i])} for i in range(n)]


def convergence_curve(log: dict, n_iter: int) -> np.ndarray:
    """(n_iter+1,) reprojection-error trajectory."""
    return np.asarray(log["reprojection_error"])[: int(n_iter) + 1]


def format_convergence(log: dict, n_iter: int) -> str:
    """Human-readable per-iteration deltas (the reference's printout,
    ``bundle_adjustment.py:188``, reproduced after the fact)."""
    errs = convergence_curve(log, n_iter)
    lines = [
        f"Iteration {i}: reprojection_error_delta = {abs(errs[i] - errs[i - 1]):.3e}"
        for i in range(1, len(errs))
    ]
    return "\n".join(lines)


def dump_jsonl(path: str, records: list[dict[str, Any]]) -> None:
    """Append convergence records as JSON lines (arrays summarized)."""
    with open(path, "a") as f:
        for i, rec in enumerate(records):
            f.write(
                json.dumps(
                    {
                        "iter": i,
                        "reprojection_error": rec["reprojection_error"],
                        "n_points": int(np.asarray(rec["points"]).shape[0]),
                    }
                )
                + "\n"
            )
