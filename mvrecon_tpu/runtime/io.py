"""Observation I/O: load/save tracked-feature data for reconstruction.

The reference only consumes synthetic in-process data; a framework needs a
data path for real tracks. Format: a single ``.npz`` with

- ``x``: (F, P, 2) float — tracked image points per view
- ``visibility``: optional (P, F) bool — which points are seen where
- ``f``: optional (F,) float — focal lengths (affine paraperspective)
- ``f0``: optional scalar — scale constant
- ``X``/``K``/``R``/``t``: optional ground truth / initialization arrays
"""

from __future__ import annotations

from typing import Any

import numpy as np


def save_observations(path: str, x, visibility=None, f=None, f0=None, **extra) -> None:
    data: dict[str, Any] = {"x": np.asarray(x)}
    if visibility is not None:
        data["visibility"] = np.asarray(visibility)
    if f is not None:
        data["f"] = np.asarray(f)
    if f0 is not None:
        data["f0"] = np.asarray(f0)
    for k, v in extra.items():
        data[k] = np.asarray(v)
    np.savez(path, **data)


def load_observations(path: str) -> dict[str, np.ndarray]:
    data = dict(np.load(path, allow_pickle=False))
    if "x" not in data:
        raise ValueError(f"{path} has no 'x' array (expected (F, P, 2) tracks)")
    x = data["x"]
    if x.ndim != 3 or x.shape[-1] != 2:
        raise ValueError(f"'x' must be (F, P, 2), got {x.shape}")
    return data
