"""Checkpoint / resume for long-running optimization state.

The reference has no persistence (SURVEY.md §5; its only state artifact is
the in-memory BA iteration log). For batched large-scene runs the LM state
(X, f, u, t, R, damping, error, iteration) is a PyTree; this module
serializes any PyTree of arrays to a single .npz with structure metadata
(dependency-free NumPy format; restore validates the saved tree structure).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, tree: Any, step: int | None = None) -> None:
    """Serialize a PyTree of arrays to ``path`` (.npz). Atomic rename."""
    flat, treedef = _flatten_with_paths(tree)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(flat)}
    meta = {"treedef": str(treedef), "n_leaves": len(flat), "step": step}
    tmp = path + ".tmp"
    np.savez(tmp, __meta__=json.dumps(meta), **payload)
    # np.savez appends .npz to names without it
    tmp_real = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(tmp_real, path)


def load_checkpoint(path: str, like: Any) -> tuple[Any, int | None]:
    """Restore a PyTree saved by ``save_checkpoint``. ``like`` provides the
    tree structure (its leaves' values are ignored)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    if meta["n_leaves"] != len(flat_like):
        raise ValueError(
            f"checkpoint has {meta['n_leaves']} leaves, expected {len(flat_like)}"
        )
    if meta["treedef"] != str(treedef):
        raise ValueError(
            "checkpoint tree structure does not match `like`:\n"
            f"  saved:    {meta['treedef']}\n  expected: {treedef}"
        )
    leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    return jax.tree_util.tree_unflatten(treedef, leaves), meta.get("step")
