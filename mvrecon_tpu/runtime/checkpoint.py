"""Checkpoint / resume for long-running optimization state.

The reference has no persistence (SURVEY.md §5; its only state artifact is
the in-memory BA iteration log). For batched large-scene runs the LM state
(X, f, u, t, R, damping, error, iteration) is a PyTree; this module offers
two interchangeable backends:

- ``save_checkpoint``/``load_checkpoint`` — a single .npz file with
  structure metadata (dependency-free NumPy format; restore validates the
  saved tree structure). Right for single-host runs and tests.
- ``save_checkpoint_orbax``/``load_checkpoint_orbax`` — an orbax
  checkpoint *directory* (async-capable, multi-host-aware TensorStore
  format). Right for production fleets; orbax's own metadata validation
  rejects structure mismatches on restore.
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


def _abstract_like(tree: Any) -> Any:
    """Leaf-wise jax.ShapeDtypeStruct view of a PyTree (orbax restore
    targets must be arrays or abstract arrays, never NumPy scalars)."""

    def _one(leaf):
        a = np.asarray(leaf)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    return jax.tree_util.tree_map(_one, tree)


def save_checkpoint_orbax(path: str, tree: Any, step: int | None = None) -> None:
    """Serialize a PyTree of arrays to the orbax directory ``path``
    (created or overwritten). Blocks until the write is durable."""
    import orbax.checkpoint as ocp

    payload = {
        "state": jax.tree_util.tree_map(np.asarray, tree),
        "step": np.asarray(-1 if step is None else step, np.int64),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, like: Any) -> tuple[Any, int | None]:
    """Restore a PyTree saved by :func:`save_checkpoint_orbax`. ``like``
    provides the tree structure and leaf shapes/dtypes (values ignored);
    orbax raises on a structure mismatch."""
    import orbax.checkpoint as ocp

    abstract = {
        "state": _abstract_like(like),
        "step": jax.ShapeDtypeStruct((), np.int64),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), abstract)
    step = int(restored["step"])
    return restored["state"], (None if step < 0 else step)


def checkpoint_backend(name: str):
    """(save, load, exists) triple for ``name`` in {"npz", "orbax"}."""
    if name == "npz":
        return save_checkpoint, load_checkpoint, os.path.exists
    if name == "orbax":
        return save_checkpoint_orbax, load_checkpoint_orbax, os.path.isdir
    raise ValueError(f"unknown checkpoint backend {name!r}")
