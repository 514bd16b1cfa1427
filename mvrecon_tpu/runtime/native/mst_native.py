"""ctypes bindings for the native Kruskal kernel (mst.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmvrecon_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        # best-effort build; stay silent on failure (NumPy fallback exists)
        try:
            subprocess.run(
                ["sh", os.path.join(os.path.dirname(__file__), "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mvrecon_kruskal.restype = ctypes.c_int64
        lib.mvrecon_kruskal.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def kruskal(edges_i: np.ndarray, edges_j: np.ndarray, n_nodes: int) -> np.ndarray:
    """Run Kruskal over weight-sorted edges; returns keep mask (uint8)."""
    lib = _load()
    ei = np.ascontiguousarray(edges_i, dtype=np.int64)
    ej = np.ascontiguousarray(edges_j, dtype=np.int64)
    # The C++ kernel indexes union-find arrays by endpoint with no bounds
    # check (native code: an OOB write is silent heap corruption, not an
    # exception) — validate here, where it is one vectorized pass.
    if len(ei) and (
        min(ei.min(), ej.min()) < 0 or max(ei.max(), ej.max()) >= n_nodes
    ):
        raise ValueError(
            f"edge endpoints must lie in [0, {n_nodes}); got range "
            f"[{min(ei.min(), ej.min())}, {max(ei.max(), ej.max())}]"
        )
    keep = np.zeros(len(ei), dtype=np.uint8)
    lib.mvrecon_kruskal(ei, ej, len(ei), int(n_nodes), keep)
    return keep
