"""Device-mesh construction helpers.

The framework's two parallelism axes (SURVEY.md §2, items 12-13):

- ``scenes`` — pure data parallelism over independent reconstructions
  (the 256-scenes x 100-views north star);
- ``points`` — intra-scene sharding of the P (feature points) dimension:
  observation rows, per-point Schur blocks, and the point side of every
  einsum are sharded; per-camera quantities stay replicated and are
  combined with ``psum``-style all-reduces that XLA lays onto ICI.

There is deliberately no hand-written communication backend: collectives
are emitted by GSPMD from sharding annotations (or explicitly inside
``shard_map`` blocks in ``sharded_ba.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Build a named mesh with the given axis sizes (row-major over the
    available devices)."""
    devices = devices if devices is not None else jax.devices()
    sizes = list(axis_sizes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, tuple(axis_sizes.keys()))


def hybrid_scene_point_mesh(
    n_slices: int, devices=None, axes: tuple[str, str] = ("scenes", "points")
) -> Mesh:
    """Multi-slice (DCN x ICI) mesh: the outer axis spans TPU slices over
    the data-center network, the inner axis stays within each slice on ICI.

    The framework's communication pattern makes this split safe by
    construction: the ``scenes`` axis is collectives-free data parallelism
    (independent reconstructions, no cross-scene reduction anywhere), so
    the slow DCN hop carries zero traffic during optimization; the
    per-retry ``psum`` of camera-side Schur accumulations
    (``sharded_ba.py``) rides ICI only. Mapping ``points`` across slices
    instead would put one (9F, 9F) all-reduce per LM retry on DCN — never
    do that; this helper exists so the fast axis assignment is the default.

    On multi-slice TPU hardware the physical slice structure is read from
    the devices' ``slice_index`` (via ``mesh_utils.create_hybrid_device_mesh``);
    elsewhere (single slice, CPU) devices are grouped row-major so the
    mesh shape — and every program compiled over it — is identical.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_slices:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_slices} slices"
        )
    per_slice = len(devices) // n_slices
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (n_slices, 1), devices=devices
        )
    except (ValueError, AttributeError, ImportError):
        arr = np.asarray(devices).reshape(n_slices, per_slice)
    return Mesh(arr, axes)


def scene_point_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """2D (scenes, points) mesh over ``n_devices``: scenes gets the largest
    power-of-two factor <= sqrt(n), points the rest. For 8 devices this is
    (2 scenes, 4 points)."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    scenes = 1
    while scenes * 2 <= n // (scenes * 2) and n % (scenes * 2) == 0:
        scenes *= 2
    points = n // scenes
    return make_mesh({"scenes": scenes, "points": points}, devices=devices)
