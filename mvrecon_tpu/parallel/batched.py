"""Scene-batched (data-parallel) reconstruction.

The BASELINE north star: 256 scenes x 100 views of factorization + BA
batched over a TPU slice. Each scene is an independent reconstruction;
``vmap`` turns every per-scene SVD/eigh/einsum into its batched form
(saturating the MXU on one chip), and sharding the leading ``scenes`` axis
over the mesh scales across chips — the collectives-free pure-DP regime.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LMConfig
from ..models.pipelines import (
    ReconstructionResult,
    affine_reconstruction,
    euclidean_reconstruction,
)

SCENES_AXIS = "scenes"


@partial(jax.jit, static_argnames=("model", "f0", "config", "scene_chunk"))
def batched_affine_reconstruction(
    x: jax.Array,
    f: jax.Array,
    model: str = "paraperspective",
    f0: float = 1.0,
    config: LMConfig = LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100),
    scene_chunk: int | None = None,
) -> ReconstructionResult:
    """vmap the affine pipeline over a leading scenes axis:
    x (S, F, P, 2), f (S, F). ``scene_chunk``: see the euclidean variant."""
    fn = partial(affine_reconstruction, model=model, f0=f0, config=config)
    if scene_chunk is None:
        return jax.vmap(fn)(x, f)
    return jax.lax.map(lambda args: fn(*args), (x, f), batch_size=scene_chunk)


@partial(
    jax.jit,
    static_argnames=("method", "f0", "tol", "config", "eig_method", "scene_chunk"),
)
def batched_euclidean_reconstruction(
    x: jax.Array,
    f0: float = 1.0,
    tol: float = 1e-2,
    method: str = "dual",
    config: LMConfig = LMConfig(scale_factor=2.0, delta_tol=1e-8, max_iter=100),
    eig_method: str = "eigh",
    scene_chunk: int | None = None,
) -> ReconstructionResult:
    """vmap the perspective pipeline over a leading scenes axis:
    x (S, F, P, 2).

    ``scene_chunk`` streams the batch through HBM in blocks of that many
    scenes (lax.map batch_size: vmap within a block, scan over blocks) —
    one chip can then process arbitrarily many scenes at a fixed memory
    footprint. Unset = pure vmap (all scenes resident)."""
    fn = partial(euclidean_reconstruction, f0=f0, tol=tol, method=method,
                 config=config, eig_method=eig_method)
    if scene_chunk is None:
        return jax.vmap(fn)(x)
    return jax.lax.map(fn, x, batch_size=scene_chunk)


def shard_scenes(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a (S, ...) batch with the scenes axis sharded over the mesh —
    XLA then runs the batched pipeline pure-DP with zero collectives."""
    return jax.device_put(x, NamedSharding(mesh, P(SCENES_AXIS)))
