"""Device mesh + sharding helpers.

The reference's parallelism is DDP data parallelism (train.py:324-326,
NCCL all-reduce in autograd hooks).  The TPU-native equivalent is one
jitted train step over a `jax.sharding.Mesh`: the batch is sharded on the
'data' axis, params are replicated, and XLA inserts the gradient
all-reduces over ICI.  For very large images (the DMA 1536-2048px regime)
we additionally expose a 'spatial' mesh axis sharding the image H dim —
the CNN analogue of sequence/context parallelism: XLA handles conv halo
exchange automatically (SURVEY.md §5 long-context).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build an (data, spatial) mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial <= len(devices), (n_data, n_spatial, len(devices))
    arr = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """NHWC image batch: shard batch on 'data' (+H on 'spatial' if asked)."""
    if spatial:
        return NamedSharding(mesh, P("data", "spatial", None, None))
    return NamedSharding(mesh, P("data"))


def target_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Place a host batch onto the mesh with data(+spatial) sharding."""
    return jax.device_put(batch, batch_sharding(mesh, spatial))


def replicate_tree(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def globalize_batch(mesh: Mesh, local_batch, spatial: bool = False):
    """Assemble the GLOBAL sharded batch from this host's local shard.

    The multi-host input path: each host loads global_batch/process_count
    images (see DataLoader process sharding) and contributes them as the
    shards it owns — no host ever materialises the full batch, and no
    cross-host gather happens (the reference ships this as DistributedSampler
    + per-rank batch_size//WORLD_SIZE, train.py:279 / datasets.py:112).
    Single-process: local == global, identical to shard_batch."""
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh, spatial), np.asarray(local_batch)
    )


def globalize_targets(mesh: Mesh, local_tree):
    """Same as globalize_batch for a pytree of per-sample target arrays."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_tree,
    )


def process_shard_indices(n: int, process_index: Optional[int] = None,
                          process_count: Optional[int] = None) -> np.ndarray:
    """This host's sample indices: rank::world striding over the dataset —
    the reference's DistributedSampler convention (datasets.py:112)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, n, pc)
