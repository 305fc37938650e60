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
