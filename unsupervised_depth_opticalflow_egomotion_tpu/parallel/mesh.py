"""Device mesh construction and sharding helpers.

The reference scales with single-process ``torch.nn.DataParallel``
(/root/reference/train.py:59-61). The TPU-native equivalent is a 1-D ``data``
mesh over all chips: batches are sharded on axis 0, parameters are replicated,
and XLA inserts the gradient all-reduce over ICI during jit compilation --
there is no explicit communication code anywhere in the train step.

A second (currently trivial) ``model`` axis is plumbed through so tensor
sharding can be enabled without API changes if model sizes ever warrant it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, data_axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices (0 = all)."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put a host batch with axis-0 sharding."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
