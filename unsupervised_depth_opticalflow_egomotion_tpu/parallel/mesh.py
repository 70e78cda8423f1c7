"""Device mesh construction and sharding helpers (single- and multi-host).

The reference scales with single-process ``torch.nn.DataParallel``
(/root/reference/train.py:59-61). The TPU-native equivalent is a 1-D ``data``
mesh over all chips: batches are sharded on axis 0, parameters are replicated,
and XLA inserts the gradient all-reduce over ICI during jit compilation --
there is no explicit communication code anywhere in the train step.

Multi-host / multi-slice (the DCN axis SURVEY 2.7 scopes): the SAME mesh
spans every chip of every process after ``distributed_init``; each host
feeds its local shard of the batch (``make_global_batch`` assembles the
global array from per-process data) and XLA routes the gradient reduction
over ICI within a slice and DCN across slices. No reference equivalent
exists -- torch DataParallel is single-process.

A second (currently trivial) ``model`` axis is plumbed through so tensor
sharding can be enabled without API changes if model sizes ever warrant it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(
    coordinator_address: str = "",
    num_processes: int = 0,
    process_id: int = -1,
) -> bool:
    """Initialize JAX's multi-process runtime. Returns True if multi-process.

    On TPU pods ``jax.distributed.initialize()`` autodetects everything from
    the TPU metadata; CPU/GPU multi-process (and the CPU test harness,
    scripts/multihost_cpu_demo.py) pass coordinator/count/id explicitly.
    Safe no-op when neither is configured (single-process run).
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address or None,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    return False


def make_mesh(num_devices: int = 0, data_axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices (0 = all).

    ``jax.devices()`` is the GLOBAL device list, so after distributed_init
    the mesh spans every process's chips.
    """
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
    """Device-put a host batch with axis-0 sharding (single-process mesh)."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def make_global_batch(local_batch, mesh: Mesh, data_axis: str = "data"):
    """Assemble a globally-sharded batch from per-process local data.

    Each process passes its LOCAL slice (global_batch / process_count items);
    the returned jax.Arrays span the full mesh with axis 0 sharded over
    ``data_axis``. Single-process meshes take the plain device_put path.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, data_axis)
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def local_replica(tree):
    """Host-local numpy copy of a (replicated) global array pytree.

    Eval/checkpoint paths on multi-host runs cannot feed global arrays into
    single-device jitted inference; every process holds a full replica, so
    its first addressable shard IS the value.
    """

    def get(x):
        if isinstance(x, jax.Array) and hasattr(x, "addressable_data"):
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)
