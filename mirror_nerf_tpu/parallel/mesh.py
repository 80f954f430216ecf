"""Device mesh + sharding helpers.

The reference's only distribution is DDP replicas over the ray batch
(`train.py:30,582-584`, SURVEY §2.3). The TPU-native equivalent is SPMD over a
1-D `data` mesh axis: the flat ray batch is sharded across chips, params are
replicated, and XLA inserts the gradient all-reduce over ICI automatically
when the jitted step's output shardings demand replicated grads.

Everything here also works on the virtual 8-device CPU backend
(`--xla_force_host_platform_device_count=8`), which is how multi-chip tests
and the driver's dry-run execute without hardware.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None,
             devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D `data` mesh over the first n (or all) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (the chunk axis of (K, chunk, ...) megabatch blocks);
    the leading block axis is scanned by lax.map, not sharded."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the leading axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree replicated on every device of the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
