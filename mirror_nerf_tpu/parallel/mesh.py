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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Mesh:
    """Multi-host entry glue: initialize the JAX distributed runtime and
    return the global 1-D data mesh over ALL hosts' devices.

    Launch topology (one process per host, same program everywhere):

        # host i of H:
        from mirror_nerf_tpu.parallel.mesh import init_distributed
        mesh = init_distributed("host0:8476", H, i)   # or rely on TPU env
        # ... build the Trainer with mesh=mesh; feed each host its
        # process-local slice via host_local_batch(mesh, batch).

    On Cloud TPU pods `jax.distributed.initialize()` auto-discovers the
    coordinator/topology from the TPU environment, so all three arguments
    may be None. Afterwards `jax.devices()` is the GLOBAL device list and
    the returned mesh spans every chip; the jitted train step is unchanged
    — XLA lowers the gradient psum to ICI all-reduces across the pod.
    Safe to call in single-process runs (skips initialization).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    elif coordinator_address is None and num_processes is None and \
            jax.process_count() == 1 and _tpu_pod_env():
        jax.distributed.initialize()
    return get_mesh()


def _tpu_pod_env() -> bool:
    import os

    return bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))


def host_local_batch(mesh: Mesh, batch):
    """Build globally-sharded arrays from each process's LOCAL shard.

    In multi-host SPMD every process holds only its slice of the global ray
    batch (global leading axis = sum of the per-host slices, in process
    order). `jax.make_array_from_process_local_data` assembles the logical
    global array without any cross-host copy — each host's data lands on its
    own chips. Single-process meshes fall back to `shard_batch`.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)
