"""Device mesh and sharding helpers — the SPMD backbone.

The reference is single-device (SURVEY.md §2.7: no torch.distributed
anywhere); here data parallelism is first-class: a 1-D (or 2-D with a
dormant 'model' axis) ``jax.sharding.Mesh``, batches sharded over 'data',
parameters replicated, and gradient all-reduce inserted by XLA's GSPMD
partitioner over ICI. Multi-host runs initialize ``jax.distributed`` and
feed host-local shards via ``jax.make_array_from_process_local_data``.
"""

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def initialize_distributed() -> bool:
    """Initialize the multi-host JAX runtime when launched under a
    multi-process coordinator (no-op for single-process runs).

    MUST run before any JAX computation or backend query — touching the
    backend (even ``jax.process_count()``) initializes single-process XLA and
    makes ``jax.distributed.initialize`` fail. The decision is therefore made
    purely from the environment:

    - ``JAX_COORDINATOR_ADDRESS`` set -> explicit bootstrap; optional
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` / ``JAX_LOCAL_DEVICE_IDS``
      override what JAX's cluster autodetection would pick up.
    - not set -> single-process run (Cloud-TPU pod launches export it, or use
      ``jax.distributed.initialize()`` yourself before calling the trainers).

    Returns True when the distributed runtime is (now) initialized. Safe to
    call twice: a second call is a no-op.
    """
    if jax.distributed.is_initialized():
        return True
    coord = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if not coord:
        return False
    kwargs = {'coordinator_address': coord}
    num_processes = os.environ.get('JAX_NUM_PROCESSES')
    process_id = os.environ.get('JAX_PROCESS_ID')
    local_ids = os.environ.get('JAX_LOCAL_DEVICE_IDS')
    if num_processes is not None:
        kwargs['num_processes'] = int(num_processes)
    if process_id is not None:
        kwargs['process_id'] = int(process_id)
    if local_ids:
        kwargs['local_device_ids'] = [int(i) for i in local_ids.split(',')]
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(n_data: Optional[int] = None,
              n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh with axes (data, model). Defaults to all devices on 'data'.

    The 'model' axis is dormant (size 1) for these ≤30M-param models but kept
    in every sharding rule so tensor parallelism is a mesh-reshape away.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    devices = devices[:n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Move a host batch onto the mesh, sharded over 'data'.

    Single-process: a simple device_put with a NamedSharding. Multi-host:
    each process contributes its local shard of the global batch.
    """
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if not isinstance(value, np.ndarray):
            out[key] = value  # item ids / speaker names stay on host
            continue
        if jax.process_count() > 1:
            out[key] = jax.make_array_from_process_local_data(sharding, value)
        else:
            out[key] = jax.device_put(value, sharding)
    return out


def replicate_tree(tree, mesh: Mesh):
    """Place every leaf fully replicated over the mesh. Multi-host: each
    process contributes its (identical) host copy shard-by-shard, since a
    process-local array cannot be device_put onto non-addressable devices."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(leaf):
        value = np.asarray(leaf)
        return jax.make_array_from_callback(
            value.shape, sharding, lambda idx: value[idx])
    return jax.tree.map(put, tree)


def pad_batch_to_devices(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Pad the batch dimension so it divides the data-axis size (the last
    incomplete batch of an epoch would otherwise fail to shard). Padded rows
    repeat row 0; callers mask by true lengths so they only cost FLOPs."""
    n_data = mesh.shape[DATA_AXIS]
    sizes = [v.shape[0] for v in batch.values() if isinstance(v, np.ndarray)]
    if not sizes:
        return batch
    b = sizes[0]
    remainder = b % n_data
    if remainder == 0:
        return batch
    pad = n_data - remainder
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray):
            reps = np.repeat(value[:1], pad, axis=0)
            if key in ('mel_len', 'x_len'):
                reps = np.zeros_like(reps)  # padded rows drop out of masks
            out[key] = np.concatenate([value, reps], axis=0)
        elif isinstance(value, list):
            out[key] = value + [value[0]] * pad
        else:
            out[key] = value
    return out
