"""Device mesh construction and distributed wireup.

reference: neuralop/mpu/comm.py:100-223 (NCCL process groups with TCP/file/
MPI rendezvous, model/data group factorization) and
neuralop/training/torch_setup.py:5 (setup).

TPU-native replacement: `jax.distributed.initialize` handles rendezvous;
parallelism is expressed as a `jax.sharding.Mesh` with ('data', 'model')
axes.  Collectives are inserted by XLA SPMD from sharding annotations — the
reference's Megatron-style autograd Functions (mpu/mappings.py) have no
equivalent here because pjit derives the transposed collectives
automatically.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host wireup (comm.py:100-158 equivalent).  No-op when
    single-process or already initialized."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(model_parallel_size: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('data', 'model') axes; data size inferred from the device
    count (comm.py:184-223 group layout: contiguous model blocks, strided
    data groups — here simply the two mesh axes)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel_size != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel_size="
            f"{model_parallel_size}")
    arr = np.array(devices).reshape(n // model_parallel_size,
                                    model_parallel_size)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def get_data_parallel_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def get_model_parallel_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def shard_batch(mesh: Mesh, *arrays, axis_name: str = DATA_AXIS):
    """Place arrays with their leading axis sharded over `axis_name`."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params/optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def split_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-data-rank batch (torch_setup.py:44-48 divisibility contract)."""
    dp = get_data_parallel_size(mesh)
    if global_batch % dp != 0:
        raise ValueError(
            f"Batch size {global_batch} not divisible by data-parallel "
            f"size {dp}")
    return global_batch // dp
