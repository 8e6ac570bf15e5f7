"""Device mesh + sharding helpers — the whole distributed story.

The reference's parallelism is NCCL data-parallel DDP (SURVEY.md §2.8;
reference torchie/apis/train.py:296-303, env.py:13). TPU-native equivalent:
one global ``jax.sharding.Mesh``; the train step is jitted over GLOBAL arrays
with the batch sharded on the ``data`` axis and parameters replicated. The
XLA SPMD partitioner inserts the gradient all-reduce (and makes BatchNorm
statistics global, i.e. SyncBN) automatically — there is no user-level
collective code to write, which is the point.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for every leaf of the batch pytree."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree on the mesh, batch-sharded along axis 0.

    Single-process: a plain device_put with the batch sharding. Multi-process
    (jax.distributed): each process holds its LOCAL slice of the global batch
    (the input pipeline shards the dataset per process, reference
    DistributedSampler semantics) and the global array is assembled from the
    per-process shards.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def init_distributed(launcher: str = "none") -> tuple:
    """Multi-process bootstrap (reference init_dist, torchie/apis/env.py:13-48).

    launcher="jax": call jax.distributed.initialize() — on TPU pods the
    coordinator/process env comes from the TPU runtime; elsewhere it reads
    the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    variables (the NCCL env:// analogue). launcher="none": single process.

    Returns (process_index, process_count).
    """
    if launcher and launcher != "none":
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
