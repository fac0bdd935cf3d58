"""Device mesh + sharding utilities.

The reference has NO distributed support (SURVEY §2.2: the only multi-device
surface is CUDA_VISIBLE_DEVICES). This module is built fresh, TPU-first:

  * 2-D mesh ('data', 'model'): batch data-parallelism rides the 'data'
    axis (gradients all-reduce over ICI via the psum XLA inserts for
    replicated-param / sharded-batch jit); the 'model' axis shards the
    open-vocabulary CLASS dimension -- with LVIS-scale prompt sets (1203+)
    the text-embedding matrix and the (B, 8400, C) similarity/argmax are the
    widest tensors in the graph, so class-sharding is this model family's
    natural tensor parallelism.
  * Everything is expressed as NamedSharding annotations; XLA chooses the
    collectives (psum / all-gather) -- no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: Optional[int] = None, n_model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f'need {n_data}x{n_model} devices, have {len(devices)}')
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ('data', 'model'))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P('data'))


def class_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Class axis (first of a (C, E) vocabulary matrix) over 'model'."""
    spec = ['model'] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array in a batch dict with batch-axis sharding."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, 'shape') and getattr(v, 'ndim', 0) >= 1:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out
