"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.5: no DP/TP/PP/SP/EP anywhere); the
TPU-native design scales data-parallel over a 1-D `('data',)` mesh:

* batch arrays are sharded on axis 0 across chips;
* parameters / optimizer state are replicated (the model is ~1 M params);
* the batch-hard miner needs the full global-batch BxB distance matrix
  (models/loss.py:114-129), so embeddings are all-gathered — under jit this
  happens automatically: the train step is compiled with sharded batch inputs and
  replicated outputs, and XLA inserts the all-gather/psum collectives over ICI.

Model size never justifies TP/PP here; if clouds ever exceed single-chip capacity
the pyramid capacities, not the mesh, are the lever (SURVEY.md §2.5).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data mesh."""
    return NamedSharding(mesh, P("data"))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, tree):
    """Device-put a host pytree with axis-0 sharding across the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate_pytree(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def pad_batch_to_devices(arrs, n_devices: int):
    """Pad axis 0 to a multiple of n_devices (repeat-last padding; callers must
    mask padded rows out of losses)."""

    def pad(x):
        b = x.shape[0]
        rem = (-b) % n_devices
        if rem == 0:
            return x
        pad_block = np.repeat(x[-1:], rem, axis=0)
        return np.concatenate([x, pad_block], axis=0)

    return jax.tree.map(pad, arrs)
