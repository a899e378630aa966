"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL process-per-GPU setup
(/root/reference/stuffs/utils.py:460-527, train_*.py init blocks): a
single-controller ``jax.sharding.Mesh`` with axes

  * ``data``  — batch sharding (data parallelism).  Unlike the reference,
    gradients ARE synchronized: the loss is a global-batch scalar inside
    ``jit`` so XLA inserts the psum (the reference never wraps its model in
    DDP and silently trains independent replicas — SURVEY.md §2.4).
  * ``model`` — sharding of the eval-time retrieval gallery / pairwise score
    matrix (and any future tensor-parallel dimension).

Collectives ride ICI via XLA; nothing here issues explicit NCCL-style calls.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array leaf along its leading (batch) axis over 'data'."""
    sh = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def reduce_scalars(tree: Any) -> Any:
    """Host-side counterpart of the reference's ``reduce_dict``
    (/root/reference/stuffs/utils.py:320-344): under single-controller JAX
    the jitted loss is already the global mean, so this just materializes
    python floats for logging."""
    return jax.tree.map(lambda x: float(x), tree)
