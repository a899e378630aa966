"""Cross-device / cross-host collective helpers.

TPU-native equivalents of the reference's torch.distributed utilities
(/root/reference/stuffs/utils.py): the pickle-tensor ``all_gather``
(:277-317), ``reduce_dict`` loss averaging (:320-344), and the
``init_distributed_mode`` / rank helpers (:460-527).

Under single-controller JAX most of these dissolve: a jitted loss over a
data-sharded batch is already globally reduced, and "rank" is the host
process index.  What remains useful:

* in-graph collectives for shard_map-style code (psum/pmean/all_gather over
  a mesh axis);
* host-level object gather for eval bookkeeping on multi-host meshes;
* process/rank introspection mirroring the reference helper names.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


# ---- in-graph (use inside shard_map/jit over a Mesh axis) ----------------

def psum(x, axis: str = "data"):
    return jax.lax.psum(x, axis_name=axis)


def pmean(x, axis: str = "data"):
    return jax.lax.pmean(x, axis_name=axis)


def all_gather(x, axis: str = "data"):
    return jax.lax.all_gather(x, axis_name=axis)


def reduce_dict(d: Dict[str, jnp.ndarray], axis: str = "data", average: bool = True):
    """In-graph counterpart of stuffs/utils.py:320-344: average (or sum) a
    dict of scalars across the mesh axis."""
    op = pmean if average else psum
    return {k: op(v, axis) for k, v in d.items()}


# ---- host-level (multi-host meshes) --------------------------------------

def process_index() -> int:
    """Reference ``get_rank`` (utils.py:489)."""
    return jax.process_index()


def process_count() -> int:
    """Reference ``get_world_size`` (utils.py:481)."""
    return jax.process_count()


def is_main_process() -> bool:
    """Reference ``is_main_process`` (utils.py:497)."""
    return jax.process_index() == 0


def gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from every host process — the
    reference's pickle-tensor all_gather (utils.py:277-317) re-expressed via
    a padded uint8 device all_gather over hosts."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i][0])].tobytes())
        for i in range(jax.process_count())
    ]


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (reference init_distributed_mode, utils.py:504-527):
    under TPU pods this is ``jax.distributed.initialize`` (coordinator
    discovery is automatic on TPU VMs).

    Must run BEFORE any other jax API touches the backend — even
    ``jax.process_count()`` finalizes single-process initialization, after
    which distributed init is a no-op.  Gated on ``SEAM_MULTIHOST=1`` so
    single-host dev runs (where ``initialize`` would fail or stall looking
    for a coordinator) are unaffected; every CLI calls this first thing,
    replacing the reference's ``torch.distributed.launch`` env rendezvous.
    """
    import os

    if os.environ.get("SEAM_MULTIHOST", "") not in ("1", "true"):
        # A forgotten gate on a real pod silently turns the job into N
        # independent single-process runs (wrong global batch, N× eval).
        # Warn loudly when pod-environment markers are present (ADVICE r1).
        markers = [k for k in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                               "MEGASCALE_COORDINATOR_ADDRESS",
                               "MEGASCALE_NUM_SLICES")
                   if os.environ.get(k)]
        if markers:
            import warnings

            warnings.warn(
                "multi-host TPU environment detected "
                f"({', '.join(markers)} set) but SEAM_MULTIHOST is not 1 — "
                "skipping jax.distributed.initialize; this process will run "
                "as an INDEPENDENT single-host job. Set SEAM_MULTIHOST=1 to "
                "initialize the pod.",
                RuntimeWarning, stacklevel=2)
        return
    jax.distributed.initialize(**kwargs)
