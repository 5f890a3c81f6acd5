"""Multi-host (multi-process) runtime helpers.

The reference's only nod to multi-process training is dormant
DDP-awareness (``main/model_ema.py:13-20``; an unused torch.distributed
import). The TPU-native equivalent of DDP is the multi-host JAX runtime:
one process per host, all hosts participating in the same Mesh, each
feeding its local shard of the global batch (SURVEY §2.2).

Typical use on a multi-host slice:

    from yolo_continuous_tpu.parallel import distributed as dist
    dist.initialize()                      # jax.distributed.initialize()
    mesh = make_mesh()                     # spans ALL hosts' devices
    batch = dist.host_local_batch(mesh, global_batch_np)  # local shard in
    ...                                    # jit as usual; ICI/DCN collectives

Single-host use is a no-op (initialize() detects the environment).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env autodetection; no-op when the
    runtime is already initialized or single-process."""
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def host_local_batch(mesh: Mesh, local_tree: Any) -> Any:
    """Assemble a global, data-sharded array from per-host local shards.

    Each process passes its LOCAL portion of the batch (leading axis =
    global_batch / process_count); the result is a global jax.Array
    sharded over the mesh's 'data' axis.
    """
    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(one, local_tree)
