"""Device mesh + sharding layer (SPMD via jax.sharding / GSPMD).

The reference's entire distributed story is a single-process
``torch.nn.DataParallel`` wrap (``train.py:41``; SURVEY §2.2). The
TPU-native equivalent is a named device mesh with:

- the batch sharded over the ``data`` axis (gradient all-reduce compiles
  to ICI collectives automatically under jit/GSPMD),
- optionally the widest convolution kernels sharded over a ``model``
  axis (output-channel tensor parallelism; GSPMD inserts the needed
  all-gathers),
- parameters otherwise replicated.

No hand-written collectives: XLA emits psum/all-gather over ICI from the
sharding annotations (scaling-book recipe: pick a mesh, annotate, let the
compiler place collectives).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('data', 'model') axes over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch (leading axis) sharded over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(mesh: Mesh, min_channels: int = 256):
    """Tree-map rule: shard large conv kernels' output channels on 'model'.

    Conv kernels are (kh, kw, cin, cout) in flax; when the model axis has
    size > 1 and cout is divisible and large, shard cout. Everything else
    replicates. With n_model == 1 this is pure replication (the default
    data-parallel configuration, DP >= parity with train.py:41).
    """
    n_model = mesh.shape["model"]

    def rule(x):
        if (n_model > 1 and hasattr(x, "ndim") and x.ndim == 4
                and x.shape[-1] >= min_channels and x.shape[-1] % n_model == 0):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return rule


def shard_params(mesh: Mesh, params: Any, min_channels: int = 256) -> Any:
    rule = param_sharding_rule(mesh, min_channels)
    return jax.tree.map(lambda x: jax.device_put(x, rule(x)), params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch)
