"""Exponential moving average of model state — wired into training.

Parity target: ``main/model_ema.py:31-57`` (ModelEMA with ramped decay
``d = decay * (1 - exp(-updates / tau))``, decay 0.9999, tau 2000, applied
to every floating-point entry of the state dict). The reference defines
this but never calls it from ``train.py`` (SURVEY §2 flags the dead
wiring); here the train loop updates it every step and checkpoints both
raw and EMA weights.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    tree: Any                 # EMA of params (+ batch_stats)
    updates: jnp.ndarray      # int32 counter


def ema_init(tree) -> EMAState:
    # copy=True: the EMA must not alias the live parameter buffers, or
    # donating the train state would donate the same buffer twice.
    return EMAState(tree=jax.tree.map(lambda x: jnp.array(x, copy=True), tree),
                    updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_tree, decay: float = 0.9999,
               tau: float = 2000.0) -> EMAState:
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    out = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, state.tree, new_tree)
    return EMAState(tree=out, updates=updates)
