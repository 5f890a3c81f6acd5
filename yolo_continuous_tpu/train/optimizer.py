"""Optimizer with the reference's 3-param-group policy, jit-native.

Parity target: ``main/optimizer.py:20-52`` —
  pg0 = BatchNorm scales (no weight decay),
  pg1 = other weights (weight decay),
  pg2 = biases (no decay; separate warm-up ramp ``main/warm_up.py:16-18``),
  SGD-Nesterov(momentum) or Adam(betas=(momentum, 0.999)).

Learning rates and SGD momentum are RUNTIME scalars (fed per step from
``ops/schedules.LRSchedule``), so warm-up never triggers recompilation.

Deliberate fix (flagged in SURVEY §2): the reference's group scan misses
``ImplicitA/M.implicit`` parameters entirely (they are neither ``.weight``
nor ``.bias``), leaving them untrained; here they land in the bias group
(no decay).

torch-semantics notes: SGD applies wd as L2-into-grad then nesterov
momentum (buf = m*buf + g; d = g + m*buf); Adam uses bias-corrected
moments with eps outside the sqrt.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.schedules import StepHyper


def label_params(params) -> Any:
    """Pytree of group labels: 'bn_scale' | 'weight' | 'bias'."""

    def label_of(path, _):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf == "scale":
            return "bn_scale"       # pg0 (main/optimizer.py:37-38)
        if leaf == "bias":
            return "bias"           # pg2 (:35-36)
        if leaf == "implicit":
            return "bias"           # fix: reference drops these params
        return "weight"             # pg1 (:39-40)

    return jax.tree_util.tree_map_with_path(label_of, params)


class SGDState(NamedTuple):
    momentum_buf: Any
    step: jnp.ndarray


class AdamState(NamedTuple):
    m: Any
    v: Any
    step: jnp.ndarray


class Optimizer:
    """SGD-Nesterov / Adam with per-group lr + decay, runtime hyperparams."""

    def __init__(self, adam: bool, weight_decay: float = 5e-4,
                 beta2: float = 0.999, eps: float = 1e-8):
        self.adam = adam
        self.weight_decay = weight_decay
        self.beta2 = beta2
        self.eps = eps

    def init(self, params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        if self.adam:
            return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                             step=jnp.zeros((), jnp.int32))
        return SGDState(momentum_buf=zeros, step=jnp.zeros((), jnp.int32))

    def update(self, grads, state, params, labels, hyper: StepHyper):
        """-> (new_params, new_state). hyper fields may be traced scalars."""
        lr_w = jnp.asarray(getattr(hyper, "lr_weights"), jnp.float32)
        lr_b = jnp.asarray(getattr(hyper, "lr_bias"), jnp.float32)
        mom = jnp.asarray(getattr(hyper, "momentum"), jnp.float32)
        wd = self.weight_decay

        def lr_of(label):
            return lr_b if label == "bias" else lr_w  # labels are static strings

        if self.adam:
            t = state.step + 1
            tf = t.astype(jnp.float32)
            b2 = self.beta2

            def upd(g, m, v, p, label):
                g = g + (wd * p if label == "weight" else 0.0)
                m_new = mom * m + (1 - mom) * g
                v_new = b2 * v + (1 - b2) * g * g
                mhat = m_new / (1 - mom ** tf)
                vhat = v_new / (1 - b2 ** tf)
                p_new = p - lr_of(label) * mhat / (jnp.sqrt(vhat) + self.eps)
                return p_new, m_new, v_new

            out = jax.tree.map(upd, grads, state.m, state.v, params, labels)
            # tree of tuples -> three trees
            p_new = jax.tree.map(lambda x: x[0], out,
                                 is_leaf=lambda x: isinstance(x, tuple))
            m_new = jax.tree.map(lambda x: x[1], out,
                                 is_leaf=lambda x: isinstance(x, tuple))
            v_new = jax.tree.map(lambda x: x[2], out,
                                 is_leaf=lambda x: isinstance(x, tuple))
            return p_new, AdamState(m=m_new, v=v_new, step=t)

        def upd(g, buf, p, label):
            g = g + (wd * p if label == "weight" else 0.0)
            buf_new = mom * buf + g
            d = g + mom * buf_new       # nesterov (torch SGD)
            p_new = p - lr_of(label) * d
            return p_new, buf_new

        out = jax.tree.map(upd, grads, state.momentum_buf, params, labels)
        p_new = jax.tree.map(lambda x: x[0], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        b_new = jax.tree.map(lambda x: x[1], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        return p_new, SGDState(momentum_buf=b_new, step=state.step + 1)


def make_optimizer(plan) -> Optimizer:
    """From a TrainPlan (cfg adam/momentum/weight_decay keys)."""
    return Optimizer(adam=bool(plan.adam), weight_decay=float(plan.weight_decay))
