"""Pallas fused 1x1-conv + folded-BN + SiLU tail kernel (MXU matmul with
an elementwise epilogue, one HBM round trip).

Round-3 throughput lever (b): the neck/head tails are 1x1 convolutions
followed by BN + SiLU; if XLA materializes the conv result before the
elementwise tail, the activation makes two HBM round trips. This kernel
computes the conv as an MXU dot over row tiles and applies the folded
BN (per-channel scale/bias) and SiLU inside VMEM, writing the activated
result once.

Measured head-to-head against the identical XLA graph by
``scripts/fused_tail_bench.py`` — kept as a serving-path option and a
measurement artifact (training would additionally need a custom VJP).

Reference anchor: the Conv(k=1)+BN+act blocks of ``nets/common.py`` used
throughout the yolov7 neck (cfg/net/yolov7.yaml rows 76-101).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[...], w_ref[...],
                  preferred_element_type=jnp.float32)      # (bm, N) fp32
    y = acc * s_ref[...] + b_ref[...]                      # folded BN
    o_ref[...] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)   # SiLU


@partial(jax.jit, static_argnames=("block_m", "interpret"))
def fused_pointwise_conv(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, block_m: int = 256,
                         interpret: bool = False) -> jnp.ndarray:
    """y = SiLU((x @ w) * scale + bias) over the channel axis.

    x: (B, H, W, C) or (M, C); w: (C, N); scale/bias: (N,) — the
    inference-folded BN parameters. Returns x.dtype with the leading
    shape preserved and the channel axis N.
    """
    orig_shape = x.shape
    C = orig_shape[-1]
    N = w.shape[-1]
    xm = x.reshape(-1, C)
    M = xm.shape[0]
    pm = -(-M // block_m) * block_m
    if pm != M:
        xm = jnp.pad(xm, ((0, pm - M), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(pm // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pm, N), x.dtype),
        interpret=interpret,
    )(xm, w, scale.reshape(1, N), bias.reshape(1, N))
    return out[:M].reshape(*orig_shape[:-1], N)


def xla_pointwise_conv(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """The identical math as one XLA graph (oracle + bench comparator)."""
    y = jnp.dot(x.reshape(-1, x.shape[-1]), w,
                preferred_element_type=jnp.float32)
    y = y * scale[None, :] + bias[None, :]
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype).reshape(*x.shape[:-1], w.shape[-1])
