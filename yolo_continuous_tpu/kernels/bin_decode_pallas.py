"""Pallas TPU kernel: fused IBin (sigmoid-bin) decode of one head level.

Completes the north-star kernel set (grid decode + sigmoid-bin + NMS as
Pallas kernels): sigmoid, xy grid decode, SigmoidBin argmax+residual for
w/h (nets/ibin.py:46-75, losses/sigmoid_bin.py:49-63), emitted as
(h*w*na, 5+nc) rows. XLA oracle: ops/decode.decode_outputs_bin.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.sigmoid_bin import SigmoidBinCfg


def _make_kernel(w: int, h: int, na: int, anchors_px, nc: int,
                 cfgb: SigmoidBinCfg, normalized: bool, stride: float,
                 block_r: int):
    aw_vals = [float(a[0]) for a in anchors_px]   # PX anchors (ibin decode)
    ah_vals = [float(a[1]) for a in anchors_px]
    L = cfgb.length                               # 22
    start = cfgb.vmin + (cfgb.scale / 2.0) / cfgb.bin_count
    step = cfgb.step

    def bin_decode(y, cols, off):
        """Full-width column-mask formulation (Mosaic dislikes unaligned
        lane slices): reg at column `off`, bins at `off+1 .. off+L-1`."""
        reg_col = jnp.sum(jnp.where(cols == off, y, 0.0), axis=1)
        reg = (reg_col * cfgb.reg_scale - cfgb.reg_scale / 2.0) * step
        masked = jnp.where((cols >= off + 1) & (cols < off + L), y, -1e9)
        idx = (jnp.argmax(masked, axis=1) - (off + 1)).astype(jnp.float32)
        bias = start + step * idx
        return jnp.clip(reg + bias, cfgb.vmin, cfgb.vmax)

    def kernel(pred_ref, out_ref):
        r = pred_ref.shape[0]
        y = 1.0 / (1.0 + jnp.exp(-pred_ref[:, :]))
        cols_in = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)

        base = pl.program_id(0) * block_r
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)[:, 0]
        a_idx = rows % na
        cell = rows // na
        gx = (cell % w).astype(jnp.float32)
        gy = (cell // w).astype(jnp.float32)
        aw = jnp.zeros((r,), jnp.float32)
        ah = jnp.zeros((r,), jnp.float32)
        for k in range(na):
            sel = a_idx == k
            aw = jnp.where(sel, aw_vals[k], aw)
            ah = jnp.where(sel, ah_vals[k], ah)

        x_col = jnp.sum(jnp.where(cols_in == 0, y, 0.0), axis=1)
        y_col = jnp.sum(jnp.where(cols_in == 1, y, 0.0), axis=1)
        bx = (x_col * 2.0 - 0.5 + gx) * stride
        by = (y_col * 2.0 - 0.5 + gy) * stride
        bw = bin_decode(y, cols_in, 2) * aw
        bh = bin_decode(y, cols_in, 2 + L) * ah
        if normalized:
            sx = 1.0 / (w * stride)
            sy = 1.0 / (h * stride)
        else:
            sx = sy = 1.0

        box = jnp.concatenate(
            [(bx * sx)[:, None], (by * sy)[:, None],
             (bw * sx)[:, None], (bh * sy)[:, None]], axis=1)
        rest = y[:, 2 + 2 * L:]                    # obj, cls (static slice)
        out_ref[:, :] = jnp.concatenate([box, rest], axis=1)

    return kernel


@partial(jax.jit, static_argnames=("anchors_px", "stride", "bin_count",
                                   "normalized", "interpret"))
def decode_level_bin_pallas(
    pred: jnp.ndarray,          # (bs, h, w, na, nc+3+2*(bins+1)) raw
    anchors_px,                 # ((w,h),)*na px, hashable tuple (static)
    stride: float,
    bin_count: int = 21,
    normalized: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    bs, h, w, na, no_bin = pred.shape
    cfgb = SigmoidBinCfg(bin_count=bin_count, vmin=0.0, vmax=4.0)
    nc = no_bin - 3 - 2 * cfgb.length
    r = h * w * na
    if r <= 2048:
        block_r = r
    else:
        block_r = max((d for d in range(2048, 0, -1)
                       if r % d == 0 and (d % 8 == 0 or d < 8)), default=r)
    grid = r // block_r
    kernel = _make_kernel(w, h, na, tuple(anchors_px), nc, cfgb, normalized,
                          float(stride), block_r)

    def one(p):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, 5 + nc), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((block_r, no_bin), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_r, 5 + nc), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(p.reshape(r, no_bin).astype(jnp.float32))

    return jax.vmap(one)(pred)
