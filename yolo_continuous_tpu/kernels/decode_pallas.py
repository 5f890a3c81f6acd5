"""Pallas TPU kernel: fused grid/anchor decode of one head level.

Fuses the whole per-level post-forward chain of ``detect.py:45-86`` —
sigmoid, xy*2-0.5+grid, (wh*2)^2*anchor, normalize — into one VMEM
kernel, writing the flattened (h*w*na, no) prediction rows the NMS stage
consumes. The XLA path (``ops/decode.decode_level``) produces identical
values and remains the off-TPU fallback / correctness oracle.

Grid coordinates and per-row anchors are recomputed in-kernel from the
row index (VPU iota math + static-unrolled anchor select), so nothing but
the raw logits ever streams from HBM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(w: int, h: int, na: int, anchors_f, normalized: bool,
                 block_r: int):
    aw_vals = [float(a[0]) for a in anchors_f]
    ah_vals = [float(a[1]) for a in anchors_f]

    def kernel(pred_ref, out_ref):
        r, no = pred_ref.shape                          # r = block_r rows
        y = 1.0 / (1.0 + jnp.exp(-pred_ref[:, :]))      # sigmoid everything

        base = pl.program_id(0) * block_r
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)[:, 0]
        a_idx = rows % na
        cell = rows // na
        gx = (cell % w).astype(jnp.float32)
        gy = (cell // w).astype(jnp.float32)

        aw = jnp.zeros((r,), jnp.float32)
        ah = jnp.zeros((r,), jnp.float32)
        for k in range(na):  # static unroll: no dynamic gather needed
            sel = a_idx == k
            aw = jnp.where(sel, aw_vals[k], aw)
            ah = jnp.where(sel, ah_vals[k], ah)

        sx = 1.0 / w if normalized else 1.0
        sy = 1.0 / h if normalized else 1.0
        bx = (y[:, 0] * 2.0 - 0.5 + gx) * sx
        by = (y[:, 1] * 2.0 - 0.5 + gy) * sy
        bw = (y[:, 2] * 2.0) ** 2 * aw * sx
        bh = (y[:, 3] * 2.0) ** 2 * ah * sy

        # column select instead of scatter (pallas TPU has no scatter):
        # out[:, c] = box component for c < 4 else sigmoid(pred)[:, c]
        cols = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        box = (jnp.where(cols == 0, bx[:, None], 0.0)
               + jnp.where(cols == 1, by[:, None], 0.0)
               + jnp.where(cols == 2, bw[:, None], 0.0)
               + jnp.where(cols == 3, bh[:, None], 0.0))
        out_ref[:, :] = jnp.where(cols < 4, box, y)

    return kernel


@partial(jax.jit,
         static_argnames=("anchors_px", "stride", "normalized", "interpret"))
def decode_level_pallas(
    pred: jnp.ndarray,          # (bs, h, w, na, no) raw logits
    anchors_px,                 # ((w,h),)*na px — hashable tuple (static)
    stride: float,
    normalized: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.decode.decode_level (one fused kernel per image)."""
    import numpy as np
    bs, h, w, na, no = pred.shape
    r = h * w * na
    # tile rows so each program's working set stays well under VMEM;
    # pick the largest divisor of r <= 2048 (prefer sublane multiples)
    if r <= 2048:
        block_r = r
    else:
        block_r = max((d for d in range(2048, 0, -1)
                       if r % d == 0 and (d % 8 == 0 or d < 8)),
                      default=r)
    grid = r // block_r
    anchors_f = (np.asarray(anchors_px, np.float32) / float(stride)).tolist()
    kernel = _make_kernel(w, h, na, anchors_f, normalized, block_r)

    def one(p):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, no), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((block_r, no), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_r, no), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(p.reshape(r, no).astype(jnp.float32))
        if not normalized:
            # pixel mode (idetect.py:40-43): xy*stride; wh anchor back to px
            out = out.at[:, 0:4].multiply(float(stride))
        return out

    return jax.vmap(one)(pred)
