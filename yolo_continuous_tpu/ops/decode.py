"""Grid/anchor decoding of raw head maps (pure, jit-safe).

Parity targets:
- ``detect.py:29-87``   decode_box: per-level sigmoid, xy*2-0.5+grid,
  (wh*2)^2*anchor, normalized by feature size, concat over levels
- ``nets/idetect.py:40-43`` in-head decode in pixels (xy*stride)

Raw maps here are NHWC-style ``(bs, h, w, na, no)`` (the builder's head
layout). Outputs flatten to ``(bs, h*w*na, no)`` per level.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def _grid_hw(h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return gx, gy


def decode_level(
    pred: jnp.ndarray,          # (bs, h, w, na, no) raw logits
    anchors_px: jnp.ndarray,    # (na, 2) anchor w,h in input-image pixels
    stride: float,
    normalized: bool = True,
) -> jnp.ndarray:
    """Decode one level.

    normalized=True reproduces ``detect.py:76-85``: box coords are divided
    by the feature size (i.e. fractions of the input image).
    normalized=False reproduces ``nets/idetect.py:40-43``: pixels.
    """
    bs, h, w, na, no = pred.shape
    p = jnp.asarray(pred, jnp.float32)
    y = 1.0 / (1.0 + jnp.exp(-p))  # sigmoid over everything (detect.py:48)
    gx, gy = _grid_hw(h, w)
    anchors_f = anchors_px / stride  # scaled to feature units (detect.py:42-43)
    bx = y[..., 0] * 2.0 - 0.5 + gx[None, :, :, None]
    by = y[..., 1] * 2.0 - 0.5 + gy[None, :, :, None]
    bw = (y[..., 2] * 2.0) ** 2 * anchors_f[None, None, None, :, 0]
    bh = (y[..., 3] * 2.0) ** 2 * anchors_f[None, None, None, :, 1]
    if normalized:
        scale = jnp.array([w, h, w, h], jnp.float32)
        box = jnp.stack([bx, by, bw, bh], axis=-1) / scale
    else:
        box = jnp.stack([bx, by, bw, bh], axis=-1) * stride
    out = jnp.concatenate([box, y[..., 4:]], axis=-1)
    return out.reshape(bs, h * w * na, no)


def decode_outputs(
    preds: Sequence[jnp.ndarray],
    anchors: Sequence,              # per level, ((w,h),)*na in px
    strides: Sequence[float],
    normalized: bool = True,
) -> jnp.ndarray:
    """All levels -> (bs, total, no); cf. detect.py:229-230 torch.cat."""
    outs: List[jnp.ndarray] = []
    for p, a, s in zip(preds, anchors, strides):
        outs.append(decode_level(p, jnp.asarray(a, jnp.float32), float(s), normalized))
    return jnp.concatenate(outs, axis=1)


def decode_level_bin(
    pred: jnp.ndarray,              # (bs, h, w, na, nc+3+2*(bins+1)) raw
    anchors_px: jnp.ndarray,
    stride: float,
    bin_count: int = 21,
    normalized: bool = True,
) -> jnp.ndarray:
    """IBin in-head decode (nets/ibin.py:46-75) -> (bs, hw*na, 5+nc).

    w/h come from the SigmoidBin argmax+residual over the sigmoided bins
    scaled by the pixel anchors; xy/obj/cls as usual.
    """
    from .sigmoid_bin import SigmoidBinCfg, sigmoid_bin_decode
    cfgb = SigmoidBinCfg(bin_count=bin_count, vmin=0.0, vmax=4.0)
    L = cfgb.length
    bs, h, w, na, _ = pred.shape
    y = 1.0 / (1.0 + jnp.exp(-jnp.asarray(pred, jnp.float32)))
    gx, gy = _grid_hw(h, w)
    bx = (y[..., 0] * 2.0 - 0.5 + gx[None, :, :, None]) * stride
    by = (y[..., 1] * 2.0 - 0.5 + gy[None, :, :, None]) * stride
    wr = sigmoid_bin_decode(y[..., 2:2 + L], cfgb)
    hr = sigmoid_bin_decode(y[..., 2 + L:2 + 2 * L], cfgb)
    bw = wr * anchors_px[None, None, None, :, 0]
    bh = hr * anchors_px[None, None, None, :, 1]
    rest = y[..., 2 + 2 * L:]  # obj, cls...
    if normalized:
        s = float(stride)
        scale = jnp.array([w * s, h * s, w * s, h * s], jnp.float32)
        box = jnp.stack([bx, by, bw, bh], -1) / scale
    else:
        box = jnp.stack([bx, by, bw, bh], -1)
    out = jnp.concatenate([box, rest], axis=-1)
    return out.reshape(bs, h * w * na, out.shape[-1])


def decode_outputs_bin(preds, anchors, strides, bin_count: int = 21,
                       normalized: bool = True) -> jnp.ndarray:
    outs = [decode_level_bin(p, jnp.asarray(a, jnp.float32), float(s),
                             bin_count, normalized)
            for p, a, s in zip(preds, anchors, strides)]
    return jnp.concatenate(outs, axis=1)
