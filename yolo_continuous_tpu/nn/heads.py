"""Detection heads: Detect / IDetect / IAuxDetect / IBin.

Parity targets:
- ``nets/detect.py:4-38``       Detect  (3 plain 1x1 convs; returns P5,P4,P3)
- ``nets/idetect.py:7-50``      IDetect (ImplicitA -> conv -> ImplicitM; P3,P4,P5)
- ``nets/iaux_detect.py:7-54``  IAuxDetect (+aux convs on 3 extra inputs)
- ``nets/ibin.py:8-79``         IBin (w/h via SigmoidBin; no = nc+3+2*(bins+1))

All heads here return RAW maps shaped ``(bs, h, w, na, no)`` per level in
both train and eval mode; decoding is a separate pure function
(``ops/decode.py``), which fixes the reference wart where IDetect-family
eval crashes because ``parse_model`` never sets ``stride``
(``nets/idetect.py:8``, flagged in SURVEY.md §2).

Head metadata (level order, strides, per-level anchors) is produced at
build time by ``builder.py`` so the loss and decode always see a
consistent (pred, stride, anchors) triple:
- Detect outputs P5-first; anchors attach via the plan's ``anchors_mask``
  ([[6,7,8],[3,4,5],[0,1,2]] -> large anchors on P5), matching
  ``detect.py:29-87`` + ``losses/yolo_loss.py:31-37``.
- IDetect/IAuxDetect/IBin output P3-first with anchor rows [0,1,2],
  matching ``nets/idetect.py:17-20``.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ImplicitA, ImplicitM, conv2d, logit_conv2d

Dtype = Any


def _reshape_head(y: jnp.ndarray, na: int, no: int) -> jnp.ndarray:
    """(bs, h, w, na*no) -> (bs, h, w, na, no)."""
    bs, h, w, _ = y.shape
    return y.reshape(bs, h, w, na, no)


class Detect(nn.Module):
    """Plain per-level 1x1 convs; nets/detect.py:4-38.

    Input x: [P3, P4, P5] features. Output: [P5, P4, P3] raw maps —
    the reference's output order (nets/detect.py:27-38).
    """
    nc: int
    na: int = 3
    dtype: Dtype = jnp.float32       # multiply dtype (the body's dtype)
    out_dtype: Dtype = jnp.float32   # logit accumulate/output dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        no = self.nc + 5
        p3 = logit_conv2d(self, x[0], self.na * no, "head_p3", self.dtype, self.out_dtype)
        p4 = logit_conv2d(self, x[1], self.na * no, "head_p4", self.dtype, self.out_dtype)
        p5 = logit_conv2d(self, x[2], self.na * no, "head_p5", self.dtype, self.out_dtype)
        return [_reshape_head(p, self.na, no) for p in (p5, p4, p3)]


class IDetect(nn.Module):
    """Implicit-knowledge head; nets/idetect.py:7-50. Output order = input order (P3-first)."""
    nc: int
    na: int = 3
    dtype: Dtype = jnp.float32       # multiply dtype (the body's dtype)
    out_dtype: Dtype = jnp.float32   # logit accumulate/output dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        no = self.nc + 5
        outs = []
        for i, xi in enumerate(x):
            c1 = xi.shape[-1]
            y = ImplicitA(c1, name=f"ia{i}")(xi)
            y = logit_conv2d(self, y, self.na * no, f"m{i}", self.dtype, self.out_dtype)
            y = ImplicitM(self.na * no, name=f"im{i}")(y)
            outs.append(_reshape_head(y, self.na, no))
        return outs


class IAuxDetect(nn.Module):
    """IDetect + auxiliary heads; nets/iaux_detect.py:7-54.

    x = [P3, P4, P5, A3, A4, A5]; train output = 6 maps (leads then auxes);
    eval consumers use the first nl maps (nets/iaux_detect.py:40-49).
    """
    nc: int
    na: int = 3
    nl: int = 3
    dtype: Dtype = jnp.float32       # multiply dtype (the body's dtype)
    out_dtype: Dtype = jnp.float32   # logit accumulate/output dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        no = self.nc + 5
        leads, auxes = [], []
        for i in range(self.nl):
            c1 = x[i].shape[-1]
            y = ImplicitA(c1, name=f"ia{i}")(x[i])
            y = logit_conv2d(self, y, self.na * no, f"m{i}", self.dtype, self.out_dtype)
            y = ImplicitM(self.na * no, name=f"im{i}")(y)
            leads.append(_reshape_head(y, self.na, no))
            y2 = logit_conv2d(self, x[i + self.nl], self.na * no, f"m2_{i}", self.dtype, self.out_dtype)
            auxes.append(_reshape_head(y2, self.na, no))
        return leads + auxes


class IBin(nn.Module):
    """Bin-regression head; nets/ibin.py:8-79.

    no = nc + 3 + 2*(bin_count+1): [x, y, w_bin(22), h_bin(22), obj, cls...]
    (w bins at channels 2:24, h bins at 24:46, obj at 46; nets/ibin.py:62-70).
    """
    nc: int
    na: int = 3
    bin_count: int = 21
    dtype: Dtype = jnp.float32       # multiply dtype (the body's dtype)
    out_dtype: Dtype = jnp.float32   # logit accumulate/output dtype

    @property
    def no(self) -> int:
        return self.nc + 3 + 2 * (self.bin_count + 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, xi in enumerate(x):
            c1 = xi.shape[-1]
            y = ImplicitA(c1, name=f"ia{i}")(xi)
            y = logit_conv2d(self, y, self.na * self.no, f"m{i}", self.dtype, self.out_dtype)
            y = ImplicitM(self.na * self.no, name=f"im{i}")(y)
            outs.append(_reshape_head(y, self.na, self.no))
        return outs


HEAD_NAMES = ("Detect", "IDetect", "IAuxDetect", "IBin")


def head_output_order(head_name: str, nl: int) -> Tuple[int, ...]:
    """Map output index -> pyramid level (0=P3 ... nl-1=P5) for each head type."""
    if head_name == "Detect":
        return tuple(reversed(range(nl)))  # P5-first (nets/detect.py:27-38)
    return tuple(range(nl))  # P3-first (nets/idetect.py:29-45)
