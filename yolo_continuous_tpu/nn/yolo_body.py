"""Hard-coded YOLOv7 model family (the reference's alternative model path).

Parity targets:
- ``nets/backbone.py:17-145``  Conv (LeakyReLU 0.1, BN eps 1e-3 mom 0.03),
  Block (E-ELAN), MP, Transition, Backbone (stem -> dark2..5, P3/P4/P5)
- ``nets/yolo_net.py:219-327`` YoloBody: backbone + SPPCSPC + PAN
  up/down + RepConv heads + 3 plain conv heads, phi in {'l', 'x'}
- ``nets/layout.py:18-57``     layout YoloBody: backbone + SPPCSPC ->
  Flatten -> Linear(16) (the "chip grab" regression experiment)

The deploy-time ``fuse()`` (yolo_net.py:274-283) is the pure transform in
``nn/fuse.py`` applied to these modules' RepConvs.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (BatchNorm, Conv, RepConv, SPPCSPC, conv2d,
                     logit_conv2d, max_pool, upsample_nearest_2x)

Dtype = Any

LEAKY = ("leaky_relu", 0.1)


class BConv(nn.Module):
    """backbone.py:17-29 Conv: Conv2d + BN(eps 1e-3, mom 0.03) + SiLU.

    Note the reference's act default is a SiLU *instance* and no caller
    passes ``act=True``, so the LeakyReLU(0.1) branch is dead code — the
    whole hard-coded family runs SiLU (backbone.py:18-24).
    """
    c2: int
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self, x, self.c2, self.k, self.s, dtype=self.dtype)
        # act inside BatchNorm: spans the bn_remat chunk (same math)
        return BatchNorm(momentum=0.97, epsilon=1e-3, name="bn")(x, train,
                                                                 act="silu")


class Block(nn.Module):
    """E-ELAN block; backbone.py:32-55."""
    c2: int      # mid channels
    c3: int      # out channels
    n: int = 4
    e: float = 1.0
    ids: Tuple[int, ...] = (-1,)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        x1 = BConv(c_, 1, 1, self.dtype, name="cv1")(x, train)
        x2 = BConv(c_, 1, 1, self.dtype, name="cv2")(x, train)
        xs = [x1, x2]
        for i in range(self.n):
            x2 = BConv(self.c2, 3, 1, self.dtype, name=f"cv3_{i}")(x2, train)
            xs.append(x2)
        sel = jnp.concatenate([xs[i] for i in self.ids], axis=-1)
        return BConv(self.c3, 1, 1, self.dtype, name="cv4")(sel, train)


class Transition(nn.Module):
    """maxpool||strided-conv downsample concat; backbone.py:67-83."""
    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = max_pool(x, 2, 2)
        x1 = BConv(self.c2, 1, 1, self.dtype, name="cv1")(x1, train)
        x2 = BConv(self.c2, 1, 1, self.dtype, name="cv2")(x, train)
        x2 = BConv(self.c2, 3, 2, self.dtype, name="cv3")(x2, train)
        return jnp.concatenate([x2, x1], axis=-1)


class Backbone(nn.Module):
    """stem -> dark2..dark5 -> (P3, P4, P5); backbone.py:86-145."""
    transition_channels: int
    block_channels: int
    n: int
    phi: str = "l"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, b, n = self.transition_channels, self.block_channels, self.n
        ids = {"l": (-1, -3, -5, -6), "x": (-1, -3, -5, -7, -8)}[self.phi]
        dt = self.dtype
        x = BConv(t, 3, 1, dt, name="stem0")(x, train)
        x = BConv(t * 2, 3, 2, dt, name="stem1")(x, train)
        x = BConv(t * 2, 3, 1, dt, name="stem2")(x, train)
        x = BConv(t * 4, 3, 2, dt, name="dark2_conv")(x, train)
        x = Block(b * 2, t * 8, n, 1.0, ids, dt, name="dark2_block")(x, train)
        x = Transition(t * 4, dt, name="dark3_tr")(x, train)
        x = Block(b * 4, t * 16, n, 1.0, ids, dt, name="dark3_block")(x, train)
        feat1 = x
        x = Transition(t * 8, dt, name="dark4_tr")(x, train)
        x = Block(b * 8, t * 32, n, 1.0, ids, dt, name="dark4_block")(x, train)
        feat2 = x
        x = Transition(t * 16, dt, name="dark5_tr")(x, train)
        x = Block(b * 8, t * 32, n, 1.0, ids, dt, name="dark5_block")(x, train)
        feat3 = x
        return feat1, feat2, feat3


class YoloBody(nn.Module):
    """backbone + SPPCSPC + PAN + RepConv + heads; yolo_net.py:219-327.

    phi='l': RepConv pyramid convs; phi='x': plain Convs (yolo_net.py:231).
    """
    num_classes: int
    phi: str = "l"
    anchors_per_level: int = 3
    dtype: Dtype = jnp.float32
    # head convs in fp32 regardless of body dtype (same mixed-precision
    # policy as builder.YoloModel.head_dtype: logit precision bounds mAP)
    head_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = {"l": 32, "x": 40}[self.phi]                 # yolo_net.py:225
        block_channels = 32
        panet = {"l": 32, "x": 64}[self.phi]             # :227
        e = {"l": 2, "x": 1}[self.phi]                   # :228
        n = {"l": 4, "x": 6}[self.phi]                   # :229
        ids = {"l": (-1, -2, -3, -4, -5, -6),
               "x": (-1, -3, -5, -7, -8)}[self.phi]      # :230
        dt = self.dtype
        no = self.anchors_per_level * (5 + self.num_classes)

        def pyr_conv(c1, c2, name):                      # :231,266-268
            if self.phi == "l":
                return RepConv(c1, c2, 3, 1, dtype=dt, name=name)
            return BConv(c2, 3, 1, dt, name=name)

        feat1, feat2, feat3 = Backbone(t, block_channels, n, self.phi, dt,
                                       name="backbone")(x, train)

        p5 = SPPCSPC(t * 16, dtype=dt, name="sppcspc")(feat3, train)      # :247,289
        p5_conv = BConv(t * 8, 1, 1, dt, name="conv_for_P5")(p5, train)   # :248
        p5_up = upsample_nearest_2x(p5_conv)
        p4 = jnp.concatenate(
            [BConv(t * 8, 1, 1, dt, name="conv_for_feat2")(feat2, train),
             p5_up], -1)                                                   # :292
        p4 = Block(panet * 4, t * 8, n, e, ids, dt,
                   name="conv3_for_upsample1")(p4, train)                  # :250-251

        p4_conv = BConv(t * 4, 1, 1, dt, name="conv_for_P4")(p4, train)   # :253
        p4_up = upsample_nearest_2x(p4_conv)
        p3 = jnp.concatenate(
            [BConv(t * 4, 1, 1, dt, name="conv_for_feat1")(feat1, train),
             p4_up], -1)                                                   # :297
        p3 = Block(panet * 2, t * 4, n, e, ids, dt,
                   name="conv3_for_upsample2")(p3, train)                  # :255-256

        p3_ds = Transition(t * 4, dt, name="down_sample1")(p3, train)     # :258
        p4 = jnp.concatenate([p3_ds, p4], -1)                              # :301
        p4 = Block(panet * 4, t * 8, n, e, ids, dt,
                   name="conv3_for_downsample1")(p4, train)                # :259-260

        p4_ds = Transition(t * 8, dt, name="down_sample2")(p4, train)     # :262
        p5 = jnp.concatenate([p4_ds, p5], -1)                              # :305
        p5 = Block(panet * 8, t * 16, n, e, ids, dt,
                   name="conv3_for_downsample2")(p5, train)                # :263-264

        rep3 = pyr_conv(t * 4, t * 8, "rep_conv_1")(p3, train)            # :266,308
        rep4 = pyr_conv(t * 8, t * 16, "rep_conv_2")(p4, train)
        rep5 = pyr_conv(t * 16, t * 32, "rep_conv_3")(p5, train)

        hdt = self.head_dtype
        out2 = logit_conv2d(self, rep3, no, "yolo_head_P3", dt, hdt)
        out1 = logit_conv2d(self, rep4, no, "yolo_head_P4", dt, hdt)
        out0 = logit_conv2d(self, rep5, no, "yolo_head_P5", dt, hdt)

        def shape5(y):
            bs, h, w, _ = y.shape
            return y.reshape(bs, h, w, self.anchors_per_level,
                             5 + self.num_classes)
        # reference output order (P5, P4, P3); yolo_net.py:315-327
        return [shape5(out0), shape5(out1), shape5(out2)]


class LayoutBody(nn.Module):
    """backbone + SPPCSPC -> flatten -> Dense(16); layout (chip-grab) model,
    nets/layout.py:18-57."""
    phi: str = "l"
    out_features: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = {"l": 4, "x": 40}[self.phi]          # layout.py:25 uses tiny widths
        n = {"l": 4, "x": 6}[self.phi]
        _, _, feat3 = Backbone(t, 16, n, self.phi, self.dtype,
                               name="backbone")(x, train)
        p5 = SPPCSPC(t * 16, dtype=self.dtype, name="sppcspc")(feat3, train)
        p5 = BConv(t * 8, 1, 1, self.dtype, name="conv_for_P5")(p5, train)
        f = p5.reshape(p5.shape[0], -1)
        return nn.Dense(self.out_features, dtype=self.dtype,
                        param_dtype=jnp.float32, name="dense")(f)
