"""Module zoo (flax.linen, NHWC, TPU-first).

Re-implements every block of the reference zoo ``nets/common.py`` (825 LoC,
~45 classes) as functional linen modules:

- NHWC layout (TPU-native conv layout; the torch original is NCHW),
- explicit symmetric padding ``k//2`` so spatial alignment matches torch
  Conv2d exactly (XLA 'SAME' pads asymmetrically for even sizes),
- compute dtype configurable (bf16 on TPU), params + BatchNorm stats fp32,
- BatchNorm runs in fp32 regardless of compute dtype (torch semantics:
  default eps=1e-5, momentum=0.1 -> flax momentum=0.9),
- RepConv's train-time 3-branch form with a pure-weight-transform deploy
  fuse (see ``fuse.py``; reference ``nets/common.py:442-614``).

Each class cites its reference counterpart ``nets/common.py:<line>``.

Deliberate fix: ``ImplicitM`` initializes its multiplier around **1.0**
(``normal(1, 0.02)``). The reference inherits a porting bug from YOLOR and
draws it around 0 (``nets/common.py:429-439``), which would zero the head
output at init; upstream YOLOR uses mean=1.
"""
from __future__ import annotations

import contextlib
import math
from math import prod as np_prod
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

# Activation spec: True -> SiLU (reference default), a str name, or
# ("leaky_relu", slope) parsed from YAML strings like "nn.LeakyReLU(0.1)".
ActSpec = Union[bool, None, str, Tuple[str, float]]

Dtype = Any

normal_init = nn.initializers.normal(stddev=0.02)  # nets/yolo.py:120 conv init


def autopad(k: int, p: Optional[int] = None) -> int:
    """'same' padding for odd kernels; mirrors nets/common.py:7-11."""
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


# --------------------------------------------------------------------------
# BN-tail rematerialization (trace-time flag)
#
# The yolov7@640 train step is HBM-bound and XLA's autodiff materializes
# the BN+activation gradient chain of every conv block (the 3.57x
# fusion-headroom residue in reports/minimal_traffic.json: 34.4 GB of
# pre-fusion `mul` outputs alone). With the flag on, each BatchNorm
# computes its normalize+activation inside a per-block ``jax.checkpoint``
# chunk whose only saveables are the (c,)-sized batch stats — so the
# backward keeps just the CONV output as residual and re-derives the
# elementwise tail locally, where XLA fuses it into the gradient pass
# instead of round-tripping saved intermediates through HBM. Unlike the
# whole-forward ``remat`` plan key (measured SLOWER: 114.7 vs 73.6
# GB/step, reports/cost_analysis.json), the chunk is one block wide, so
# nothing expensive recomputes and nothing re-reads distant activations.
# Enable per-model via ``YoloModel(bn_remat=True)`` / plan key
# ``bn_remat``; numerics are identical (same ops, same order).
# --------------------------------------------------------------------------

_BN_TAIL_REMAT = [False]


@contextlib.contextmanager
def bn_tail_remat(enabled: bool):
    """Trace-time context: BatchNorm tails under this scope use the
    per-block checkpoint chunk (train mode only)."""
    prev = _BN_TAIL_REMAT[0]
    _BN_TAIL_REMAT[0] = bool(enabled)
    try:
        yield
    finally:
        _BN_TAIL_REMAT[0] = prev


# --------------------------------------------------------------------------
# int8 post-training quantization (trace-time mode flag)
#
# TPU-first serving lever: the v5e MXU multiplies int8 x int8 into int32
# natively at 2x the bf16 rate, and int8 activations halve conv HBM read
# traffic vs bf16. Symmetric PTQ: weights per-output-channel
# (max-abs/127, derived in-graph from the SAME fp32 params — checkpoints
# are unchanged), activations per-tensor with a calibration-recorded
# max-abs stored in the "quant" variable collection. BN + activation
# stay in the float path (their cost is epilogue-fused). Modes:
#   "calib" — normal float conv, but record amax(|x|) into "quant"
#   "int8"  — quantize x/w, integer conv, dequantize by (sx * sw)
# Enable via YoloModel(quant_mode=...) / Detector(quantize=True).
# --------------------------------------------------------------------------

_QUANT_MODE = [None]


@contextlib.contextmanager
def quant_ctx(mode):
    """Trace-time context: Conv blocks under this scope run the int8
    path ("int8"), or record activation scales ("calib")."""
    assert mode in (None, "calib", "int8"), mode
    prev = _QUANT_MODE[0]
    _QUANT_MODE[0] = mode
    try:
        yield
    finally:
        _QUANT_MODE[0] = prev


def apply_act(x: jnp.ndarray, act: ActSpec) -> jnp.ndarray:
    if act is True or act == "silu":
        return nn.silu(x)
    if isinstance(act, tuple) and act[0] == "leaky_relu":
        return nn.leaky_relu(x, negative_slope=act[1])
    if act == "leaky_relu":
        return nn.leaky_relu(x, negative_slope=0.01)
    if act == "relu":
        return nn.relu(x)
    if act == "hardswish":
        return nn.hard_swish(x)
    if act in (False, None, "identity"):
        return x
    raise ValueError(f"unknown activation spec {act!r}")


def conv2d(
    parent: nn.Module,
    x: jnp.ndarray,
    c2: int,
    k: int = 1,
    s: int = 1,
    p: Optional[int] = None,
    g: int = 1,
    bias: bool = False,
    name: str = "conv",
    dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """Plain conv with torch-style symmetric padding."""
    p = autopad(k, p)
    return nn.Conv(
        features=c2,
        kernel_size=(k, k),
        strides=(s, s),
        padding=[(p, p), (p, p)],
        feature_group_count=g,
        use_bias=bias,
        kernel_init=normal_init,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )(x)


class LogitConv(nn.Module):
    """1x1 detection-head conv: bf16 MXU multiplies, fp32 accumulate/out.

    The head logits' precision directly bounds mAP (PARITY_AB.md
    ablation: bf16 logits cost ~0.05 mAP@0.5), but full-fp32 head convs
    double the head's HBM read traffic. On TPU the MXU accumulates bf16
    products in fp32 natively, so ``preferred_element_type=float32``
    gives fp32-quality logits at bf16 speed: inputs/weights round to the
    multiply dtype (exactly the body's precision), accumulation and the
    stored output stay fp32.

    Parameter layout matches ``nn.Conv`` (kernel HWIO + bias), so the
    torch checkpoint importer and all param-tree tooling are unaffected.
    """
    features: int
    mult_dtype: Any = jnp.float32   # multiply dtype (the body's dtype)
    out_dtype: Any = jnp.float32    # accumulate / output dtype

    @nn.compact
    def __call__(self, x):
        c1 = x.shape[-1]
        # param stays (1,1,cin,cout) HWIO so checkpoints/torch-import see
        # a normal conv kernel; a 1x1 conv IS a matmul, and dot_general
        # (unlike conv_general_dilated) supports preferred_element_type
        # through its VJP — the backward multiplies run in mult_dtype too.
        kernel = self.param("kernel", normal_init,
                            (1, 1, c1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = jax.lax.dot_general(
            x.astype(self.mult_dtype), kernel[0, 0].astype(self.mult_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.out_dtype)
        return y + bias.astype(self.out_dtype)


def logit_conv2d(parent: nn.Module, x: jnp.ndarray, c2: int, name: str,
                 mult_dtype: Dtype, out_dtype: Dtype) -> jnp.ndarray:
    return LogitConv(c2, mult_dtype, out_dtype, name=name)(x)


class BatchNorm(nn.Module):
    """BatchNorm: fp32 statistics/params, elementwise math in the input dtype.

    torch-default hyperparameters (eps 1e-5, momentum 0.1 -> flax 0.9);
    scale init normal(1, 0.02) per nets/yolo.py:121-123.

    TPU note: flax's BatchNorm in fp32 would materialize an fp32 copy of
    every activation (2x HBM traffic on the bf16 path). Here only the
    channel reductions run in fp32; the normalize itself stays bf16 with
    fp32-folded (inv, shift) scalars broadcast per channel.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, act: ActSpec = None):
        # inner module named 'bn' keeps the parameter tree layout of the
        # previous flax.BatchNorm version (.../bn/bn/{scale,bias,mean,var})
        return _BNCore(self.momentum, self.epsilon, name="bn")(x, train, act)


class _BNCore(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, act: ActSpec = None):
        c = x.shape[-1]
        scale = self.param("scale", _bn_scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            if _BN_TAIL_REMAT[0]:
                out, mean, var = _bn_act_tail_remat(
                    x, scale, bias, self.epsilon, act)
            else:
                mean, var = _batch_stats(x)
                out = _normalize(x, scale, bias, mean, var,
                                 self.epsilon, act)
            if not self.is_initializing():
                m = self.momentum
                n = float(np_prod(x.shape[:-1]))
                unbiased = var * (n / max(n - 1.0, 1.0))  # torch running-var
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
            return out
        return _normalize(x, scale, bias, ra_mean.value, ra_var.value,
                          self.epsilon, act)


def _batch_stats(x):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes)
    mean2 = jnp.mean(jnp.square(xf), axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, var


def _normalize(x, scale, bias, mean, var, epsilon, act: ActSpec):
    inv = scale * jax.lax.rsqrt(var + epsilon)
    shift = bias - mean * inv
    return apply_act(x * inv.astype(x.dtype) + shift.astype(x.dtype), act)


def _bn_act_tail_remat(x, scale, bias, epsilon, act: ActSpec):
    """Per-block checkpoint chunk: batch stats + normalize + activation.

    Residuals kept for the backward: the chunk INPUTS (the conv output x,
    which is live anyway as the next conv's lhs, plus the two (c,) param
    vectors) and the checkpoint-named (c,)-sized batch stats. Everything
    else — x_hat, the pre-activation z, sigmoid(z), and the backward's
    elementwise mul chain — is recomputed inside the chunk, where it
    fuses into the single gradient pass over x/dy instead of being
    materialized to HBM by the forward."""

    def tail(x, scale, bias):
        mean, var = _batch_stats(x)
        mean = checkpoint_name(mean, "bn_stats")
        var = checkpoint_name(var, "bn_stats")
        return _normalize(x, scale, bias, mean, var, epsilon, act), mean, var

    tail = jax.checkpoint(
        tail, policy=jax.checkpoint_policies.save_only_these_names("bn_stats"))
    return tail(x, scale, bias)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def max_pool(x, k, s, p=0):
    # Non-overlapping pools (MP/DownC/Transition: k == s, no pad) reduce
    # over a reshaped window axis instead of lax.reduce_window: jnp.max's
    # VJP is elementwise (eq-mask, tie-splitting), while reduce_window's
    # is select_and_scatter — measured at 10.5 ms of the 100.8 ms
    # flagship train step on v5e (reports/profile_step.json). Forward
    # values are identical; on ties the gradient splits evenly instead
    # of routing to the first max (never hit with continuous inputs).
    if s == k and p == 0 and x.shape[1] % k == 0 and x.shape[2] % k == 0:
        b, h, w, c = x.shape
        return x.reshape(b, h // k, k, w // k, k, c).max(axis=(2, 4))
    pads = [(p, p), (p, p)]
    return nn.max_pool(x, window_shape=(k, k), strides=(s, s), padding=pads)


def upsample_nearest_2x(x):
    """nn.Upsample(None, 2, 'nearest'); exact torch-nearest on 2x."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


# --------------------------------------------------------------------------
# Parameter-free rearrangers (nets/common.py:25-95, 759-812)
# --------------------------------------------------------------------------

def mp(x, k: int = 2):
    """MP: maxpool k=s=2; nets/common.py:25-31."""
    return max_pool(x, k, k)


def sp(x, k: int = 3, s: int = 1):
    """SP: stride-1 maxpool, same-pad; nets/common.py:34-40.

    Separable form (k,1) then (1,k) — exact for max with -inf padding —
    cuts the window positions per element from k^2 to 2k. The profiled
    flagship step spent 9.8 ms/step in the SPPCSPC pools' backward
    select_and_scatter (reports/profile_step.json: 3 ops over a
    16x20x20x512 tensor — pure window-serialization cost, the tensor is
    6.6 MB), which scales with window positions."""
    if s == 1 and k > 1:
        p = k // 2
        x = nn.max_pool(x, window_shape=(k, 1), strides=(1, 1),
                        padding=[(p, p), (0, 0)])
        return nn.max_pool(x, window_shape=(1, k), strides=(1, 1),
                           padding=[(0, 0), (p, p)])
    return max_pool(x, k, s, k // 2)


def sp_pyramid(x, ks):
    """[sp(x, k) for k in ks], computed as a CASCADE when the ladder
    allows it: stride-1 max windows compose by radius addition
    (r=(k-1)/2), so the standard (5, 9, 13) pyramid is sp5(x),
    sp5(sp5(x)), sp5(sp5(sp5(x))) — value-identical to the direct pools
    (YOLOv5's SPPF identity; nets/common.py:771 uses the same fact) at
    a fraction of the window work. Falls back to direct pools for
    non-cascadable ladders."""
    ks = tuple(ks)
    outs, prev, prev_r = [], x, 0
    for k in ks:
        r = (k - 1) // 2
        step = r - prev_r
        if k % 2 == 1 and step > 0:
            prev = sp(prev, 2 * step + 1)
            prev_r = r
            outs.append(prev)
        else:   # non-monotone/even ladder: direct pool, no cascade
            outs.append(sp(x, k))
    return outs


def reorg(x):
    """ReOrg: space-to-depth 2x; nets/common.py:43-51 (NHWC here)."""
    return jnp.concatenate(
        [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1
    )


def concat(xs: Sequence[jnp.ndarray]):
    """Concat(dimension=1) == channel concat (NHWC axis -1); nets/common.py:54-60."""
    return jnp.concatenate(list(xs), axis=-1)


def chuncat(xs: Sequence[jnp.ndarray]):
    """nets/common.py:63-75."""
    x1 = [jnp.split(xi, 2, axis=-1)[0] for xi in xs]
    x2 = [jnp.split(xi, 2, axis=-1)[1] for xi in xs]
    return jnp.concatenate(x1 + x2, axis=-1)


def shortcut(xs: Sequence[jnp.ndarray]):
    """nets/common.py:78-84."""
    return xs[0] + xs[1]


def foldcut(x):
    """nets/common.py:87-94."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 + x2


def contract(x, gain: int = 2):
    """Contract w/h into channels; nets/common.py:787-798 (NHWC)."""
    n, h, w, c = x.shape
    s = gain
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h/s, w/s, s, s, c
    return x.reshape(n, h // s, w // s, c * s * s)


def expand(x, gain: int = 2):
    """Expand channels into w/h; nets/common.py:801-812 (NHWC)."""
    n, h, w, c = x.shape
    s = gain
    x = x.reshape(n, h, w, s, s, c // s ** 2)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h, s, w, s, c/s^2
    return x.reshape(n, h * s, w * s, c // s ** 2)


# --------------------------------------------------------------------------
# Conv family
# --------------------------------------------------------------------------

class _ConvKernelVars(nn.Module):
    """Param-layout twin of the ``conv2d`` nn.Conv scope (kernel only):
    lets the fused-tail / int8 inference branches read the SAME
    checkpoint tree (.../conv/kernel) without running the XLA conv."""
    c1: int          # cin per group
    c2: int
    k: int = 1

    @nn.compact
    def __call__(self):
        return self.param("kernel", normal_init,
                          (self.k, self.k, self.c1, self.c2), jnp.float32)


class _BNStatVars(nn.Module):
    """Param/stat-layout twin of ``_BNCore`` (.../bn/bn/{scale,bias,mean,var})
    for inference-time BN folding."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", _bn_scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean.value, var.value


class _BNStatVarsWrap(nn.Module):
    @nn.compact
    def __call__(self, c: int):
        return _BNStatVars(name="bn")(c)


class Conv(nn.Module):
    """Conv2d + BN + act; nets/common.py:97-109.

    ``fused_tail=True`` (serving option, round-3 verdict lever): at
    inference, eligible 1x1/stride-1/SiLU instances with C_in >=
    ``fused_tail_min_cin`` run as ONE Pallas MXU kernel — matmul +
    folded-BN scale/bias + SiLU in VMEM, one HBM round trip
    (kernels/fused_conv_pallas.py; measured 1.45x at 40x40x512->256,
    reports/fused_tail_bench.log). The parameter tree is identical to
    the normal branch, so any checkpoint serves either way."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: ActSpec = True
    dtype: Dtype = jnp.float32
    fused_tail: bool = False
    fused_tail_min_cin: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        mode = _QUANT_MODE[0]
        if mode is not None and not train:
            # the amax variable exists in BOTH quant modes so the
            # calibrated "quant" collection matches the int8 tree
            amax = self.variable("quant", "amax",
                                 lambda: jnp.zeros((), jnp.float32))
            if mode == "calib":
                if not self.is_initializing():
                    amax.value = jnp.maximum(
                        amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            else:  # int8
                p = autopad(self.k, self.p)
                kernel = _ConvKernelVars(x.shape[-1] // self.g, self.c2,
                                         self.k, name="conv")()
                sx = jnp.maximum(amax.value, 1e-12) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
                sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
                sw = jnp.maximum(sw, 1e-12)
                wq = jnp.clip(jnp.round(kernel / sw),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xq, wq, (self.s, self.s), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=self.g,
                    preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32) * (sx * sw)).astype(self.dtype)
                return BatchNorm(name="bn")(y, False, act=self.act)
        if (self.fused_tail and not train and self.k == 1 and self.s == 1
                and self.g == 1 and self.act is True
                and x.shape[-1] >= self.fused_tail_min_cin):
            from ..kernels.fused_conv_pallas import fused_pointwise_conv
            kernel = _ConvKernelVars(x.shape[-1], self.c2, name="conv")()
            scale, bias, mean, var = _BNStatVarsWrap(name="bn")(self.c2)
            inv = scale * jax.lax.rsqrt(var + 1e-5)   # BatchNorm.epsilon
            shift = bias - mean * inv
            return fused_pointwise_conv(
                x.astype(self.dtype), kernel[0, 0].astype(self.dtype),
                inv, shift, interpret=jax.default_backend() != "tpu")
        x = conv2d(self, x, self.c2, self.k, self.s, self.p, self.g, dtype=self.dtype)
        # activation applied inside BatchNorm so the bn_remat chunk spans
        # the whole elementwise tail (identical math either way)
        return BatchNorm(name="bn")(x, train, act=self.act)


class DWConv(nn.Module):
    """dw_conv: depthwise-ish conv, groups=gcd(c1,c2); nets/common.py:20-22."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    act: ActSpec = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(self.c1, self.c2)
        return Conv(self.c2, self.k, self.s, None, g, self.act, self.dtype, name="conv")(x, train)


class RobustConv(nn.Module):
    """depthwise k + pointwise 1x1 + layer-scale; nets/common.py:112-124."""
    c1: int
    c2: int
    k: int = 7
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: ActSpec = True
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c1, self.k, self.s, self.p, self.c1, self.act, self.dtype, name="conv_dw")(x, train)
        x = conv2d(self, x, self.c2, 1, 1, 0, 1, bias=True, name="conv1x1", dtype=self.dtype)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.c2,), jnp.float32
            )
            x = x * gamma.astype(x.dtype)
        return x


class RobustConv2(nn.Module):
    """strided depthwise + transposed-conv upsample; nets/common.py:127-139."""
    c1: int
    c2: int
    k: int = 7
    s: int = 4
    p: Optional[int] = None
    g: int = 1
    act: ActSpec = True
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c1, self.k, self.s, self.p, self.c1, self.act, self.dtype, name="conv_strided")(x, train)
        x = nn.ConvTranspose(
            features=self.c2,
            kernel_size=(self.s, self.s),
            strides=(self.s, self.s),
            padding="VALID",
            use_bias=True,
            kernel_init=normal_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv_deconv",
        )(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.c2,), jnp.float32
            )
            x = x * gamma.astype(x.dtype)
        return x


class GhostConv(nn.Module):
    """half features + cheap 5x5 depthwise ghosts; nets/common.py:142-152."""
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: ActSpec = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, self.act, self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, self.act, self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class Stem(nn.Module):
    """4-conv + pool stem; nets/common.py:155-168."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: ActSpec = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 / 2)
        x = Conv(c_, 3, 2, dtype=self.dtype, name="cv1")(x, train)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        a = Conv(c_, 3, 2, dtype=self.dtype, name="cv3")(a, train)
        b = max_pool(x, 2, 2)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate([a, b], -1), train)


class GhostStem(nn.Module):
    """Stem with GhostConvs; nets/common.py:283-291."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: ActSpec = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 / 2)
        x = GhostConv(c_, 3, 2, dtype=self.dtype, name="cv1")(x, train)
        a = GhostConv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        a = GhostConv(c_, 3, 2, dtype=self.dtype, name="cv3")(a, train)
        b = max_pool(x, 2, 2)
        return GhostConv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate([a, b], -1), train)


class DownC(nn.Module):
    """conv-downsample || maxpool-conv concat; nets/common.py:171-182."""
    c1: int
    c2: int
    n: int = 1
    k: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Conv(self.c1, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a = Conv(self.c2 // 2, 3, self.k, dtype=self.dtype, name="cv2")(a, train)
        b = max_pool(x, self.k, self.k)
        b = Conv(self.c2 // 2, 1, 1, dtype=self.dtype, name="cv3")(b, train)
        return jnp.concatenate([a, b], axis=-1)


# --------------------------------------------------------------------------
# SPP family
# --------------------------------------------------------------------------

class SPP(nn.Module):
    """nets/common.py:185-196."""
    c1: int
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [x] + sp_pyramid(x, self.k)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class SPPF(nn.Module):
    """cascaded-5 SPP; nets/common.py:771-784."""
    c1: int
    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = sp(x, self.k)
        y2 = sp(y1, self.k)
        y3 = sp(y2, self.k)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([x, y1, y2, y3], -1), train)


class SPPCSPC(nn.Module):
    """CSP-SPP used by yolov7 head; nets/common.py:248-266."""
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: Tuple[int, ...] = (5, 9, 13)
    act: ActSpec = True
    dtype: Dtype = jnp.float32
    ghost: bool = False  # GhostSPPCSPC variant (nets/common.py:269-280)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        CV = (lambda c, k, s, name: GhostConv(c, k, s, dtype=self.dtype, name=name)) if self.ghost \
            else (lambda c, k, s, name: Conv(c, k, s, act=self.act, dtype=self.dtype, name=name))
        x1 = CV(c_, 1, 1, "cv1")(x, train)
        x1 = CV(c_, 3, 1, "cv3")(x1, train)
        x1 = CV(c_, 1, 1, "cv4")(x1, train)
        ys = [x1] + sp_pyramid(x1, self.k)
        y1 = CV(c_, 1, 1, "cv5")(jnp.concatenate(ys, -1), train)
        y1 = CV(c_, 3, 1, "cv6")(y1, train)
        y2 = CV(c_, 1, 1, "cv2")(x, train)
        return CV(self.c2, 1, 1, "cv7")(jnp.concatenate([y1, y2], -1), train)


# --------------------------------------------------------------------------
# Bottleneck / Res / Ghost elementary blocks
# --------------------------------------------------------------------------

class Bottleneck(nn.Module):
    """Darknet bottleneck; nets/common.py:199-209."""
    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    rep: bool = False  # RepBottleneck (nets/common.py:617-622): cv2 is a RepConv
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        if self.rep:
            y = RepConv(c_, self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        else:
            y = Conv(self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and self.c1 == self.c2) else y


class Res(nn.Module):
    """ResNet bottleneck; nets/common.py:212-223."""
    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    rep: bool = False  # RepRes (nets/common.py:649-654): cv2 is a RepConv
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        if self.rep:
            y = RepConv(c_, c_, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        else:
            y = Conv(c_, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)
        return x + y if (self.shortcut and self.c1 == self.c2) else y


class Ghost(nn.Module):
    """Ghost bottleneck; nets/common.py:233-245."""
    c1: int
    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="conv0")(x, train)
        if self.s == 2:
            y = DWConv(c_, c_, self.k, self.s, act=False, dtype=self.dtype, name="conv1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="conv2")(y, train)
        if self.s == 2:
            sc = DWConv(self.c1, self.c1, self.k, self.s, act=False, dtype=self.dtype, name="short0")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="short1")(sc, train)
        else:
            sc = x
        return y + sc


# --------------------------------------------------------------------------
# CSP wrappers (A/B/C topologies x {Bottleneck, Res, ResX, Ghost, Rep*})
# nets/common.py:294-413, 625-710
# --------------------------------------------------------------------------

def _inner_block(kind: str, c_: int, shortcut: bool, g: int, dtype, name: str):
    """The repeated block inside a CSP 'm' chain, with the reference's e values."""
    if kind == "bottleneck":
        return Bottleneck(c_, c_, shortcut, g, e=1.0, dtype=dtype, name=name)
    if kind == "rep_bottleneck":
        return Bottleneck(c_, c_, shortcut, g, e=1.0, rep=True, dtype=dtype, name=name)
    if kind == "res":
        return Res(c_, c_, shortcut, g, e=0.5, dtype=dtype, name=name)
    if kind == "rep_res":
        return Res(c_, c_, shortcut, g, e=0.5, rep=True, dtype=dtype, name=name)
    if kind == "resx":  # ResXCSP* uses e=1.0 inner (nets/common.py:368-389)
        return Res(c_, c_, shortcut, g, e=1.0, dtype=dtype, name=name)
    if kind == "rep_resx":
        return Res(c_, c_, shortcut, g, e=0.5, rep=True, dtype=dtype, name=name)
    if kind == "ghost":
        return Ghost(c_, c_, dtype=dtype, name=name)
    raise ValueError(kind)


class CSPA(nn.Module):
    """CSP topology A; nets/common.py:294-307."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    inner: str = "bottleneck"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = _inner_block(self.inner, c_, self.shortcut, self.g, self.dtype, f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


class CSPB(nn.Module):
    """CSP topology B (c_ = c2, both paths from cv1); nets/common.py:310-324."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    inner: str = "bottleneck"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = x1
        for i in range(self.n):
            y1 = _inner_block(self.inner, c_, self.shortcut, self.g, self.dtype, f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x1, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


class CSPC(nn.Module):
    """CSP topology C (extra cv3 on the m path); nets/common.py:327-341."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    inner: str = "bottleneck"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = _inner_block(self.inner, c_, self.shortcut, self.g, self.dtype, f"m{i}")(y1, train)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv3")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate([y1, y2], -1), train)


# --------------------------------------------------------------------------
# Implicit knowledge (YOLOR); nets/common.py:416-439
# --------------------------------------------------------------------------

class ImplicitA(nn.Module):
    """Learned additive prior, init normal(0, 0.02); nets/common.py:416-426."""
    channel: int
    mean: float = 0.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x):
        imp = self.param(
            "implicit",
            lambda k, s: self.mean + jax.random.normal(k, s) * self.std,
            (1, 1, 1, self.channel),
        )
        return x + imp.astype(x.dtype)


class ImplicitM(nn.Module):
    """Learned multiplicative prior, init normal(1, 0.02).

    nets/common.py:429-439 draws around 0 (porting bug vs upstream YOLOR,
    which uses mean=1); fixed deliberately here.
    """
    channel: int
    mean: float = 1.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x):
        imp = self.param(
            "implicit",
            lambda k, s: self.mean + jax.random.normal(k, s) * self.std,
            (1, 1, 1, self.channel),
        )
        return x * imp.astype(x.dtype)


# --------------------------------------------------------------------------
# RepConv; nets/common.py:442-614
# --------------------------------------------------------------------------

class RepConv(nn.Module):
    """3-branch re-parameterizable conv (RepVGG-style).

    Train form: conv3x3+BN + conv1x1+BN + (BN identity if c1==c2, s==1).
    Deploy form: one biased conv3x3 (weights produced by fuse.fuse_repconv).
    """
    c1: int
    c2: int
    k: int = 3
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: ActSpec = True
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.k == 3 and autopad(self.k, self.p) == 1
        if self.deploy:
            y = conv2d(self, x, self.c2, 3, self.s, 1, self.g, bias=True,
                       name="rbr_reparam", dtype=self.dtype)
            return apply_act(y, self.act)
        dense = conv2d(self, x, self.c2, 3, self.s, 1, self.g, name="rbr_dense_conv", dtype=self.dtype)
        dense = BatchNorm(name="rbr_dense_bn")(dense, train)
        one = conv2d(self, x, self.c2, 1, self.s, 0, self.g, name="rbr_1x1_conv", dtype=self.dtype)
        one = BatchNorm(name="rbr_1x1_bn")(one, train)
        if self.c2 == self.c1 and self.s == 1:
            ident = BatchNorm(name="rbr_identity")(x, train)
        else:
            ident = 0.0
        return apply_act(dense + one + ident, self.act)


# --------------------------------------------------------------------------
# Transformer (unused by shipped configs but part of the zoo);
# nets/common.py:713-756
# --------------------------------------------------------------------------

class TransformerLayer(nn.Module):
    """LayerNorm-free transformer layer; nets/common.py:713-727."""
    c: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (tokens, batch, c)
        dense = lambda name: nn.Dense(self.c, use_bias=False, kernel_init=normal_init,
                                      dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("q")(x), dense("k")(x), dense("v")(x)
        # torch MultiheadAttention: in/out projections with bias
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c, out_features=self.c,
            dtype=self.dtype, param_dtype=jnp.float32, name="ma",
        )(q, k, v)
        x = attn + x
        x = dense("fc2")(dense("fc1")(x)) + x
        return x


class TransformerBlock(nn.Module):
    """ViT block over the spatial grid; nets/common.py:730-756."""
    c1: int
    c2: int
    num_heads: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # NHWC
        if self.c1 != self.c2:
            x = Conv(self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c).transpose(1, 0, 2)  # (tokens, batch, c)
        e = nn.Dense(self.c2, kernel_init=normal_init, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear")(p)
        x = p + e
        for i in range(self.num_layers):
            x = TransformerLayer(self.c2, self.num_heads, self.dtype, name=f"tr{i}")(x)
        return x.transpose(1, 0, 2).reshape(b, h, w, self.c2)


# --------------------------------------------------------------------------
# Misc heads/stems; nets/common.py:759-825
# --------------------------------------------------------------------------

class Focus(nn.Module):
    """space-to-depth + conv; nets/common.py:759-768."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: ActSpec = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(self.c2, self.k, self.s, self.p, self.g, self.act, self.dtype, name="conv")(reorg(x), train)


class Classify(nn.Module):
    """global-avg-pool classification head; nets/common.py:815-825."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = x if isinstance(x, (list, tuple)) else [x]
        z = jnp.concatenate([jnp.mean(y, axis=(1, 2), keepdims=True) for y in xs], axis=-1)
        z = conv2d(self, z, self.c2, self.k, self.s, self.p, self.g, bias=True, dtype=self.dtype)
        return z.reshape(z.shape[0], -1)
