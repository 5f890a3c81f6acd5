"""YAML-driven model builder.

Parity target: ``nets/yolo.py:15-153`` (``parse_model`` + ``Model``).

Differences by design (TPU-first):
- **registry lookup instead of eval()** — the reference ``eval()``s module
  names and arg strings straight from YAML (``nets/yolo.py:22-28``, a
  security wart flagged in SURVEY §5); here a fixed parser maps names and
  arg strings (``None``, ``nn.LeakyReLU(0.1)``, ``nc``, ``anchors`` ...) to
  values.
- the graph walk (``nets/yolo.py:143-153``) happens at **trace time**: the
  whole network is one static XLA graph; the save-list routing is plain
  Python during tracing.
- strides are propagated at build time so the head always knows its
  per-level stride (fixes ``nets/idetect.py:8``'s never-set ``stride``).

The two shipped architecture YAMLs (``cfg/net/yolov7.yaml``,
``cfg/net/yolov7-tiny.yaml``) parse unchanged.
"""
from __future__ import annotations

import ast
import copy
import math
import re
from dataclasses import dataclass
from typing import Any, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from . import layers as L
from .heads import HEAD_NAMES, Detect, IAuxDetect, IBin, IDetect, head_output_order


def make_divisible(x, divisor):
    return math.ceil(x / divisor) * divisor


# ---------------------------------------------------------------------------
# arg parsing (replaces eval(); nets/yolo.py:22-28)
# ---------------------------------------------------------------------------

_LEAKY_RE = re.compile(r"nn\.LeakyReLU\(\s*([0-9.eE+-]+)\s*\)")


def parse_arg(a, nc=None, anchors=None):
    if not isinstance(a, str):
        return a
    s = a.strip()
    if s == "None":
        return None
    if s in ("nc", "num_classes"):
        return nc
    if s == "anchors":
        return anchors
    m = _LEAKY_RE.fullmatch(s)
    if m:
        return ("leaky_relu", float(m.group(1)))
    if s in ("nn.SiLU()", "SiLU()"):
        return "silu"
    if s in ("nn.ReLU()", "ReLU()"):
        return "relu"
    if s in ("nn.Identity()", "Identity()"):
        return "identity"
    if s in ("nn.Hardswish()",):
        return "hardswish"
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s  # e.g. 'nearest'


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


# ---------------------------------------------------------------------------
# channel / stride propagation (nets/yolo.py:30-87)
# ---------------------------------------------------------------------------

# modules whose first YAML arg is c2 and that receive (c1, c2, ...) —
# nets/yolo.py:31-39
CONV_LIKE = {
    "nn.Conv2d", "Conv", "RobustConv", "RobustConv2", "dw_conv", "DWConv", "GhostConv",
    "RepConv", "DownC", "SPP", "SPPF", "SPPCSPC", "GhostSPPCSPC", "Focus", "Stem",
    "GhostStem", "Bottleneck", "BottleneckCSPA", "BottleneckCSPB", "BottleneckCSPC",
    "RepBottleneck", "RepBottleneckCSPA", "RepBottleneckCSPB", "RepBottleneckCSPC",
    "Res", "ResCSPA", "ResCSPB", "ResCSPC", "RepRes", "RepResCSPA", "RepResCSPB",
    "RepResCSPC", "ResX", "ResXCSPA", "ResXCSPB", "ResXCSPC", "RepResX",
    "RepResXCSPA", "RepResXCSPB", "RepResXCSPC", "Ghost", "GhostCSPA", "GhostCSPB",
    "GhostCSPC",
}

# modules that get the repeat count n inserted as args[2] — nets/yolo.py:45-54
CSP_LIKE = {
    "DownC", "SPPCSPC", "GhostSPPCSPC",
    "BottleneckCSPA", "BottleneckCSPB", "BottleneckCSPC",
    "RepBottleneckCSPA", "RepBottleneckCSPB", "RepBottleneckCSPC",
    "ResCSPA", "ResCSPB", "ResCSPC", "RepResCSPA", "RepResCSPB", "RepResCSPC",
    "ResXCSPA", "ResXCSPB", "ResXCSPC", "RepResXCSPA", "RepResXCSPB", "RepResXCSPC",
    "GhostCSPA", "GhostCSPB", "GhostCSPC",
}

# spatial stride multiplier per module type (for head stride inference)
_DOWN2 = {"Focus", "ReOrg", "Stem"}  # Stem is x4 actually; handled below


@dataclass(frozen=True)
class LayerSpec:
    i: int
    f: Union[int, Tuple[int, ...]]
    n: int
    name: str
    args: Tuple[Any, ...]   # parsed args EXCLUDING c1/c2 bookkeeping (raw YAML order)
    c1: Union[int, Tuple[int, ...]]
    c2: int


@dataclass(frozen=True)
class ModelSpec:
    layers: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]
    nc: int
    na: int
    head_name: str
    head_index: int
    # per OUTPUT level, in the head's output order:
    strides: Tuple[int, ...]
    anchors: Tuple[Tuple[Tuple[float, float], ...], ...]  # px @ config image size
    bin_count: int = 21


def _layer_stride_factor(name: str, args, c_in_stride: float) -> float:
    """Output stride relative to input for one layer."""
    if name in ("Conv", "nn.Conv2d", "RepConv", "RobustConv", "dw_conv", "DWConv",
                "GhostConv", "Focus"):
        s = 1
        if name == "nn.Conv2d":
            s = args[1] if len(args) > 1 else 1
        else:
            s = args[1] if len(args) > 1 else 1
        s = s if isinstance(s, int) else 1
        return float(s) * (2.0 if name == "Focus" else 1.0)
    if name == "RobustConv2":
        s = args[1] if len(args) > 1 else 4
        return float(s) / float(s)  # strided conv then deconv of same factor -> x1
    if name == "MP":
        k = args[0] if args else 2
        return float(k)
    if name == "DownC":
        k = args[1] if len(args) > 1 else 2
        return float(k)
    if name == "Stem" or name == "GhostStem":
        return 4.0
    if name == "ReOrg" or name == "Contract":
        g = args[0] if args else 2
        return float(g if name == "Contract" else 2)
    if name == "Expand":
        g = args[0] if args else 2
        return 1.0 / float(g)
    if name == "nn.Upsample":
        scale = args[1] if len(args) > 1 else 2
        return 1.0 / float(scale)
    if name == "Ghost":
        s = args[1] if len(args) > 1 else 1
        return float(s) if isinstance(s, int) else 1.0
    return 1.0


def build_model_spec(
    model_cfg: dict,
    image_chan: int,
    anchors,
    num_classes: int,
    anchors_mask=None,
) -> ModelSpec:
    """Interpret a net YAML (backbone + head rows) into a static ModelSpec.

    Mirrors the channel bookkeeping of ``parse_model`` (nets/yolo.py:15-87)
    row by row; additionally tracks spatial strides.
    """
    d = copy.deepcopy(model_cfg)
    gd, gw = d["depth_multiple"], d["width_multiple"]
    anchors_rows = [list(a) for a in anchors]
    na = len(anchors_rows[0]) // 2 if isinstance(anchors_rows[0], list) else 3
    no = na * (num_classes + 5)

    ch = [image_chan]
    strides = [1.0]
    specs = []
    save = set()
    head_name, head_index, head_from = None, -1, None
    bin_count = 21

    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, m, args) in enumerate(rows):
        name = m if isinstance(m, str) else m.__name__
        args = [parse_arg(a, nc=num_classes, anchors=anchors_rows) for a in args]
        n = max(round(n * gd), 1) if n > 1 else n  # depth gain (nets/yolo.py:30)

        fs = tuple(f) if isinstance(f, list) else f
        if name in CONV_LIKE:
            c1 = ch[fs]
            c2 = args[0]
            if c2 != no:  # nets/yolo.py:41-42
                c2 = make_divisible(c2 * gw, 8)
            rest = args[1:]
            if name in CSP_LIKE:
                # args.insert(2, n); n = 1 (nets/yolo.py:52-54)
                rest = [n] + rest
                n_repeat = 1
            else:
                n_repeat = n
            spec_args = tuple(_tuplify(v) for v in rest)
            specs.append(LayerSpec(i, fs, n_repeat, name, spec_args, c1, c2))
        elif name == "nn.BatchNorm2d":
            c1 = c2 = ch[fs]
            specs.append(LayerSpec(i, fs, n, name, (), c1, c2))
        elif name in ("Concat", "Chuncat"):
            c2 = sum(ch[x] for x in fs)
            specs.append(LayerSpec(i, fs, n, name, tuple(args), tuple(ch[x] for x in fs), c2))
        elif name == "Shortcut":
            c2 = ch[fs[0]]
            specs.append(LayerSpec(i, fs, n, name, tuple(args), tuple(ch[x] for x in fs), c2))
        elif name == "Foldcut":
            c1 = ch[fs]
            c2 = c1 // 2
            specs.append(LayerSpec(i, fs, n, name, tuple(args), c1, c2))
        elif name in HEAD_NAMES:
            ch_list = tuple(ch[x] for x in fs)
            head_name, head_index, head_from = name, i, fs
            if name == "IBin" and len(args) > 2 and isinstance(args[2], int):
                bin_count = args[2]
            c2 = no
            specs.append(LayerSpec(i, fs, n, name, tuple(_tuplify(v) for v in args), ch_list, c2))
        elif name == "ReOrg":
            c1 = ch[fs]
            c2 = c1 * 4
            specs.append(LayerSpec(i, fs, n, name, tuple(args), c1, c2))
        elif name == "Contract":
            c1 = ch[fs]
            c2 = c1 * args[0] ** 2
            specs.append(LayerSpec(i, fs, n, name, tuple(args), c1, c2))
        elif name == "Expand":
            c1 = ch[fs]
            c2 = c1 // args[0] ** 2
            specs.append(LayerSpec(i, fs, n, name, tuple(args), c1, c2))
        else:  # MP, SP, nn.Upsample, ImplicitA/M, TransformerBlock, ... (nets/yolo.py:75-76)
            c1 = ch[fs] if isinstance(fs, int) else ch[fs[0]]
            c2 = c1
            specs.append(LayerSpec(i, fs, n, name, tuple(_tuplify(v) for v in args), c1, c2))

        # stride propagation (extra vs reference: needed for head metadata)
        s_in = strides[fs] if isinstance(fs, int) else strides[fs[0]]
        s_out = s_in * _layer_stride_factor(
            name, args[1:] if name in CONV_LIKE else args, s_in)

        save.update(x % i for x in ([fs] if isinstance(fs, int) else fs) if x != -1)
        if i == 0:  # nets/yolo.py:84-86: ch[j] = layer j's output from here on
            ch = []
            strides = []
        ch.append(c2)
        strides.append(s_out)

    if head_name is None:
        raise ValueError("net YAML has no Detect/IDetect/IAuxDetect/IBin row")

    # strides[j] = output stride of layer j (after the i==0 reset above)
    nl = len(anchors_rows)
    in_strides = [int(round(strides[x])) for x in head_from]
    order = head_output_order(head_name, nl)
    flat = [v for row in anchors_rows for v in row]
    flat_pairs = [(float(flat[2 * j]), float(flat[2 * j + 1])) for j in range(len(flat) // 2)]
    if head_name == "Detect":
        # anchors via anchors_mask, P5-first (detect.py:42-43, yolo_loss.py:31-32)
        mask = anchors_mask if anchors_mask is not None else [[6, 7, 8], [3, 4, 5], [0, 1, 2]]
        out_anchors = tuple(tuple(flat_pairs[j] for j in mask[lv]) for lv in range(nl))
        out_strides = tuple(in_strides[order[lv]] for lv in range(nl))
    else:
        # anchor row i with input level i, output order = input order (idetect.py:17-20)
        rows_pairs = [
            tuple((float(r[2 * j]), float(r[2 * j + 1])) for j in range(len(r) // 2))
            for r in anchors_rows
        ]
        out_anchors = tuple(rows_pairs[lv] for lv in range(nl))
        out_strides = tuple(in_strides[lv] for lv in range(nl))

    return ModelSpec(
        layers=tuple(specs),
        save=tuple(sorted(save)),
        nc=num_classes,
        na=na,
        head_name=head_name,
        head_index=head_index,
        strides=out_strides,
        anchors=out_anchors,
        bin_count=bin_count,
    )


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------

def _def(args, idx, default):
    return args[idx] if len(args) > idx and args[idx] is not None else default


def _defn(args, idx, default):
    """Like _def but None stays None only for padding-style args."""
    return args[idx] if len(args) > idx else default


class YoloModel(nn.Module):
    """Static-graph interpreter model (nets/yolo.py:95-153, TPU-native).

    ``__call__(x NHWC, train)`` returns the head's list of raw maps
    ``(bs, h, w, na, no)`` in the head's canonical output order.
    """
    spec: ModelSpec
    dtype: Any = jnp.float32
    # detection-head logits accumulate and store in fp32 (mixed-precision
    # policy, layers.LogitConv): multiplies stay in the body dtype (MXU
    # bf16 speed) but the box/obj/cls LOGITS — whose precision directly
    # bounds mAP; a bf16 head costs ~0.05 mAP@0.5 in the parity A/B
    # (PARITY_AB.md) — come out of the fp32 MXU accumulator unrounded.
    # Set to jnp.bfloat16 to opt out (pure-bf16 benchmarking).
    head_dtype: Any = jnp.float32
    # serving option: eligible top-level 1x1 Conv tails run as the fused
    # Pallas matmul+BN+SiLU kernel at inference (layers.Conv.fused_tail)
    fused_tails: bool = False
    # train-step HBM-traffic option (plan key ``bn_remat``): BN+act tails
    # compute inside per-block jax.checkpoint chunks, so the backward
    # keeps only conv outputs as residuals (layers.bn_tail_remat)
    bn_remat: bool = False
    # int8 PTQ serving (layers.quant_ctx): None | "calib" | "int8".
    # "calib" records per-Conv activation max-abs into the "quant"
    # collection; "int8" runs symmetric int8 convs against it.
    quant_mode: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        with L.bn_tail_remat(self.bn_remat and train), \
                L.quant_ctx(None if train else self.quant_mode):
            return self._walk(x, train)

    def _walk(self, x, train: bool):
        saved = {}
        out = x.astype(self.dtype)
        for s in self.spec.layers:
            if s.f != -1:
                # negative indices are relative to the current layer
                # (nets/yolo.py:143-148 indexes the y-list directly)
                if isinstance(s.f, int):
                    out = saved[s.f % s.i]
                else:
                    out = [out if j == -1 else saved[j % s.i] for j in s.f]
            out = self._run_layer(s, out, train)
            if s.i in self.spec.save:
                saved[s.i] = out
        return out

    # -- dispatch ---------------------------------------------------------
    def _run_layer(self, s: LayerSpec, x, train: bool):
        name, a = s.name, s.args
        dt = self.dtype
        nm = f"l{s.i}_{name.replace('.', '_')}"

        def repeat(make_layer):
            y = x
            for r in range(s.n):
                y = make_layer(f"{nm}" if s.n == 1 else f"{nm}_r{r}")(y, train)
            return y

        if name == "Conv":
            return repeat(lambda n_: L.Conv(s.c2, _def(a, 0, 1), _def(a, 1, 1), _defn(a, 2, None),
                                            _def(a, 3, 1), _defn(a, 4, True), dt,
                                            fused_tail=self.fused_tails, name=n_))
        if name == "nn.Conv2d":
            k = _def(a, 0, 1)
            st = _def(a, 1, 1)
            p = _def(a, 2, 0)
            return L.conv2d(self, x, s.c2, k, st, p, bias=True, name=nm, dtype=dt)
        if name in ("dw_conv", "DWConv"):
            return repeat(lambda n_: L.DWConv(s.c1, s.c2, _def(a, 0, 1), _def(a, 1, 1),
                                              _defn(a, 2, True), dt, name=n_))
        if name == "RobustConv":
            return repeat(lambda n_: L.RobustConv(s.c1, s.c2, _def(a, 0, 7), _def(a, 1, 1),
                                                  _defn(a, 2, None), _def(a, 3, 1), _defn(a, 4, True),
                                                  _def(a, 5, 1e-6), dt, name=n_))
        if name == "RobustConv2":
            return repeat(lambda n_: L.RobustConv2(s.c1, s.c2, _def(a, 0, 7), _def(a, 1, 4),
                                                   _defn(a, 2, None), _def(a, 3, 1), _defn(a, 4, True),
                                                   _def(a, 5, 1e-6), dt, name=n_))
        if name == "GhostConv":
            return repeat(lambda n_: L.GhostConv(s.c2, _def(a, 0, 1), _def(a, 1, 1), _def(a, 2, 1),
                                                 _defn(a, 3, True), dt, name=n_))
        if name == "RepConv":
            return repeat(lambda n_: L.RepConv(s.c1, s.c2, _def(a, 0, 3), _def(a, 1, 1),
                                               _defn(a, 2, None), _def(a, 3, 1), _defn(a, 4, True),
                                               _def(a, 5, False), dt, name=n_))
        if name == "DownC":
            return L.DownC(s.c1, s.c2, _def(a, 0, 1), _def(a, 1, 2), dt, name=nm)(x, train)
        if name == "SPP":
            return L.SPP(s.c1, s.c2, _def(a, 0, (5, 9, 13)), dt, name=nm)(x, train)
        if name == "SPPF":
            return L.SPPF(s.c1, s.c2, _def(a, 0, 5), dt, name=nm)(x, train)
        if name in ("SPPCSPC", "GhostSPPCSPC"):
            return L.SPPCSPC(s.c2, _def(a, 0, 1), _def(a, 1, False), _def(a, 2, 1),
                             _def(a, 3, 0.5), _def(a, 4, (5, 9, 13)), True, dt,
                             ghost=(name == "GhostSPPCSPC"), name=nm)(x, train)
        if name == "Focus":
            return repeat(lambda n_: L.Focus(s.c2, _def(a, 0, 1), _def(a, 1, 1), _defn(a, 2, None),
                                             _def(a, 3, 1), _defn(a, 4, True), dt, name=n_))
        if name in ("Stem", "GhostStem"):
            cls = L.Stem if name == "Stem" else L.GhostStem
            return cls(s.c2, _def(a, 0, 1), _def(a, 1, 1), _defn(a, 2, None), _def(a, 3, 1),
                       _defn(a, 4, True), dt, name=nm)(x, train)
        if name == "Bottleneck":
            return repeat(lambda n_: L.Bottleneck(s.c1, s.c2, _def(a, 0, True), _def(a, 1, 1),
                                                  _def(a, 2, 0.5), False, dt, name=n_))
        if name == "RepBottleneck":
            return repeat(lambda n_: L.Bottleneck(s.c1, s.c2, _def(a, 0, True), _def(a, 1, 1),
                                                  _def(a, 2, 0.5), True, dt, name=n_))
        if name in ("Res", "RepRes", "ResX", "RepResX"):
            g_default = 32 if "X" in name else 1
            return repeat(lambda n_: L.Res(s.c1, s.c2, _def(a, 0, True), _def(a, 1, g_default),
                                           _def(a, 2, 0.5), name.startswith("Rep"), dt, name=n_))
        if name == "Ghost":
            return repeat(lambda n_: L.Ghost(s.c1, s.c2, _def(a, 0, 3), _def(a, 1, 1), dt, name=n_))
        if name.endswith("CSPA") or name.endswith("CSPB") or name.endswith("CSPC"):
            topo = name[-1]  # A/B/C
            base = name[:-4]
            inner = {
                "Bottleneck": "bottleneck", "RepBottleneck": "rep_bottleneck",
                "Res": "res", "RepRes": "rep_res", "ResX": "resx", "RepResX": "rep_resx",
                "Ghost": "ghost",
            }[base]
            g_default = 32 if "X" in base else 1
            sc_default = False if topo == "B" else True
            cls = {"A": L.CSPA, "B": L.CSPB, "C": L.CSPC}[topo]
            return cls(s.c1, s.c2, _def(a, 0, 1), _def(a, 1, sc_default), _def(a, 2, g_default),
                       _def(a, 3, 0.5), inner, dt, name=nm)(x, train)
        if name == "MP":
            return L.mp(x, _def(a, 0, 2))
        if name == "SP":
            return L.sp(x, _def(a, 0, 3), _def(a, 1, 1))
        if name == "ReOrg":
            return L.reorg(x)
        if name == "Concat":
            return L.concat(x)
        if name == "Chuncat":
            return L.chuncat(x)
        if name == "Shortcut":
            return L.shortcut(x)
        if name == "Foldcut":
            return L.foldcut(x)
        if name == "Contract":
            return L.contract(x, _def(a, 0, 2))
        if name == "Expand":
            return L.expand(x, _def(a, 0, 2))
        if name == "nn.Upsample":
            scale = _def(a, 1, 2)
            assert scale == 2, "only 2x nearest upsample is used by the reference configs"
            return L.upsample_nearest_2x(x)
        if name == "nn.BatchNorm2d":
            return L.BatchNorm(name=nm)(x, train)
        if name == "ImplicitA":
            return L.ImplicitA(s.c2, name=nm)(x)
        if name == "ImplicitM":
            return L.ImplicitM(s.c2, name=nm)(x)
        if name == "TransformerBlock":
            return L.TransformerBlock(*a, dtype=dt, name=nm)(x, train)
        if name == "Classify":
            return L.Classify(s.c2, _def(a, 0, 1), _def(a, 1, 1), _defn(a, 2, None),
                              _def(a, 3, 1), dt, name=nm)(x, train)
        # heads multiply in the body dtype but accumulate/emit logits in
        # head_dtype (fp32 default) — MXU fp32 accumulation makes this
        # bf16-speed with fp32-precision logits (layers.LogitConv)
        hdt = self.head_dtype
        if name == "Detect":
            return Detect(self.spec.nc, self.spec.na, dt, hdt, name="detect")(x, train)
        if name == "IDetect":
            return IDetect(self.spec.nc, self.spec.na, dt, hdt, name="idetect")(x, train)
        if name == "IAuxDetect":
            return IAuxDetect(self.spec.nc, self.spec.na, len(self.spec.strides), dt,
                              hdt, name="iauxdetect")(x, train)
        if name == "IBin":
            return IBin(self.spec.nc, self.spec.na, self.spec.bin_count, dt, hdt,
                        name="ibin")(x, train)
        raise ValueError(f"unknown module {name!r} at layer {s.i}")


def build_model(model_cfg, anchors, num_classes, image_chan=3, anchors_mask=None,
                dtype=jnp.float32) -> YoloModel:
    """Convenience: cfg dict -> YoloModel (cf. Model.__init__, nets/yolo.py:95-112)."""
    spec = build_model_spec(model_cfg, image_chan, anchors, num_classes, anchors_mask)
    return YoloModel(spec=spec, dtype=dtype)


_HEAD_SCOPE = {"Detect": "detect", "IDetect": "idetect",
               "IAuxDetect": "iauxdetect", "IBin": "ibin"}


def model_info(spec: ModelSpec, params, image_size: int = 640):
    """Per-layer param/shape table rows — the ``Model.print_info``
    surface (nets/yolo.py:127-141): one row per YAML layer with
    [index, from, n, params, module, arguments] plus a summary dict.

    Param counts are read off the real flax param tree (top-level module
    scopes are ``l{i}_{Name}``, heads use their own scope), so the table
    always matches what the optimizer trains.
    """
    import jax
    import numpy as np

    def _count(tree):
        return int(sum(np.prod(x.shape) for x in
                       jax.tree_util.tree_leaves(tree)))

    rows = []
    total = 0
    for s in spec.layers:
        if s.name in _HEAD_SCOPE:
            scopes = [_HEAD_SCOPE[s.name]]
        else:
            base = f"l{s.i}_{s.name.replace('.', '_')}"
            scopes = [k for k in params
                      if k == base or k.startswith(base + "_r")]
        n_params = sum(_count(params[k]) for k in scopes if k in params)
        total += n_params
        rows.append({"i": s.i, "from": s.f, "n": s.n, "params": n_params,
                     "module": s.name, "arguments": list(s.args),
                     "out_ch": s.c2})
    # analytic MAC estimate: conv-dominated nets do ~2*params FLOPs per
    # output pixel; per-layer spatial size isn't tracked in the spec, so
    # this is a whole-model estimate at stride-8..32 head resolution
    # (reported as approximate, like the reference's thop fallback path)
    summary = {"layers": len(spec.layers), "parameters": total}
    return rows, summary


def model_gflops(model: "YoloModel", image_size: int = 640) -> float:
    """Exact conv/matmul GFLOPs of one inference forward at the given
    size (the reference reports thop-style MACs*2 in print_info;
    nets/yolo.py:127-141). Computed by walking the traced jaxpr's
    conv_general_dilated / dot_general equations — no compile, no
    backend init (shape-level tracing only)."""
    import jax
    import numpy as np

    c1 = model.spec.layers[0].c1
    x = jax.ShapeDtypeStruct((1, image_size, image_size, int(c1)),
                             jnp.float32)
    vars_shape = jax.eval_shape(lambda k, im: model.init(k, im, False),
                                jax.random.PRNGKey(0), x)
    jaxpr = jax.make_jaxpr(lambda v, im: model.apply(v, im, False))(
        vars_shape, x)

    def subjaxprs(v):
        if isinstance(v, jax.extend.core.Jaxpr):
            yield v
        elif isinstance(v, jax.extend.core.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, (list, tuple)):
            for item in v:
                yield from subjaxprs(item)

    def walk(jxp):
        total = 0
        for eqn in jxp.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                rhs = eqn.invars[1].aval     # (kh, kw, cin/g, cout)
                out = eqn.outvars[0].aval
                total += 2 * int(np.prod(out.shape)) * int(
                    np.prod(rhs.shape[:-1]))
            elif eqn.primitive.name == "dot_general":
                ((lc, _), _) = eqn.params["dimension_numbers"]
                lhs, out = eqn.invars[0].aval, eqn.outvars[0].aval
                k = int(np.prod([lhs.shape[d] for d in lc]))
                total += 2 * int(np.prod(out.shape)) * k
            for v in eqn.params.values():
                for sub in subjaxprs(v):
                    total += walk(sub)
        return total

    return walk(jaxpr.jaxpr) / 1e9


def format_model_info(spec: ModelSpec, params, image_size: int = 640,
                      model: "YoloModel" = None) -> str:
    rows, summary = model_info(spec, params, image_size)
    lines = [f"{'':>3}{'from':>18}{'n':>3}{'params':>10}  "
             f"{'module':<22}{'arguments'}"]
    for r in rows:
        lines.append(f"{r['i']:>3}{str(r['from']):>18}{r['n']:>3}"
                     f"{r['params']:>10}  {r['module']:<22}"
                     f"{r['arguments']}")
    tail = ""
    if model is not None:
        try:
            tail = (f", {model_gflops(model, image_size):.1f} GFLOPs "
                    f"@ {image_size}px")
        except Exception:
            pass
    lines.append(f"Model Summary: {summary['layers']} layers, "
                 f"{summary['parameters']} parameters{tail}")
    return "\n".join(lines)
