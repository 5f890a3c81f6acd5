"""Import torch reference checkpoints into this framework's parameters.

Maps a ``state_dict`` produced by the reference ``nets/yolo.Model`` (the
format its ``torch.save(net.state_dict())`` writes, ``train.py:116``)
onto a ``YoloModel``'s (params, batch_stats) trees, converting layouts:

- Conv2d weight (cout, cin/g, kh, kw) -> flax (kh, kw, cin/g, cout)
- Linear weight (out, in) -> (in, out)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
- ImplicitA/M (1, c, 1, 1) -> (1, 1, 1, c)

Name translation is rule-based from our parameter paths:
``l{i}_{Type}[_r{k}]/...`` -> ``model.{i}[.{k}]....`` with a handful of
structural rewrites (our BatchNorm nests as ``bn/bn``; RepConv's branch
Sequentials become ``_conv``/``_bn`` pairs; head modules carry the layer
index from the spec). Unmatched names fall back to dropping wrapper path
segments, which covers DWConv-style wrapping.

This both lets users carry reference-trained weights over AND serves as
the strongest possible parity check: identical outputs on identical
inputs (tests/test_torch_import.py).
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import numpy as np

from ..nn.builder import ModelSpec

_LEAF_BN = {"scale": "weight", "bias": "bias", "mean": "running_mean",
            "var": "running_var"}


def _rewrite_tokens(rest):
    """Common our-path -> torch-path token rewrites (shared by the YAML
    family and the hard-coded YoloBody/Backbone family)."""
    out = []
    i = 0
    while i < len(rest):
        t = rest[i]
        # our BatchNorm wrapper nests an inner module also named 'bn'
        if t == "bn" and i + 1 < len(rest) and rest[i + 1] == "bn":
            out.append("bn")
            i += 2
            continue
        # RepConv branches: Sequential(conv, bn) in torch
        if t == "rbr_dense_conv":
            out.append("rbr_dense.0")
        elif t == "rbr_dense_bn":
            out.append("rbr_dense.1")
            if i + 1 < len(rest) and rest[i + 1] == "bn":
                i += 1  # its BatchNorm wrapper adds another 'bn'
        elif t == "rbr_1x1_conv":
            out.append("rbr_1x1.0")
        elif t == "rbr_1x1_bn":
            out.append("rbr_1x1.1")
            if i + 1 < len(rest) and rest[i + 1] == "bn":
                i += 1
        elif t == "rbr_identity":
            out.append("rbr_identity")
            if i + 1 < len(rest) and rest[i + 1] == "bn":
                i += 1
        # Detect head conv names
        elif t in ("head_p3", "head_p4", "head_p5"):
            out.append("yolo_head_" + t[-2:].upper())
        # IDetect/IBin/IAux lists: m0 -> m.0, ia0 -> ia.0, im0 -> im.0
        elif re.fullmatch(r"(m2?|ia|im)\d+", t):
            mm = re.fullmatch(r"(m2?|ia|im)(\d+)", t)
            out.append(f"{mm.group(1)}.{mm.group(2)}")
        elif re.fullmatch(r"m2_(\d+)", t):
            out.append(f"m2.{t.split('_')[1]}")
        # CSP inner chain: m0 -> m.0
        elif re.fullmatch(r"m\d+", t):
            out.append(f"m.{t[1:]}")
        # Ghost bottleneck: conv0/conv2 -> conv.0/conv.2; short -> shortcut
        elif re.fullmatch(r"conv\d+", t):
            out.append(f"conv.{t[4:]}")
        elif re.fullmatch(r"short\d+", t):
            out.append(f"shortcut.{t[5:]}")
        else:
            out.append(t)
        i += 1
    return out


_LEAF_TORCH = {"kernel": "weight", "scale": "weight", "mean": "running_mean",
               "var": "running_var"}


def _candidates(path_tokens, leaf, spec: ModelSpec):
    """Generate candidate torch keys (most-specific first) for one of our
    parameter paths."""
    toks = list(path_tokens)
    head_names = {"detect", "idetect", "iauxdetect", "ibin"}

    # layer prefix
    m = re.match(r"l(\d+)_(.+?)(?:_r(\d+))?$", toks[0])
    if m:
        prefix = f"model.{m.group(1)}"
        if m.group(3) is not None:
            prefix += f".{m.group(3)}"
        rest = toks[1:]
    elif toks[0] in head_names:
        prefix = f"model.{spec.head_index}"
        rest = toks[1:]
    else:
        prefix = toks[0]
        rest = toks[1:]

    leaf_t = _LEAF_TORCH.get(leaf, leaf)
    base = _rewrite_tokens(rest)
    cands = []
    cands.append(".".join([prefix] + base + [leaf_t]))
    # wrapper-collapse fallbacks: drop one intermediate token at a time
    for drop in range(len(base)):
        reduced = base[:drop] + base[drop + 1:]
        cands.append(".".join([prefix] + reduced + [leaf_t]))
    return cands


def _convert_value(leaf: str, ours: np.ndarray, theirs: np.ndarray) -> np.ndarray:
    t = np.asarray(theirs)
    if leaf == "kernel":
        if t.ndim == 4:       # conv (cout, cin/g, kh, kw) -> (kh, kw, cin/g, cout)
            t = t.transpose(2, 3, 1, 0)
        elif t.ndim == 2:     # linear (out, in) -> (in, out)
            t = t.transpose(1, 0)
    if leaf == "implicit" and t.ndim == 4:  # (1, c, 1, 1) -> (1, 1, 1, c)
        t = t.transpose(0, 2, 3, 1)
    if t.shape != tuple(ours.shape):
        raise ValueError(f"shape mismatch: ours {ours.shape} theirs {t.shape}")
    return t.astype(np.asarray(ours).dtype)


def convert_state_dict(
    state_dict: Dict[str, np.ndarray],
    spec: ModelSpec,
    params,
    batch_stats,
    strict: bool = True,
) -> Tuple[Dict, Dict]:
    """Fill our (params, batch_stats) trees from a torch state_dict."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()

    def fill(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, val in flat:
            toks = [p.key for p in path]
            leaf = toks[-1]
            found = None
            for cand in _candidates(toks[:-1], leaf, spec):
                if cand in sd:
                    found = cand
                    break
            if found is None:
                if strict:
                    raise KeyError(
                        f"no torch key for {'/'.join(toks)}; tried "
                        f"{_candidates(toks[:-1], leaf, spec)[:3]}...")
                out["/".join(toks)] = np.asarray(val)
                continue
            used.add(found)
            out["/".join(toks)] = _convert_value(leaf, np.asarray(val), sd[found])
        return out

    flat_p = fill(params)
    flat_b = fill(batch_stats)

    def unflatten(tree, flat):
        def visit(sub, prefix):
            if isinstance(sub, dict):
                return {k: visit(v, prefix + [k]) for k, v in sub.items()}
            return flat["/".join(prefix)]
        return visit(tree, [])

    # 'num_batches_tracked' entries are expected leftovers
    leftovers = [k for k in sd if k not in used
                 and not k.endswith("num_batches_tracked")]
    if strict and leftovers:
        raise KeyError(f"unconsumed torch keys: {leftovers[:5]} "
                       f"({len(leftovers)} total)")
    return unflatten(params, flat_p), unflatten(batch_stats, flat_b)


def load_torch_checkpoint(path: str, spec: ModelSpec, params, batch_stats,
                          strict: bool = True):
    """Load a ``.pth`` state_dict file (torch required only here)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_state_dict(sd, spec, params, batch_stats, strict)


# ---------------------------------------------------------------------------
# hard-coded family (nn/yolo_body.py): YoloBody / Backbone checkpoints
# ---------------------------------------------------------------------------

def _body_candidates(path_tokens, leaf):
    """Candidate torch keys for a YoloBody/Backbone parameter path.

    The reference builds the backbone from nn.Sequential stages
    (nets/backbone.py:96-116: stem=(Conv,Conv,Conv), dark2=(Conv,Block),
    dark3..5=(Transition,Block)) and the body from plainly-named
    attributes (nets/yolo_net.py:243-272), so the mapping is our module
    name -> the Sequential index + the shared token rewrites."""
    toks = []
    for t in path_tokens:
        m = re.fullmatch(r"stem(\d)", t)
        if m:
            toks += ["stem", m.group(1)]
            continue
        m = re.fullmatch(r"(dark\d+)_(conv|tr)", t)
        if m:
            toks += [m.group(1), "0"]
            continue
        m = re.fullmatch(r"(dark\d+)_block", t)
        if m:
            toks += [m.group(1), "1"]
            continue
        m = re.fullmatch(r"cv(\d)_(\d+)", t)   # Block's chained 3x3 convs
        if m:
            toks += [f"cv{m.group(1)}", m.group(2)]
            continue
        toks.append(t)
    leaf_t = _LEAF_TORCH.get(leaf, leaf)
    base = _rewrite_tokens(toks)
    cands = [".".join(base + [leaf_t])]
    for drop in range(len(base)):        # wrapper-collapse fallbacks
        reduced = base[:drop] + base[drop + 1:]
        cands.append(".".join(reduced + [leaf_t]))
    return cands


def convert_body_state_dict(state_dict, params, batch_stats,
                            strict: bool = True):
    """Fill a YoloBody/Backbone/LayoutBody (params, batch_stats) pair
    from a reference ``nets/yolo_net.YoloBody`` / ``nets/backbone.
    Backbone`` state_dict (round-4 verdict #6: the import route the
    YAML family already had). A bare-Backbone checkpoint (the
    pretrained-download path, nets/backbone.py:118-125) imports into a
    Backbone-rooted tree the same way — its keys simply lack the
    ``backbone.`` prefix, which our path tokens then also lack."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()

    def fill(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, val in flat:
            toks = [p.key for p in path]
            leaf = toks[-1]
            found = None
            for cand in _body_candidates(toks[:-1], leaf):
                if cand in sd:
                    found = cand
                    break
            if found is None:
                if strict:
                    raise KeyError(
                        f"no torch key for {'/'.join(toks)}; tried "
                        f"{_body_candidates(toks[:-1], leaf)[:3]}...")
                out["/".join(toks)] = np.asarray(val)
                continue
            used.add(found)
            out["/".join(toks)] = _convert_value(leaf, np.asarray(val),
                                                 sd[found])
        return out

    flat_p = fill(params)
    flat_b = fill(batch_stats)

    def unflatten(tree, flat):
        def visit(sub, prefix):
            if isinstance(sub, dict):
                return {k: visit(v, prefix + [k]) for k, v in sub.items()}
            return flat["/".join(prefix)]
        return visit(tree, [])

    leftovers = [k for k in sd if k not in used
                 and not k.endswith("num_batches_tracked")]
    if strict and leftovers:
        raise KeyError(f"unconsumed torch keys: {leftovers[:5]} "
                       f"({len(leftovers)} total)")
    return unflatten(params, flat_p), unflatten(batch_stats, flat_b)


def load_torch_body_checkpoint(path: str, params, batch_stats,
                               strict: bool = True):
    """Load a ``.pth`` YoloBody/Backbone state_dict (torch needed here)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_body_state_dict(sd, params, batch_stats, strict)


def _invert_value(leaf: str, ours: np.ndarray) -> np.ndarray:
    t = np.asarray(ours)
    if leaf == "kernel":
        if t.ndim == 4:       # (kh, kw, cin/g, cout) -> (cout, cin/g, kh, kw)
            t = t.transpose(3, 2, 0, 1)
        elif t.ndim == 2:
            t = t.transpose(1, 0)
    if leaf == "implicit" and t.ndim == 4:  # (1,1,1,c) -> (1,c,1,1)
        t = t.transpose(0, 3, 1, 2)
    return t


def export_state_dict(spec: ModelSpec, params, batch_stats) -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: our trees -> a torch-layout state_dict
    loadable by the reference ``Model.load_state_dict`` (detect.py:175)."""
    out: Dict[str, np.ndarray] = {}

    def emit(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, val in flat:
            toks = [p.key for p in path]
            key = _candidates(toks[:-1], toks[-1], spec)[0]  # canonical name
            out[key] = _invert_value(toks[-1], np.asarray(val))

    emit(params)
    emit(batch_stats)
    return out
