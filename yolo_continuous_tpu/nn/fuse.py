"""Deploy-time re-parameterization as pure weight transforms.

Parity targets:
- ``nets/common.py:488-529``  RepConv.get_equivalent_kernel_bias
  (3x3+BN, 1x1+BN, identity-BN -> one biased 3x3 conv)
- ``nets/common.py:538-559``  conv+BN fold
- ``nets/yolo_net.py:274-283`` model-level fuse()

In torch these mutate modules in place; here they are pure functions from
(params, batch_stats) of the train-form model to params of the deploy-form
model (``RepConv(deploy=True)``), built from a spec with the deploy flag
flipped. Note: plain Conv+BN folding is a compile-time no-op on TPU (XLA
fuses the affine into the conv epilogue), so only the structurally
different RepConv math needs explicit treatment.

Layout note: flax conv kernels are (kh, kw, cin_per_group, cout).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .builder import LayerSpec, ModelSpec


def fuse_conv_bn(kernel: jnp.ndarray, bn: Dict[str, jnp.ndarray],
                 eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(kernel, bn{scale,bias,mean,var}) -> (kernel', bias');
    nets/common.py:538-544."""
    std = jnp.sqrt(bn["var"] + eps)
    t = bn["scale"] / std                     # (cout,)
    return kernel * t[None, None, None, :], bn["bias"] - bn["mean"] * t


def _pad_1x1_to_3x3(kernel1x1: jnp.ndarray) -> jnp.ndarray:
    """center-pad (1,1,cin,cout) -> (3,3,cin,cout); nets/common.py:497-501."""
    return jnp.pad(kernel1x1, ((1, 1), (1, 1), (0, 0), (0, 0)))


def _identity_kernel(c: int, groups: int) -> jnp.ndarray:
    """3x3 identity kernel; nets/common.py:515-520."""
    cin_g = c // groups
    k = np.zeros((3, 3, cin_g, c), np.float32)
    for i in range(c):
        k[1, 1, i % cin_g, i] = 1.0
    return jnp.asarray(k)


def _bn_dict(params: Dict, stats: Dict) -> Dict[str, jnp.ndarray]:
    return {"scale": params["scale"], "bias": params["bias"],
            "mean": stats["mean"], "var": stats["var"]}


def fuse_repconv(rep_params: Dict, rep_stats: Dict, c1: int, c2: int,
                 groups: int = 1, eps: float = 1e-5) -> Dict:
    """Train-form RepConv params -> deploy-form {'rbr_reparam': ...}.

    Mirrors get_equivalent_kernel_bias (nets/common.py:488-495).
    """
    k3, b3 = fuse_conv_bn(rep_params["rbr_dense_conv"]["kernel"],
                          _bn_dict(rep_params["rbr_dense_bn"]["bn"],
                                   rep_stats["rbr_dense_bn"]["bn"]), eps)
    k1, b1 = fuse_conv_bn(rep_params["rbr_1x1_conv"]["kernel"],
                          _bn_dict(rep_params["rbr_1x1_bn"]["bn"],
                                   rep_stats["rbr_1x1_bn"]["bn"]), eps)
    kernel = k3 + _pad_1x1_to_3x3(k1)
    bias = b3 + b1
    if "rbr_identity" in rep_params:  # only when c1 == c2 and s == 1
        kid, bid = fuse_conv_bn(_identity_kernel(c1, groups),
                                _bn_dict(rep_params["rbr_identity"]["bn"],
                                         rep_stats["rbr_identity"]["bn"]), eps)
        kernel = kernel + kid
        bias = bias + bid
    return {"rbr_reparam": {"kernel": kernel, "bias": bias}}


def deploy_spec(spec: ModelSpec) -> ModelSpec:
    """Flip every RepConv row's deploy flag (arg index 5 of
    (k, s, p, g, act, deploy))."""
    new_layers = []
    for s in spec.layers:
        if s.name == "RepConv":
            a = list(s.args) + [None] * (6 - len(s.args))
            if a[0] is None:
                a[0] = 3
            if a[1] is None:
                a[1] = 1
            if a[3] is None:
                a[3] = 1
            if a[4] is None:
                a[4] = True
            a[5] = True
            s = dataclasses.replace(s, args=tuple(a))
        new_layers.append(s)
    return dataclasses.replace(spec, layers=tuple(new_layers))


def fuse_model_params(spec: ModelSpec, params: Dict, batch_stats: Dict,
                      eps: float = 1e-5) -> Tuple[Dict, Dict]:
    """(train-form params, stats) -> (deploy-form params, stats).

    Walks top-level layer modules; RepConv layers are re-parameterized,
    everything else passes through (model-level fuse: nets/yolo_net.py:274-283).
    Returns params for ``YoloModel(deploy_spec(spec))`` plus the remaining
    batch_stats (RepConv BN stats consumed).
    """
    new_params = dict(params)
    new_stats = dict(batch_stats)
    for s in spec.layers:
        if s.name != "RepConv":
            continue
        for r in range(max(s.n, 1)):
            key = f"l{s.i}_RepConv" if s.n == 1 else f"l{s.i}_RepConv_r{r}"
            if key not in params:
                continue
            g = s.args[3] if len(s.args) > 3 and s.args[3] else 1
            new_params[key] = fuse_repconv(params[key], batch_stats[key],
                                           s.c1, s.c2, g, eps)
            new_stats.pop(key, None)
    return new_params, new_stats
