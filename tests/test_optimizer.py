"""Optimizer parity vs torch SGD-Nesterov/Adam (main/optimizer.py:20-52)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.ops.schedules import StepHyper
from yolo_continuous_tpu.train.optimizer import Optimizer, label_params
from yolo_continuous_tpu.train.ema import ema_init, ema_update


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "conv": {"kernel": rs.randn(3, 3, 4, 8).astype(np.float32),
                 "bias": rs.randn(8).astype(np.float32)},
        "bn": {"scale": rs.rand(8).astype(np.float32) + 0.5,
               "bias": rs.randn(8).astype(np.float32)},
        "head": {"implicit": rs.randn(1, 1, 1, 8).astype(np.float32)},
    }


def test_labels():
    labels = label_params(_tree())
    assert labels["conv"]["kernel"] == "weight"
    assert labels["conv"]["bias"] == "bias"
    assert labels["bn"]["scale"] == "bn_scale"
    assert labels["bn"]["bias"] == "bias"
    assert labels["head"]["implicit"] == "bias"


def _run_ours(adam, steps=5, lr=0.01, mom=0.937, wd=5e-4):
    params = jax.tree.map(jnp.asarray, _tree())
    grads_np = _tree(seed=1)
    grads = jax.tree.map(jnp.asarray, grads_np)
    labels = label_params(params)
    opt = Optimizer(adam=adam, weight_decay=wd)
    state = opt.init(params)
    hyper = StepHyper(lr_weights=lr, lr_bias=lr, momentum=mom)
    for _ in range(steps):
        params, state = opt.update(grads, state, params, labels, hyper)
    return jax.tree.map(np.asarray, params), grads_np


def _run_torch_simple(adam, steps=5, lr=0.01, mom=0.937, wd=5e-4):
    tree = _tree()
    grads = _tree(seed=1)
    params = {(m, l): torch.nn.Parameter(torch.tensor(v))
              for m, leaves in tree.items() for l, v in leaves.items()}
    pg0 = [params[("bn", "scale")]]
    pg1 = [params[("conv", "kernel")]]
    pg2 = [params[("conv", "bias")], params[("bn", "bias")],
           params[("head", "implicit")]]
    if adam:
        o = torch.optim.Adam(pg0, lr=lr, betas=(mom, 0.999))
    else:
        o = torch.optim.SGD(pg0, lr=lr, momentum=mom, nesterov=True)
    o.add_param_group({"params": pg1, "weight_decay": wd})
    o.add_param_group({"params": pg2})
    for _ in range(steps):
        for (m, l), p in params.items():
            p.grad = torch.tensor(grads[m][l])
        o.step()
    return {m: {l: params[(m, l)].detach().numpy() for l in tree[m]}
            for m in tree}


def test_sgd_matches_torch():
    ours, _ = _run_ours(adam=False)
    ref = _run_torch_simple(adam=False)
    for m in ref:
        for l in ref[m]:
            np.testing.assert_allclose(ours[m][l], ref[m][l], atol=1e-5,
                                       err_msg=f"{m}.{l}")


def test_adam_matches_torch():
    ours, _ = _run_ours(adam=True)
    ref = _run_torch_simple(adam=True)
    for m in ref:
        for l in ref[m]:
            np.testing.assert_allclose(ours[m][l], ref[m][l], atol=1e-5,
                                       err_msg=f"{m}.{l}")


def test_ema_ramp():
    tree = {"w": jnp.ones((4,))}
    st = ema_init(tree)
    st = ema_update(st, {"w": jnp.zeros((4,))}, decay=0.9999, tau=2000.0)
    # d = 0.9999 * (1 - exp(-1/2000)); ema = 1*d + 0*(1-d)
    import math
    d = 0.9999 * (1 - math.exp(-1 / 2000))
    # f32 1-exp(-x) cancellation: compare with absolute tolerance
    np.testing.assert_allclose(np.asarray(st.tree["w"]), d, atol=1e-7)
    assert int(st.updates) == 1


def test_ema_does_not_alias():
    tree = {"w": jnp.ones((4,))}
    st = ema_init(tree)
    assert st.tree["w"] is not tree["w"]
