"""Multi-device (8 virtual CPU devices) sharding tests (SURVEY §4d)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.parallel.mesh import (data_sharding, make_mesh,
                                               param_sharding_rule,
                                               shard_batch, shard_params)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(4, 2)


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_batch_sharding(mesh8):
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = shard_batch(mesh8, {"x": x})["x"]
    assert xs.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_param_rule_shards_large_kernels(mesh8):
    rule = param_sharding_rule(mesh8, min_channels=64)
    big = jnp.zeros((3, 3, 64, 128))
    small = jnp.zeros((3, 3, 8, 16))
    assert rule(big).spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert rule(small).spec == jax.sharding.PartitionSpec()


def test_sharded_matmul_matches_single_device(mesh8):
    """A data-sharded computation must equal the unsharded one."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 32).astype(np.float32))
    w = jnp.asarray(rs.randn(32, 16).astype(np.float32))

    def f(x, w):
        return jnp.tanh(x @ w).sum(axis=1)

    ref = jax.jit(f)(x, w)
    xs = jax.device_put(x, data_sharding(mesh8, 2))
    ws = jax.device_put(w, jax.sharding.NamedSharding(
        mesh8, jax.sharding.PartitionSpec()))
    out = jax.jit(f)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dryrun_entrypoint():
    """__graft_entry__.dryrun_multichip runs a full sharded train step."""
    import __graft_entry__ as ge
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ge.dryrun_multichip(8)


def test_dp_width_loss_equality(mesh8):
    """Same global batch, data-parallel widths {1,2,4,8}: the production
    jitted train step must produce the SAME loss and updated params at
    every width (GSPMD regressions show up as math, not luck). Extends
    tests/test_distributed.py's 2-process check across mesh widths."""
    import yaml

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.parallel.mesh import shard_params
    from yolo_continuous_tpu.train.train_loop import Trainer

    net = {"depth_multiple": 1.0, "width_multiple": 1.0,
           "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                        [-1, 1, "Conv", [16, 3, 2]],
                        [-1, 1, "Conv", [16, 3, 2]],
                        [-1, 1, "Conv", [32, 3, 2]],
                        [-1, 1, "Conv", [64, 3, 2]]],
           "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]]}
    anchors = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
               [142, 110, 192, 243, 459, 401]]
    cfg = dict(device="cpu", train="x", val="x", epochs=1, batch_size=8,
               image_size=64, image_chan=3, enhance=True, shuffle=True,
               pin_memory=False, drop_last=False, workers=0,
               labels=["a", "b"], model_cfg=net, anchors=anchors,
               anchors_mask=[[6, 7, 8], [3, 4, 5], [0, 1, 2]],
               enhance_cfg="cfg/enhance/enhance.yaml",
               adam=True, decay="Cosine", lrI=0.001, lrF=0.1, momentum=0.9,
               weight_decay=0.0005, warmup=False, warmup_epochs=1,
               warmup_max_iter=1, warmup_momentum=0.8, warmup_bias_lr=0.1,
               focal_gamma=1.5, focal_alpha=0.25, resume=False,
               save_dir="/tmp", save_name="dpw", max_boxes=8)

    rs = np.random.RandomState(5)
    B, S, MB = 8, 64, 8
    images = jnp.asarray(rs.rand(B, S, S, 3), jnp.float32)
    labels = np.zeros((B, MB, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    labels[:, 1] = [0, 0.3, 0.3, 0.2, 0.25]
    lmask = np.zeros((B, MB), bool)
    lmask[:, :2] = True
    labels, lmask = jnp.asarray(labels), jnp.asarray(lmask)

    results = {}
    for width in (1, 2, 4, 8):
        mesh = make_mesh(width, 1)
        plan = TrainPlan(dict(cfg))
        tr = Trainer(plan, mesh=mesh, dtype=jnp.float32)
        state = tr.init_state(jax.random.PRNGKey(0))
        state = {"params": shard_params(mesh, state["params"], 1 << 30),
                 "batch_stats": shard_params(mesh, state["batch_stats"],
                                             1 << 30),
                 "opt": shard_params(mesh, state["opt"], 1 << 30),
                 "ema": state["ema"], "step": state["step"]}
        batch = shard_batch(mesh, {"images": images, "labels": labels,
                                   "lmask": lmask})
        step = tr.jitted_train_step()
        with mesh:
            new_state, metrics = step(state, batch["images"],
                                      batch["labels"], batch["lmask"],
                                      0.01, 0.1, 0.9)
            loss = float(metrics["loss"])
            leaf = np.asarray(jax.tree_util.tree_leaves(
                new_state["params"])[0])
        results[width] = (loss, leaf)

    base_loss, base_leaf = results[1]
    assert np.isfinite(base_loss)
    for width in (2, 4, 8):
        loss, leaf = results[width]
        # identical math up to cross-device reduction reassociation
        np.testing.assert_allclose(loss, base_loss, rtol=2e-5,
                                   err_msg=f"width {width}")
        np.testing.assert_allclose(leaf, base_leaf, rtol=1e-4, atol=1e-6,
                                   err_msg=f"width {width}")
