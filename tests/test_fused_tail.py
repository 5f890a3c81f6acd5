"""Fused 1x1-tail serving path (layers.Conv fused_tail): same params,
same math as the normal Conv+BN+SiLU branch (kernel runs in interpret
mode off-TPU)."""
import numpy as np
import yaml

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.nn.layers import Conv


def test_conv_fused_tail_matches_normal_branch():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 8, 512), jnp.float32)

    normal = Conv(256, 1, 1)
    fused = Conv(256, 1, 1, fused_tail=True, fused_tail_min_cin=512)

    v = normal.init(jax.random.PRNGKey(0), x, False)
    # randomize BN stats so the fold is exercised
    bs = jax.tree.map(lambda a: a, v["batch_stats"])
    bs = {"bn": {"bn": {"mean": jnp.asarray(rs.randn(256) * 0.1, jnp.float32),
                        "var": jnp.asarray(rs.rand(256) + 0.5, jnp.float32)}}}
    vars_ = {"params": v["params"], "batch_stats": bs}

    # identical parameter tree -> the same variables drive both branches
    vf = fused.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree.structure(vf["params"]) == jax.tree.structure(v["params"])
    assert (jax.tree.structure(vf["batch_stats"])
            == jax.tree.structure(v["batch_stats"]))

    y_normal = normal.apply(vars_, x, False)
    y_fused = fused.apply(vars_, x, False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_normal),
                               atol=2e-5, rtol=1e-5)

    # below the C_in threshold the fused instance falls back bit-exactly
    x_small = jnp.asarray(rs.rand(2, 8, 8, 64), jnp.float32)
    v2 = normal.init(jax.random.PRNGKey(1), x_small, False)
    np.testing.assert_array_equal(
        np.asarray(fused.apply(v2, x_small, False)),
        np.asarray(normal.apply(v2, x_small, False)))

    # training mode always uses the normal branch
    y_tr_f, _ = fused.apply(vars_, x, True, mutable=["batch_stats"])
    y_tr_n, _ = normal.apply(vars_, x, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_tr_f), np.asarray(y_tr_n))


def test_detector_fused_tails_matches_default():
    """End-to-end: a Detector with fused_tails=True produces the same
    detections as the default path on the same random weights."""
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector

    cfg = yaml.safe_load(open("cfg/chip_tiny.yaml"))
    cfg["image_size"] = 64
    cfg["model_cfg"] = "cfg/net/yolov7.yaml"   # neck has >=512-chan 1x1 tails
    plan = TrainPlan(cfg)
    plan.save_path = "/nonexistent/x.msgpack"

    det0 = Detector(plan, dtype=jnp.float32)
    det1 = Detector(plan, dtype=jnp.float32, fused_tails=True,
                    params=det0.params, batch_stats=det0.batch_stats)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    b0, s0, c0, v0 = det0(x, 0.01, 0.5)
    b1, s1, c1, v1 = det1(x, 0.01, 0.5)
    m0, m1 = np.asarray(v0[0]), np.asarray(v1[0])   # (max_det,) bool masks
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(np.asarray(b0[0])[m0], np.asarray(b1[0])[m1],
                               atol=1e-2, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(c0[0])[m0],
                                  np.asarray(c1[0])[m1])
