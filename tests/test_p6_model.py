"""4-level P6 model family (framework extension): ReOrg stem + DownC +
IAuxDetect over P3-P6, end-to-end build + train step + decode."""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.nn.builder import build_model_spec
from yolo_continuous_tpu.train.train_loop import Trainer

# 4 anchor rows for strides 8/16/32/64
P6_ANCHORS = [[19, 27, 44, 40, 38, 94], [96, 68, 86, 152, 180, 137],
              [140, 301, 303, 264, 238, 542], [436, 615, 739, 380, 925, 792]]


def _plan(size=128):
    cfg = yaml.safe_load(open("cfg/chip_tiny.yaml"))
    cfg.update(model_cfg="cfg/net/yolov7-p6-lite.yaml", anchors=P6_ANCHORS,
               anchors_mask=[[9, 10, 11], [6, 7, 8], [3, 4, 5], [0, 1, 2]],
               image_size=size, batch_size=2, max_boxes=8,
               train="x", val="x", resume=False, save_dir="/tmp",
               save_name="p6", warmup=False, labels=["a", "b"])
    return TrainPlan(cfg)


def test_p6_spec():
    plan = _plan()
    spec = build_model_spec(yaml.safe_load(open(plan.model_cfg)), 3,
                            plan.anchors, 2)
    assert spec.head_name == "IAuxDetect"
    assert spec.strides == (8, 16, 32, 64)
    assert len(spec.anchors) == 4


def test_p6_train_and_decode():
    plan = _plan()
    tr = Trainer(plan, dtype=jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(2, 128, 128, 3), jnp.float32)
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    lmask = np.zeros((2, 8), bool)
    lmask[:, 0] = True
    labels, lmask = jnp.asarray(labels), jnp.asarray(lmask)
    step = tr.jitted_train_step()
    losses = []
    for _ in range(6):
        state, m = step(state, images, labels, lmask, 0.01, 0.01, 0.9)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # moving, finite, sane

    from yolo_continuous_tpu.detect_api import Detector
    plan2 = _plan()
    plan2.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan2, dtype=jnp.float32,
                   params=state["params"], batch_stats=state["batch_stats"])
    boxes, scores, classes, valid = det(images, conf_thres=0.001, max_det=10)
    assert boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(boxes)).all()
