"""End-to-end slices: inference pipeline on horses.jpg (structural parity
with detect.py) and a short overfit-one-batch training run (SURVEY §4e)."""
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.detect_api import Detector
from yolo_continuous_tpu.ops.nms import yolo_correct_boxes
from yolo_continuous_tpu.ops.preprocess import letterbox
from yolo_continuous_tpu.train.train_loop import Trainer

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_plan(**over):
    cfg = yaml.safe_load(open(os.path.join(HERE, "cfg/chip_tiny.yaml")))
    cfg["image_size"] = 64
    cfg["max_boxes"] = 8
    cfg["batch_size"] = 2
    cfg.update(over)
    return TrainPlan(cfg)


def test_inference_pipeline_horses():
    """config -> build -> forward -> decode -> NMS -> unmap with random
    weights; structural parity with detect.py:208-265 (SURVEY §7 step 4)."""
    cv2 = pytest.importorskip("cv2")
    cfg = yaml.safe_load(open(os.path.join(HERE, "cfg/chip_tiny.yaml")))
    cfg["image_size"] = 160  # small net input to keep the CPU test fast
    plan = TrainPlan(cfg)
    plan.save_path = "/nonexistent/never.msgpack"  # force random weights
    det = Detector(plan, dtype=jnp.float32)

    img_path = os.path.join(HERE, "resource/horses.jpg")
    bgr = cv2.imread(img_path)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    img, ratio, offset = letterbox(rgb, (160, 160), (114, 114, 114))
    images = jnp.asarray(img, jnp.float32)[None] / 255.0

    boxes, scores, classes, valid = det(images, conf_thres=0.01, nms_thres=0.4,
                                        max_det=20)
    assert boxes.shape == (1, 20, 4)
    mapped = np.asarray(yolo_correct_boxes(boxes[0], (160, 160),
                                           bgr.shape[:2], True))
    assert np.isfinite(mapped).all()
    # second call hits the cached jit
    _ = det(images, conf_thres=0.01, nms_thres=0.4, max_det=20)


def test_overfit_one_batch():
    """Loss must drop when training repeatedly on one synthetic batch."""
    plan = _tiny_plan()
    tr = Trainer(plan, dtype=jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    lmask = np.zeros((2, 8), bool)
    lmask[:, 0] = True
    labels, lmask = jnp.asarray(labels), jnp.asarray(lmask)

    step = tr.jitted_train_step()
    losses = []
    for _ in range(20):
        state, metrics = step(state, images, labels, lmask, 0.01, 0.01, 0.9)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state["step"]) == 20
    assert int(state["ema"].updates) == 20


def test_checkpoint_roundtrip(tmp_path):
    from yolo_continuous_tpu.train.checkpoint import (load_checkpoint,
                                                      save_checkpoint)
    plan = _tiny_plan()
    tr = Trainer(plan, dtype=jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, state)
    state2 = load_checkpoint(path, state)
    a = jax.tree.leaves(state["params"])
    b = jax.tree.leaves(state2["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(state2["step"]) == int(state["step"])
