"""Train + infer through every head variant (Detect/IDetect/IAuxDetect/IBin).

The reference can only train Detect (its loss predates the other heads'
layouts; SURVEY §2); here every variant must take a full train step with
finite, decreasing loss and decode at inference.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.train.train_loop import Trainer

ANCHORS = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]


def _tiny_net_cfg(head):
    """A minimal 3-level FPN-ish net ending in the given head."""
    backbone = [
        [-1, 1, "Conv", [8, 3, 2]],    # 0: /2
        [-1, 1, "Conv", [16, 3, 2]],   # 1: /4
        [-1, 1, "Conv", [16, 3, 2]],   # 2: /8  (P3)
        [-1, 1, "Conv", [32, 3, 2]],   # 3: /16 (P4)
        [-1, 1, "Conv", [64, 3, 2]],   # 4: /32 (P5)
    ]
    if head == "IAuxDetect":
        hd = [
            [2, 1, "Conv", [16, 1, 1]],   # 5 aux P3
            [3, 1, "Conv", [32, 1, 1]],   # 6 aux P4
            [4, 1, "Conv", [64, 1, 1]],   # 7 aux P5
            [[2, 3, 4, 5, 6, 7], 1, "IAuxDetect", ["nc", "anchors"]],
        ]
    else:
        hd = [[[2, 3, 4], 1, head, ["nc", "anchors"]]]
    return {"depth_multiple": 1.0, "width_multiple": 1.0,
            "backbone": backbone, "head": hd}


def _plan(head):
    return TrainPlan({
        "device": "cpu", "train": "x", "val": "x", "epochs": 10,
        "batch_size": 2, "image_size": 64, "image_chan": 3, "enhance": True,
        "shuffle": True, "pin_memory": True, "drop_last": True, "workers": 0,
        "labels": ["a", "b"], "enhance_cfg": "cfg/enhance/enhance.yaml",
        "model_cfg": _tiny_net_cfg(head), "anchors": ANCHORS,
        "anchors_mask": [[6, 7, 8], [3, 4, 5], [0, 1, 2]],
        "adam": False, "decay": "Linear", "lrI": 0.01, "lrF": 0.01,
        "momentum": 0.9, "weight_decay": 5e-4, "warmup": False,
        "warmup_epochs": 1, "warmup_max_iter": 10, "warmup_momentum": 0.8,
        "warmup_bias_lr": 0.1, "focal_gamma": 1.5, "focal_alpha": 0.25,
        "resume": False, "save_dir": "/tmp", "save_name": "t",
        "max_boxes": 8,
    })


@pytest.mark.parametrize("head", ["Detect", "IDetect", "IAuxDetect", "IBin"])
def test_train_step_every_head(head):
    plan = _plan(head)
    tr = Trainer(plan, dtype=jnp.float32)
    assert tr.spec.head_name == head
    if head == "Detect":
        assert tr.spec.strides == (32, 16, 8)   # P5-first
    else:
        assert tr.spec.strides == (8, 16, 32)   # P3-first (idetect.py order)
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
    for _ in range(15):
        state, metrics = step(state, images, labels, lmask, 0.01, 0.01, 0.9)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), (head, losses)
    # SimOTA re-matches as predictions move, so the curve may step up once
    # early; it must descend after the assignment stabilizes.
    assert losses[-1] < max(losses[4], losses[0]), (head, losses)


@pytest.mark.parametrize("head", ["IDetect", "IBin"])
def test_inference_decode_every_head(head):
    from yolo_continuous_tpu.detect_api import Detector
    plan = _plan(head)
    plan.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan, dtype=jnp.float32)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes, scores, classes, valid = det(images, conf_thres=0.001, max_det=10)
    assert boxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(boxes)).all()
