"""Byte-compatibility with the upstream config files.

BASELINE.json requires "cfg/*.yaml configs preserved": the ORIGINAL
reference YAMLs (mounted read-only at /root/reference) must parse through
our TrainPlan and model builder unchanged. Skipped when the reference
tree isn't present.
"""
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.mark.parametrize("name", ["voc_train", "coco_train", "raccoon",
                                  "raccoon_tiny", "chip_tiny"])
def test_reference_train_plan_parses(name):
    from yolo_continuous_tpu.config.plan import TrainPlan
    plan = TrainPlan(os.path.join(REF, "cfg", f"{name}.yaml"))
    assert plan.image_size == 640
    assert plan.anchors_mask == [[6, 7, 8], [3, 4, 5], [0, 1, 2]]
    assert len(plan.anchors) == 3
    assert plan.num_labels == len(plan.labels)
    # the windows model_cfg path resolves to our sibling cfg tree
    assert os.path.exists(plan.model_cfg), plan.model_cfg
    assert os.path.exists(plan.enhance_cfg), plan.enhance_cfg


@pytest.mark.parametrize("net", ["yolov7", "yolov7-tiny"])
def test_reference_net_yaml_builds(net):
    from yolo_continuous_tpu.nn.builder import YoloModel, build_model_spec
    with open(os.path.join(REF, "cfg", "net", f"{net}.yaml")) as f:
        cfg = yaml.safe_load(f)
    anchors = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
               [142, 110, 192, 243, 459, 401]]
    spec = build_model_spec(cfg, 3, anchors, 20)
    assert spec.head_name == "Detect"
    assert spec.strides == (32, 16, 8)
    model = YoloModel(spec=spec)
    shapes = jax.eval_shape(lambda k, x: model.init(k, x, False),
                            jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert n == {"yolov7": 37_297_025, "yolov7-tiny": 6_065_281}[net]


def test_reference_enhance_yaml_loads():
    from yolo_continuous_tpu.ops.enhance import EnhancePackage
    with open(os.path.join(REF, "cfg", "enhance", "enhance.yaml")) as f:
        cfg = yaml.safe_load(f)
    pkg = EnhancePackage(64, cfg)
    img = jnp.zeros((48, 64, 3), jnp.float32)
    boxes = jnp.asarray([[5.0, 5.0, 40.0, 40.0, 0.0]])
    out, nb, nm = pkg(jax.random.PRNGKey(0), img, boxes,
                      jnp.asarray([True]), enhance=True)
    assert out.shape == (64, 64, 3)


def test_our_net_yamls_equal_reference():
    for net in ("yolov7", "yolov7-tiny"):
        with open(os.path.join(REF, "cfg", "net", f"{net}.yaml")) as f:
            ref = yaml.safe_load(f)
        with open(f"cfg/net/{net}.yaml") as f:
            ours = yaml.safe_load(f)
        assert ours["backbone"] == ref["backbone"]
        assert ours["head"] == ref["head"]
        assert ours["depth_multiple"] == ref["depth_multiple"]
        assert ours["width_multiple"] == ref["width_multiple"]
