"""Model-builder parity tests (nets/yolo.py:15-153)."""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.nn.builder import YoloModel, build_model_spec

ANCHORS = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]


def _spec(name, nc):
    with open(f"cfg/net/{name}.yaml") as f:
        cfg = yaml.safe_load(f)
    return build_model_spec(cfg, 3, ANCHORS, nc)


def _param_count(spec):
    model = YoloModel(spec=spec)
    shapes = jax.eval_shape(lambda k, x: model.init(k, x, False),
                            jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32))
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))


def test_tiny_param_parity():
    # torch reference Model(yolov7-tiny, nc=20): 6,065,281 parameters
    assert _param_count(_spec("yolov7-tiny", 20)) == 6_065_281


def test_yolov7_param_parity():
    # torch reference Model(yolov7): 37,297,025 (nc=20) / 37,620,125 (nc=80)
    assert _param_count(_spec("yolov7", 20)) == 37_297_025
    assert _param_count(_spec("yolov7", 80)) == 37_620_125


def test_model_info_table():
    """Per-layer param table (Model.print_info parity, nets/yolo.py:
    127-141): one row per YAML layer, every parameter attributed to
    exactly one row, summary total == tree total."""
    from yolo_continuous_tpu.nn.builder import format_model_info, model_info
    spec = _spec("yolov7-tiny", 20)
    model = YoloModel(spec=spec)
    v = jax.eval_shape(lambda k, x: model.init(k, x, False),
                       jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3), jnp.float32))
    rows, summary = model_info(spec, v["params"])
    assert summary["layers"] == len(spec.layers) == len(rows)
    assert summary["parameters"] == 6_065_281 == sum(r["params"] for r in rows)
    assert rows[0]["module"] == "Conv" and rows[0]["params"] > 0
    # parameter-free layers report 0
    assert all(r["params"] == 0 for r in rows if r["module"] in
               ("Concat", "MP", "SP", "nn.Upsample"))
    txt = format_model_info(spec, v["params"])
    assert "Model Summary: " in txt and "6065281" in txt.replace(",", "")


def test_model_gflops():
    """Forward-FLOPs estimate matches the published YOLOv7 figures
    (tiny ~13.2 @640, yolov7 ~105 @640 — thop-style MACs*2)."""
    from yolo_continuous_tpu.nn.builder import model_gflops
    g_tiny = model_gflops(YoloModel(spec=_spec("yolov7-tiny", 20)), 640)
    assert 12.0 < g_tiny < 15.0, g_tiny
    g7 = model_gflops(YoloModel(spec=_spec("yolov7", 80)), 640)
    assert 100.0 < g7 < 112.0, g7


def test_strides_and_anchor_assignment():
    spec = _spec("yolov7-tiny", 20)
    assert spec.head_name == "Detect"
    assert spec.strides == (32, 16, 8)  # P5-first (nets/detect.py:27-38)
    # anchors_mask [[6,7,8],[3,4,5],[0,1,2]] -> large anchors on P5
    assert spec.anchors[0] == ((142.0, 110.0), (192.0, 243.0), (459.0, 401.0))
    assert spec.anchors[2] == ((12.0, 16.0), (19.0, 36.0), (40.0, 28.0))


def test_forward_shapes_and_order():
    spec = _spec("yolov7-tiny", 20)
    model = YoloModel(spec=spec)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, False)
    outs = model.apply(v, x, False)
    # P5-first: 4x4, 8x8, 16x16 at 128px input
    assert [o.shape for o in outs] == [(2, 4, 4, 3, 25), (2, 8, 8, 3, 25), (2, 16, 16, 3, 25)]


def test_train_mode_updates_batch_stats():
    spec = _spec("yolov7-tiny", 1)
    model = YoloModel(spec=spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, False)
    _, mutated = model.apply(v, x, True, mutable=["batch_stats"])
    # running means must move away from 0 for the first conv
    leaves = jax.tree.leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_bf16_compute_dtype():
    spec = _spec("yolov7-tiny", 1)
    model = YoloModel(spec=spec, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k, a: model.init(k, a, False),
                            jax.random.PRNGKey(0), x)
    # params stay fp32 under a bf16 compute policy
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(shapes["params"]))


def test_fp32_heads_under_bf16_body():
    """Mixed-precision policy: head LOGITS compute in fp32 even when the
    body runs bf16 (head_dtype default; precision bounds mAP)."""
    spec = _spec("yolov7-tiny", 1)
    model = YoloModel(spec=spec, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, False)
    outs = model.apply(v, x, False)
    assert all(o.dtype == jnp.float32 for o in outs)
    # opt-out keeps the old pure-bf16 behavior
    model_bf = YoloModel(spec=spec, dtype=jnp.bfloat16,
                         head_dtype=jnp.bfloat16)
    outs_bf = model_bf.apply(v, x, False)
    assert all(o.dtype == jnp.bfloat16 for o in outs_bf)
