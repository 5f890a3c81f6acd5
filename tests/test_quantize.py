"""int8 post-training quantization (serving path).

TPU-first capability beyond the reference: symmetric PTQ — per-channel
weight scales derived in-graph from the unchanged fp32 checkpoint,
per-tensor activation scales recorded by a calibration pass into the
"quant" variable collection, integer convs accumulated in int32
(the v5e MXU int8 path; on CPU XLA runs the same integer conv).
"""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.detect_api import Detector
from yolo_continuous_tpu.nn import layers as L
from yolo_continuous_tpu.nn.builder import YoloModel, build_model_spec

ANCHORS = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]


def _plan(**over):
    cfg = yaml.safe_load(open("cfg/chip_tiny.yaml"))
    cfg.update(dict(image_size=64, batch_size=2, max_boxes=8,
                    save_dir="/tmp", save_name="quant_t"))
    cfg.update(over)
    return TrainPlan(cfg)


def test_conv_int8_close_to_fp():
    """One Conv block: int8 output within quantization tolerance of fp,
    and the calib pass records a positive activation scale."""
    conv = L.Conv(16, 3, 1, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    v = conv.init(jax.random.PRNGKey(1), x, False)

    y_fp = conv.apply(v, x, False)
    with L.quant_ctx("calib"):
        _, mut = conv.apply(v, x, False, mutable=["quant"])
    amax = jax.tree.leaves(mut["quant"])[0]
    assert float(amax) == pytest.approx(float(jnp.max(jnp.abs(x))))

    with L.quant_ctx("int8"):
        y_q = conv.apply({**v, "quant": mut["quant"]}, x, False)
    err = float(jnp.max(jnp.abs(y_q - y_fp)))
    scale = float(jnp.max(jnp.abs(y_fp))) + 1e-9
    assert err / scale < 0.05, (err, scale)


def test_detector_quantized_end_to_end():
    """Full Detector with quantize=True: calibrate -> infer; detections
    approximately match the fp detector on the same inputs."""
    plan = _plan()
    plan.save_path = "/nonexistent/x.msgpack"    # random weights
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)

    det_fp = Detector(plan, dtype=jnp.float32)
    det_q = Detector(plan, dtype=jnp.float32, quantize=True)
    # same weights for a fair comparison
    det_q.params, det_q.batch_stats = det_fp.params, det_fp.batch_stats

    with pytest.raises(RuntimeError):
        det_q(imgs, 0.01, 0.5)                   # calibrate() required

    quant = det_q.calibrate(imgs)
    assert all(float(a) > 0 for a in jax.tree.leaves(quant))

    b_fp, s_fp, c_fp, v_fp = det_fp(imgs, 0.01, 0.5)
    b_q, s_q, c_q, v_q = det_q(imgs, 0.01, 0.5)
    # quantization perturbs logits slightly; the top detection per image
    # must agree in class and position
    for i in range(2):
        if not (bool(v_fp[i][0]) and bool(v_q[i][0])):
            continue
        assert int(c_fp[i][0]) == int(c_q[i][0])
        np.testing.assert_allclose(np.asarray(b_q[i][0]),
                                   np.asarray(b_fp[i][0]), atol=0.05)


def test_calibrate_multiple_batches_running_max():
    """Scales are a running max over calibration batches."""
    plan = _plan()
    plan.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan, dtype=jnp.float32, quantize=True)
    rs = np.random.RandomState(1)
    small = jnp.asarray(rs.rand(1, 64, 64, 3) * 0.1, jnp.float32)
    big = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    q_small = {k: np.asarray(v) for k, v in jax.tree_util
               .tree_flatten_with_path(det.calibrate(small))[0]}
    q_both = det.calibrate(big)                  # accumulates onto small
    flat_both = jax.tree_util.tree_flatten_with_path(q_both)[0]
    grew = [float(v) >= float(q_small[k]) - 1e-7 for k, v in flat_both]
    assert all(grew)
    assert any(float(v) > float(q_small[k]) + 1e-7 for k, v in flat_both)


def test_quant_ignored_in_training():
    """quant_mode never touches the train path (trace flag is eval-only
    in YoloModel)."""
    cfg = yaml.safe_load(open("cfg/net/yolov7-tiny.yaml"))
    spec = build_model_spec(cfg, 3, ANCHORS, 2)
    m_q = YoloModel(spec=spec, quant_mode="int8")
    m_fp = YoloModel(spec=spec)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m_fp.init(jax.random.PRNGKey(1), x, False)
    out_q, mut_q = m_q.apply(v, x, True, mutable=["batch_stats"])
    out_fp, mut_fp = m_fp.apply(v, x, True, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(out_q), jax.tree.leaves(out_fp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
