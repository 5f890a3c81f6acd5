"""RepConv re-parameterization equivalence (nets/common.py:488-614)."""
import numpy as np

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.nn.layers import RepConv
from yolo_continuous_tpu.nn.fuse import fuse_conv_bn, fuse_repconv


def _make_repconv(c1, c2, seed=0):
    m = RepConv(c1, c2, 3, 1)
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, 8, 8, c1))
    v = m.init(jax.random.PRNGKey(seed + 1), x, False)
    return m, v, x


def _randomize_stats(v, seed=2):
    # running stats at init are mean=0/var=1; randomize to exercise the fold
    rng = np.random.RandomState(seed)
    stats = jax.tree.map(lambda a: jnp.asarray(
        rng.rand(*a.shape).astype(np.float32) + 0.5), v["batch_stats"])
    return {**v, "batch_stats": stats}


def test_repconv_identity_branch_equivalence():
    c = 16
    m, v, x = _make_repconv(c, c)
    v = _randomize_stats(v)
    y_train_form = m.apply(v, x, False)

    fused = fuse_repconv(v["params"], v["batch_stats"], c, c)
    md = RepConv(c, c, 3, 1, deploy=True)
    y_deploy = md.apply({"params": fused}, x, False)
    np.testing.assert_allclose(np.asarray(y_train_form), np.asarray(y_deploy),
                               atol=2e-4)


def test_repconv_no_identity_equivalence():
    m, v, x = _make_repconv(16, 32)  # c1 != c2 -> no identity branch
    v = _randomize_stats(v)
    y1 = m.apply(v, x, False)
    fused = fuse_repconv(v["params"], v["batch_stats"], 16, 32)
    md = RepConv(16, 32, 3, 1, deploy=True)
    y2 = md.apply({"params": fused}, x, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)


def test_fuse_conv_bn_math():
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))
    bn = {"scale": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
          "bias": jnp.asarray(rng.randn(8).astype(np.float32)),
          "mean": jnp.asarray(rng.randn(8).astype(np.float32)),
          "var": jnp.asarray(rng.rand(8).astype(np.float32) + 0.1)}
    kf, bf = fuse_conv_bn(k, bn)
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_ref = (y_ref - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]
    y_fused = jax.lax.conv_general_dilated(
        x, kf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused), atol=1e-4)


def test_detector_fuse_equivalence():
    """Detector(fuse=True) matches the train-form detector's raw outputs
    on yolov7 (which contains RepConvs)."""
    import yaml
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector

    cfg = jax_yaml = yaml.safe_load(open("cfg/raccoon.yaml"))
    cfg["image_size"] = 96
    plan = TrainPlan(cfg)
    plan.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan, dtype=jnp.float32)
    det_f = Detector(plan, dtype=jnp.float32, params=det.params,
                     batch_stats=det.batch_stats, fuse=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 96, 96, 3))
    a = det(x, conf_thres=0.001, max_det=16)
    b = det_f(x, conf_thres=0.001, max_det=16)
    # same boxes/scores within the BN-fold tolerance
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=2e-3)
