"""jit/vmap invariance (SURVEY §4c): fn(x) == jit(fn)(x) for the pure ops."""
import numpy as np

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.ops.boxes import bbox_iou, box_iou
from yolo_continuous_tpu.ops.decode import decode_level
from yolo_continuous_tpu.losses.focal import focal_loss, qfocal_loss


def _close(a, b):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=1e-6)


def test_box_iou_jit_vmap():
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.rand(4, 6, 4).astype(np.float32))
    b = jnp.asarray(rs.rand(4, 5, 4).astype(np.float32))
    eager = jax.vmap(box_iou)(a, b)
    jitted = jax.jit(jax.vmap(box_iou))(a, b)
    _close(eager, jitted)
    # batched axis == manual loop
    for i in range(4):
        _close(eager[i], box_iou(a[i], b[i]))


def test_ciou_jit():
    rs = np.random.RandomState(1)
    b1 = jnp.asarray(rs.rand(16, 4).astype(np.float32) * 10)
    b2 = jnp.asarray(rs.rand(16, 4).astype(np.float32) * 10)
    f = lambda x, y: bbox_iou(x, y, ciou=True)
    _close(f(b1, b2), jax.jit(f)(b1, b2))


def test_decode_jit():
    rs = np.random.RandomState(2)
    pred = jnp.asarray(rs.randn(2, 4, 4, 3, 7).astype(np.float32))
    anchors = jnp.asarray([[10.0, 10], [20, 20], [30, 30]])
    f = lambda p: decode_level(p, anchors, 32.0)
    _close(f(pred), jax.jit(f)(pred))


def test_focal_jit_grad():
    rs = np.random.RandomState(3)
    p = jnp.asarray(rs.randn(8, 5).astype(np.float32))
    t = jnp.asarray(rs.randint(0, 2, (8, 5)).astype(np.float32))
    for fn in (focal_loss, qfocal_loss):
        f = lambda x: jnp.sum(fn(x, t))
        _close(f(p), jax.jit(f)(p))
        g = jax.grad(f)(p)
        assert np.isfinite(np.asarray(g)).all()
