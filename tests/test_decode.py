"""Decode parity with the reference formulas (detect.py:29-87)."""
import numpy as np

import jax.numpy as jnp

from yolo_continuous_tpu.ops.decode import decode_level, decode_outputs


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_decode_level_normalized():
    rs = np.random.RandomState(0)
    h = w = 4
    na, nc = 3, 2
    stride = 160.0  # 640 / 4
    anchors = np.array([[12, 16], [19, 36], [40, 28]], np.float32)
    pred = rs.randn(1, h, w, na, 5 + nc).astype(np.float32)
    out = np.asarray(decode_level(jnp.asarray(pred), jnp.asarray(anchors), stride, True))
    assert out.shape == (1, h * w * na, 5 + nc)
    # check one cell by hand: (gy, gx, a)
    gy, gx, a = 2, 1, 1
    p = pred[0, gy, gx, a]
    y = _sig(p)
    bx = (y[0] * 2 - 0.5 + gx) / w
    by = (y[1] * 2 - 0.5 + gy) / h
    bw = (y[2] * 2) ** 2 * (anchors[a, 0] / stride) / w
    bh = (y[3] * 2) ** 2 * (anchors[a, 1] / stride) / h
    flat = (gy * w + gx) * na + a
    np.testing.assert_allclose(out[0, flat, :4], [bx, by, bw, bh], rtol=1e-5)
    np.testing.assert_allclose(out[0, flat, 4:], y[4:], rtol=1e-5)


def test_decode_level_pixels():
    rs = np.random.RandomState(1)
    pred = rs.randn(1, 2, 2, 3, 6).astype(np.float32)
    anchors = np.array([[10, 10], [20, 20], [30, 30]], np.float32)
    out = np.asarray(decode_level(jnp.asarray(pred), jnp.asarray(anchors), 32.0, False))
    # idetect.py:40-43: xy in px = (sig*2-0.5+grid)*stride
    p = pred[0, 0, 0, 0]
    y = _sig(p)
    np.testing.assert_allclose(out[0, 0, 0], (y[0] * 2 - 0.5) * 32.0, rtol=1e-5)
    # wh uses pixel anchors directly (anchor_grid is in px; idetect.py:42)
    np.testing.assert_allclose(out[0, 0, 2], (y[2] * 2) ** 2 * 10.0, rtol=1e-4)


def test_decode_outputs_concat():
    preds = [jnp.zeros((2, s, s, 3, 6)) for s in (2, 4, 8)]
    anchors = [((10, 10), (20, 20), (30, 30))] * 3
    out = decode_outputs(preds, anchors, (32, 16, 8))
    assert out.shape == (2, (4 + 16 + 64) * 3, 6)
