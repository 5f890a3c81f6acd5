"""Golden tests for box math (reference formulas utils/bbox.py:29-118)."""
import numpy as np
import pytest

import jax.numpy as jnp

from yolo_continuous_tpu.ops.boxes import (
    BBoxType, CvtFlag, bbox_iou, box_iou, cvt_bbox, make_grid,
)


def test_cvt_roundtrip():
    # mirrors the reference smoke block utils/bbox.py:207-225
    xxyy = jnp.asarray([[1.0, 2.0, 3.0, 5.0]])
    xyxy = cvt_bbox(xxyy, CvtFlag.CVT_XXYY_XYXY)
    np.testing.assert_allclose(np.asarray(xyxy), [[1, 3, 2, 5]])
    xywh = cvt_bbox(xxyy, CvtFlag.CVT_XXYY_XYWH)
    np.testing.assert_allclose(np.asarray(xywh), [[1.5, 4.0, 1.0, 2.0]])
    back = cvt_bbox(xywh, CvtFlag.CVT_XYWH_XYXY)
    np.testing.assert_allclose(np.asarray(back), [[1, 3, 2, 5]])
    back2 = cvt_bbox(xywh, CvtFlag.CVT_XYWH_XXYY)
    np.testing.assert_allclose(np.asarray(back2), [[1, 2, 3, 5]])
    x2 = cvt_bbox(back, CvtFlag.CVT_XYXY_XYWH)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(xywh))


def test_cvt_batched():
    boxes = jnp.asarray(np.random.RandomState(0).rand(4, 7, 4) * 100)
    out = cvt_bbox(cvt_bbox(boxes, CvtFlag.CVT_XYXY_XYWH), CvtFlag.CVT_XYWH_XYXY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(boxes), atol=1e-4)


def test_box_iou_matrix():
    a = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15]])
    b = jnp.asarray([[0.0, 0, 10, 10], [100, 100, 110, 110]])
    m = np.asarray(box_iou(a, b))
    assert m.shape == (2, 2)
    np.testing.assert_allclose(m[0, 0], 1.0)
    np.testing.assert_allclose(m[1, 0], 25.0 / 175.0)
    np.testing.assert_allclose(m[:, 1], 0.0)


def test_bbox_iou_plain_and_xywh():
    b1 = jnp.asarray([5.0, 5.0, 10.0, 10.0])   # xywh center (5,5) size 10
    b2 = jnp.asarray([0.0, 0.0, 10.0, 10.0])   # xyxy
    iou_xywh = float(bbox_iou(b1, jnp.asarray([5.0, 5.0, 10.0, 10.0]), x1y1x2y2=False))
    assert abs(iou_xywh - 1.0) < 1e-5
    iou = float(bbox_iou(jnp.asarray([0.0, 0, 10, 10]), jnp.asarray([5.0, 5, 15, 15])))
    assert abs(iou - 25.0 / 175.0) < 1e-4


def test_ciou_matches_torch_formula():
    # golden computed with the torch reference formula (utils/bbox.py:75-113)
    b1 = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b2 = jnp.asarray([2.0, 3.0, 12.0, 14.0])
    iou = 56.0 / (100.0 + 110.0 - 56.0)
    import math
    cw, ch = 12.0, 14.0
    c2 = cw ** 2 + ch ** 2
    rho2 = ((2 + 12 - 0 - 10) ** 2 + (3 + 14 - 0 - 10) ** 2) / 4
    v = (4 / math.pi ** 2) * (math.atan(10 / 11) - math.atan(10 / 10)) ** 2
    alpha = v / (v - iou + 1)
    expected = iou - (rho2 / c2 + v * alpha)
    got = float(bbox_iou(b1, b2, ciou=True))
    assert abs(got - expected) < 1e-4


def test_giou_diou():
    b1 = jnp.asarray([0.0, 0, 10, 10])
    b2 = jnp.asarray([20.0, 0, 30, 10])
    giou = float(bbox_iou(b1, b2, giou=True))
    assert giou < 0  # disjoint boxes -> negative GIoU
    diou = float(bbox_iou(b1, b2, diou=True))
    assert diou < 0


def test_make_grid():
    g = np.asarray(make_grid(3, 2))
    assert g.shape == (1, 1, 2, 3, 2)
    np.testing.assert_allclose(g[0, 0, 0, 2], [2, 0])  # (x=2, y=0)
    np.testing.assert_allclose(g[0, 0, 1, 0], [0, 1])
