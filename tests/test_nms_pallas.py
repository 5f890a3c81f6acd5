"""Pallas NMS kernel + fixpoint-vs-greedy oracle tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.ops.boxes import box_iou
from yolo_continuous_tpu.ops.nms import _fixpoint_suppress, _greedy_suppress


def _case(seed, n=200, nc=3):
    rs = np.random.RandomState(seed)
    cxy = rs.rand(n, 2)
    wh = rs.rand(n, 2) * 0.3 + 0.02
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = rs.rand(n).astype(np.float32)
    order = np.argsort(-scores)
    classes = rs.randint(0, nc, n)
    return (jnp.asarray(boxes[order]), jnp.asarray(classes[order]),
            jnp.ones(n, bool))


@pytest.mark.parametrize("seed", range(8))
def test_fixpoint_matches_greedy(seed):
    boxes, classes, valid = _case(seed)
    iou = box_iou(boxes, boxes)
    same = classes[:, None] == classes[None, :]
    g = _greedy_suppress(iou, same, valid, 0.5)
    f = _fixpoint_suppress(iou, same, valid, 0.5)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(f))


def test_fixpoint_chain():
    # a 4-deep suppression chain: boxes 0>1>2>3 each overlapping the next;
    # greedy keeps 0 and 2
    boxes = jnp.asarray([[0.0, 0, 10, 10], [5, 0, 15, 10], [10, 0, 20, 10],
                         [15, 0, 25, 10]])
    classes = jnp.zeros(4, jnp.int32)
    valid = jnp.ones(4, bool)
    iou = box_iou(boxes, boxes)
    same = classes[:, None] == classes[None, :]
    f = _fixpoint_suppress(iou, same, valid, 0.3)
    np.testing.assert_array_equal(np.asarray(f), [True, False, True, False])


def test_pallas_kernel_interpret_matches():
    """The Pallas kernel path (interpret mode off-TPU) matches greedy."""
    from yolo_continuous_tpu.kernels.nms_pallas import pallas_suppress
    boxes, classes, valid = _case(3, n=128)
    iou = box_iou(boxes, boxes)
    same = classes[:, None] == classes[None, :]
    g = _greedy_suppress(iou, same, valid, 0.5)
    interpret = jax.default_backend() != "tpu"
    p = pallas_suppress(boxes, classes, valid, 0.5, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(p))
