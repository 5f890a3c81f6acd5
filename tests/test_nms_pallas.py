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


@pytest.mark.parametrize("n", [1024, 4096])
def test_pallas_tiled_matches_greedy(n):
    """Row-tiled fixpoint kernel == sequential greedy oracle at K beyond
    the single-VMEM-block limit (round-3 verdict item: K=4096)."""
    from yolo_continuous_tpu.kernels.nms_pallas import pallas_suppress_tiled
    boxes, classes, valid = _case(11, n=n, nc=8)
    iou = box_iou(boxes, boxes)
    same = classes[:, None] == classes[None, :]
    g = _greedy_suppress(iou, same, valid, 0.5)
    interpret = jax.default_backend() != "tpu"
    p = pallas_suppress_tiled(boxes, classes, valid, 0.5,
                              interpret=interpret)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(p))
    assert 0 < int(np.asarray(p).sum()) < n    # non-trivial keep-set


def test_pallas_tiled_chain_and_padding():
    """Deep suppression chain + non-tile-multiple K (padding path)."""
    from yolo_continuous_tpu.kernels.nms_pallas import pallas_suppress_tiled
    m = 300                                      # pads to 512 with tile 256
    step = 5.0
    boxes = jnp.stack([jnp.arange(m) * step, jnp.zeros(m),
                       jnp.arange(m) * step + 10.0, jnp.full(m, 10.0)], -1)
    classes = jnp.zeros(m, jnp.int32)
    valid = jnp.ones(m, bool)
    interpret = jax.default_backend() != "tpu"
    p = pallas_suppress_tiled(boxes, classes, valid, 0.3,
                              interpret=interpret)
    want = np.arange(m) % 2 == 0        # greedy keeps every other box
    np.testing.assert_array_equal(np.asarray(p), want)
