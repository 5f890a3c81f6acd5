"""Robustness: degenerate inputs must not produce NaNs or crashes."""
import numpy as np

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.losses.yolo_loss import LossConfig, yolo_loss
from yolo_continuous_tpu.ops.augment import AugConfig, augment_batch
from yolo_continuous_tpu.ops.nms import nms_single

FLAT = [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55], [72, 146],
        [142, 110], [192, 243], [459, 401]]
MASK = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]
ANCHORS = tuple(tuple(tuple(FLAT[j]) for j in m) for m in MASK)


def _cfg(nc=2, max_gt=8):
    return LossConfig(num_classes=nc, input_size=(64, 64), strides=(32, 16, 8),
                      anchors=ANCHORS, max_gt=max_gt)


def _preds(seed=0, scale=1.0):
    rs = np.random.RandomState(seed)
    return [jnp.asarray(rs.randn(1, s, s, 3, 7).astype(np.float32) * scale)
            for s in (2, 4, 8)]


def test_loss_extreme_logits():
    """Saturated logits (|x| = 30) must stay finite (BCE/QFocal stability)."""
    preds = [p * 30.0 for p in _preds()]
    targets = jnp.zeros((1, 8, 5)).at[0, 0].set(jnp.asarray([0, .5, .5, .5, .5]))
    tmask = jnp.zeros((1, 8), bool).at[0, 0].set(True)
    loss, parts = yolo_loss(preds, targets, tmask, _cfg())
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda ps: yolo_loss(ps, targets, tmask, _cfg())[0])(preds)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_loss_degenerate_boxes():
    """Zero-size and out-of-range gt boxes must stay finite."""
    preds = _preds()
    targets = jnp.asarray([[[0, 0.5, 0.5, 0.0, 0.0],     # zero size
                            [1, 1.5, -0.5, 0.3, 0.3],    # center outside
                            [0, 0.5, 0.5, 5.0, 5.0],     # larger than image
                            [0, 0, 0, 0, 0]] + [[0] * 5] * 4], jnp.float32)
    tmask = jnp.zeros((1, 8), bool).at[0, :3].set(True)
    loss, _ = yolo_loss(preds, targets, tmask, _cfg())
    assert np.isfinite(float(loss))


def test_nms_all_identical_boxes():
    """Identical boxes: exactly one survivor per class."""
    n = 32
    pred = np.zeros((n, 7), np.float32)
    pred[:, :4] = [0.5, 0.5, 0.2, 0.2]
    pred[:, 4] = np.linspace(0.5, 0.9, n)
    pred[:, 5] = 1.0  # all class 0
    boxes, scores, classes, valid = nms_single(jnp.asarray(pred), 0.1, 0.5, 16)
    assert int(np.asarray(valid).sum()) == 1


def test_augment_no_boxes():
    """Images with zero ground-truth boxes flow through augmentation."""
    rs = np.random.RandomState(0)
    S, MB = 64, 4
    tiles = rs.randint(0, 255, (2, 4, S, S, 3)).astype(np.uint8)
    metas = np.tile(np.array([S, S, 1.0, 0.0, 0.0], np.float32), (2, 4, 1))
    boxes = np.zeros((2, 4, MB, 5), np.float32)
    masks = np.zeros((2, 4, MB), bool)
    imgs, labels, lmask = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(tiles), jnp.asarray(metas),
        jnp.asarray(boxes), jnp.asarray(masks),
        jnp.asarray([True, False]), jnp.asarray([True, False]),
        cfg=AugConfig(size=S), max_gt=MB, train=True)
    assert np.isfinite(np.asarray(imgs)).all()
    assert not bool(np.asarray(lmask).any())


def test_loss_gt_overflow_capacity():
    """More matches than capacity: capped, finite, no wraparound."""
    preds = _preds()
    # 8 gt boxes all valid, densely packed
    rs = np.random.RandomState(3)
    t = np.zeros((1, 8, 5), np.float32)
    t[0, :, 0] = rs.randint(0, 2, 8)
    t[0, :, 1:3] = rs.rand(8, 2) * 0.8 + 0.1
    t[0, :, 3:5] = rs.rand(8, 2) * 0.3 + 0.05
    tmask = jnp.ones((1, 8), bool)
    loss, parts = yolo_loss(preds, jnp.asarray(t), tmask, _cfg())
    assert np.isfinite(float(loss))
    assert float(parts["num_fg"]) > 0
