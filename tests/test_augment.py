"""Device-side augmentation graph tests (ops/augment.py vs the semantics
of dataset/yolo_dataset_git.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.ops.augment import (AugConfig, augment_batch,
                                             boxes_to_labels, hsv_to_rgb_cv,
                                             rgb_to_hsv_cv)


S, MB = 64, 8


def _batch(B=2, with_boxes=True, seed=0):
    rs = np.random.RandomState(seed)
    tiles = rs.randint(0, 255, (B, 4, S, S, 3)).astype(np.uint8)
    metas = np.tile(np.array([S, S, 1.0, 0.0, 0.0], np.float32), (B, 4, 1))
    boxes = np.zeros((B, 4, MB, 5), np.float32)
    masks = np.zeros((B, 4, MB), bool)
    if with_boxes:
        boxes[:, :, 0] = [5, 5, 40, 40, 0]
        boxes[:, :, 1] = [10, 20, 30, 60, 1]
        masks[:, :, :2] = True
    return tiles, metas, boxes, masks


def test_hsv_roundtrip():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(0, 255, (16, 16, 3)).astype(np.float32))
    back = hsv_to_rgb_cv(rgb_to_hsv_cv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1.0)


def test_hsv_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    ours = np.asarray(rgb_to_hsv_cv(jnp.asarray(img, jnp.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    # hue wraps at 180; compare circularly, allow quantization slack
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert np.percentile(dh, 99) <= 1.5
    assert np.abs(ours[..., 1:] - ref[..., 1:]).max() <= 2.0


def test_eval_mode_is_deterministic_letterbox():
    tiles, metas, boxes, masks = _batch()
    args = (jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.zeros(2, bool), jnp.zeros(2, bool))
    img1, lab1, m1 = augment_batch(jax.random.PRNGKey(0), *args,
                                   cfg=AugConfig(size=S), max_gt=MB, train=False)
    img2, lab2, m2 = augment_batch(jax.random.PRNGKey(9), *args,
                                   cfg=AugConfig(size=S), max_gt=MB, train=False)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    np.testing.assert_array_equal(np.asarray(lab1), np.asarray(lab2))
    # staging is identity here (meta scale 1, offset 0): labels = boxes/S
    lab = np.asarray(lab1[0])
    assert m1[0, 0] and m1[0, 1]
    np.testing.assert_allclose(lab[0], [0, 22.5 / S, 22.5 / S, 35 / S, 35 / S],
                               atol=1e-5)


def test_train_mode_outputs():
    tiles, metas, boxes, masks = _batch()
    img, lab, m = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(tiles), jnp.asarray(metas),
        jnp.asarray(boxes), jnp.asarray(masks),
        jnp.asarray([True, False]), jnp.asarray([True, False]),
        cfg=AugConfig(size=S), max_gt=MB, train=True)
    img, lab, m = np.asarray(img), np.asarray(lab), np.asarray(m)
    assert img.shape == (2, S, S, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert lab.shape == (2, MB, 5)
    # all valid labels are inside [0, 1] with positive size
    for b in range(2):
        for i in np.where(m[b])[0]:
            cls, cx, cy, w, h = lab[b, i]
            assert 0 <= cx <= 1 and 0 <= cy <= 1
            assert w > 0 and h > 0


def test_determinism_same_key():
    tiles, metas, boxes, masks = _batch()
    args = (jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.asarray([True, True]),
            jnp.asarray([False, False]))
    a = augment_batch(jax.random.PRNGKey(7), *args, cfg=AugConfig(size=S),
                      max_gt=MB, train=True)
    b = augment_batch(jax.random.PRNGKey(7), *args, cfg=AugConfig(size=S),
                      max_gt=MB, train=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_boxes_to_labels():
    boxes = jnp.asarray([[[10.0, 20.0, 30.0, 60.0, 2.0]]])
    mask = jnp.asarray([[True]])
    lab = np.asarray(boxes_to_labels(boxes, mask, 100))
    np.testing.assert_allclose(lab[0, 0], [2.0, 0.2, 0.4, 0.2, 0.4], atol=1e-6)


def test_copy_paste():
    from yolo_continuous_tpu.ops.augment import copy_paste_batch
    imgs = jnp.stack([jnp.zeros((S, S, 3)), jnp.ones((S, S, 3)) * 200.0])
    boxes = jnp.zeros((2, 4, 5))
    boxes = boxes.at[1, 0].set(jnp.asarray([10.0, 10.0, 20.0, 20.0, 1.0]))
    masks = jnp.zeros((2, 4), bool).at[1, 0].set(True)
    out, nb, nm = copy_paste_batch(jax.random.PRNGKey(0), imgs, boxes, masks,
                                   prob=1.0)
    out = np.asarray(out)
    # sample-1's box pasted onto sample 0 (roll by 1: src of 0 is 1)...
    # roll(1) makes src[i] = imgs[i-1], so sample 0's source is sample 1
    assert out[0, 15, 15, 0] == 200.0       # inside the pasted patch
    assert out[0, 40, 40, 0] == 0.0         # outside untouched
    assert nm.shape == (2, 8)
    assert bool(nm[0, 4])                   # appended label active
    np.testing.assert_allclose(np.asarray(nb[0, 4, :4]), [10, 10, 20, 20])


def test_copy_paste_off_by_default():
    tiles, metas, boxes, masks = _batch()
    cfg = AugConfig(size=S)
    assert cfg.copy_paste == 0.0
