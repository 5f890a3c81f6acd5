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


# ---------------------------------------------------------------------------
# enhance.yaml plumbing (VERDICT item 4): cfg changes alter the device
# augmentation output; perspective is reachable from training.
# ---------------------------------------------------------------------------

def test_aug_config_from_plan_consumes_enhance_yaml():
    import yaml
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.ops.augment import aug_config_from_plan
    cfg = yaml.safe_load(open("cfg/voc_train.yaml"))
    cfg.update(train="x", val="x")
    plan = TrainPlan(cfg)
    ac = aug_config_from_plan(plan)
    ed = plan.enhance_dict
    assert ed, "enhance yaml must load"
    # enhance.yaml values flow through (NOT the dataset hard-codes)
    assert ac.hue == ed["hsv_h"] and ac.sat == ed["hsv_s"]
    assert ac.flip_ud == ed["flip_ud"]
    assert ac.use_perspective is True            # voc plan opts in
    assert ac.degrees == ed["degrees"]
    # plan-level mosaic/mixup keys win over enhance.yaml
    assert plan.mosaic_prob == 0.5 and plan.mixup_prob == 0.5
    # without plan keys, enhance.yaml's probabilities apply
    cfg2 = dict(cfg)
    cfg2.pop("mosaic_prob"), cfg2.pop("mixup_prob")
    plan2 = TrainPlan(cfg2)
    assert plan2.mosaic_prob == ed["mosaic"]
    assert plan2.mixup_prob == ed["mix-up"]


def test_enhance_cfg_changes_augment_output():
    """Same key, same batch: an hsv_s change and a flip_ud change each
    produce different augmented pixels (proves the cfg is live)."""
    tiles, metas, boxes, masks = _batch()
    args = (jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.zeros(2, bool), jnp.zeros(2, bool))
    base = AugConfig(size=S, sat=0.0, hue=0.0, val=0.0, flip_lr=0.0)
    img0, lab0, m0 = augment_batch(jax.random.PRNGKey(3), *args,
                                   cfg=base, max_gt=MB, train=True)
    img1, _, _ = augment_batch(jax.random.PRNGKey(3), *args,
                               cfg=base._replace(sat=0.9), max_gt=MB,
                               train=True)
    assert np.abs(np.asarray(img0) - np.asarray(img1)).max() > 1e-3

    imgf, labf, mf = augment_batch(jax.random.PRNGKey(3), *args,
                                   cfg=base._replace(flip_ud=1.0),
                                   max_gt=MB, train=True)
    # UD flip mirrors rows; with certain flip the image differs
    np.testing.assert_allclose(np.asarray(imgf), np.asarray(img0)[:, ::-1],
                               atol=1e-5)


def test_perspective_reachable_from_training():
    """use_perspective compiles and runs inside the jitted batch graph."""
    tiles, metas, boxes, masks = _batch()
    args = (jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.zeros(2, bool), jnp.zeros(2, bool))
    cfg = AugConfig(size=S, use_perspective=True, degrees=20.0,
                    translate=0.1, pscale=0.1, shear=5.0)
    img, lab, m = augment_batch(jax.random.PRNGKey(5), *args, cfg=cfg,
                                max_gt=MB, train=True)
    assert img.shape == (2, S, S, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(lab)).all()
    # perspective changes pixels vs the non-perspective graph
    # (images are normalized 0..1 at this point)
    img0, _, _ = augment_batch(jax.random.PRNGKey(5), *args,
                               cfg=cfg._replace(use_perspective=False),
                               max_gt=MB, train=True)
    assert np.abs(np.asarray(img) - np.asarray(img0)).max() > 0.01


def test_equalize_gated_in_batch_graph():
    tiles, metas, boxes, masks = _batch()
    args = (jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.zeros(2, bool), jnp.zeros(2, bool))
    base = AugConfig(size=S, hue=0.0, sat=0.0, val=0.0, flip_lr=0.0)
    img0, _, _ = augment_batch(jax.random.PRNGKey(7), *args, cfg=base,
                               max_gt=MB, train=True)
    img1, _, _ = augment_batch(jax.random.PRNGKey(7), *args,
                               cfg=base._replace(equalize=1.0),
                               max_gt=MB, train=True)
    assert np.abs(np.asarray(img0) - np.asarray(img1)).max() > 0.01


def test_mixup_partner_is_single_augment():
    """Mixup must blend with the neighbor's SINGLE-image augment (the
    reference draws one fresh image, yolo_dataset_git.py:59-62) — not the
    neighbor's mosaic composite (two-mosaic blends produce ~80-box
    0.5-alpha supervision the reference never trains on)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_continuous_tpu.ops.augment import (AugConfig, augment_batch,
                                                 augment_single)

    S, MB, B = 64, 6, 2
    rs = np.random.RandomState(0)
    tiles = rs.randint(0, 255, (B, 4, S, S, 3)).astype(np.uint8)
    metas = np.tile(np.asarray([S, S, 1.0, 0.0, 0.0], np.float32), (B, 4, 1))
    boxes = np.zeros((B, 4, MB, 5), np.float32)
    masks = np.zeros((B, 4, MB), bool)
    for b in range(B):
        for t in range(4):
            boxes[b, t, 0] = [5, 5, 30, 30, 1]
            boxes[b, t, 1] = [35, 35, 60, 60, 2]
            masks[b, t, :2] = True
    cfg = AugConfig(size=S, hue=0, sat=0, val=0)
    key = jax.random.PRNGKey(42)

    both_mosaic = jnp.asarray([True, True])
    mix_on = jnp.asarray([False, True])
    mix_off = jnp.asarray([False, False])
    args = (jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks))
    imgs_mix, _, _ = augment_batch(key, *args, both_mosaic, mix_on,
                                   cfg=cfg, max_gt=64, train=True)
    imgs_nomix, _, _ = augment_batch(key, *args, both_mosaic, mix_off,
                                     cfg=cfg, max_gt=64, train=True)

    # expected partner: sample 0's SINGLE-path augment (key path mirrors
    # augment_batch: per-sample key -> split(k, 4)[1]); at the default
    # enhance config the partner's _post_enhance is the identity
    k0 = jax.random.split(key, B)[0]
    _, k2, _, _ = jax.random.split(k0, 4)
    partner, _, _ = augment_single(k2, jnp.asarray(tiles[0, 0], jnp.float32),
                                   jnp.asarray(metas[0, 0]),
                                   jnp.asarray(boxes[0, 0]),
                                   jnp.asarray(masks[0, 0]), cfg)
    want = np.asarray(imgs_nomix[1]) * 0.5 + np.asarray(partner) / 255.0 * 0.5
    np.testing.assert_allclose(np.asarray(imgs_mix[1]), want, atol=1e-4)
    # sample 0 (mixup off) untouched
    np.testing.assert_allclose(np.asarray(imgs_mix[0]),
                               np.asarray(imgs_nomix[0]), atol=1e-6)


def test_mixup_partner_sees_post_enhance():
    """With a NON-default enhance config the mixup partner must pass
    through the same opt-in ops as the sample's own branch (round-3
    advisor finding): with flip_ud=1.0 every branch output is the
    deterministic UD mirror of the flip_ud=0.0 run, so the blended
    image must mirror too — it can't if the partner skipped the op."""
    tiles, metas, boxes, masks = _batch(B=2)
    cfg0 = AugConfig(size=S, hue=0, sat=0, val=0, flip_ud=0.0)
    cfgf = cfg0._replace(flip_ud=1.0)
    key = jax.random.PRNGKey(3)
    args = (jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.asarray([True, True]),
            jnp.asarray([True, True]))
    img0, lab0, m0 = augment_batch(key, *args, cfg=cfg0, max_gt=64,
                                   train=True)
    imgf, labf, mf = augment_batch(key, *args, cfg=cfgf, max_gt=64,
                                   train=True)
    np.testing.assert_allclose(np.asarray(imgf),
                               np.asarray(img0)[:, ::-1, :, :], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(mf))
