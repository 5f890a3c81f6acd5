"""Stand-alone enhance-op tests (ops/enhance.py vs image_enhance/*)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.ops.enhance import (EnhancePackage, box_candidates,
                                             equalize, letter_box,
                                             random_flip, random_perspective)


def _img(h=64, w=64, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randint(0, 255, (h, w, 3)).astype(np.float32))


def test_letterbox_no_stretch_geometry():
    img = _img(32, 64)  # wide
    boxes = jnp.asarray([[0.0, 0.0, 64.0, 32.0, 0.0]])
    mask = jnp.asarray([True])
    out, nb, _ = letter_box(jax.random.PRNGKey(0), img, boxes, mask,
                            new_shape=64, scale_fill_prob=0.0)
    assert out.shape == (64, 64, 3)
    # r = 1 (64/64); dh = (64-32)/2 = 16
    np.testing.assert_allclose(np.asarray(nb[0, :4]), [0, 16, 64, 48], atol=1e-4)
    # padded rows are gray 114
    assert abs(float(out[0].mean()) - 114.0) < 2.0


def test_letterbox_stretch():
    img = _img(32, 64)
    boxes = jnp.asarray([[0.0, 0.0, 64.0, 32.0, 0.0]])
    out, nb, _ = letter_box(jax.random.PRNGKey(0), img, boxes,
                            jnp.asarray([True]), 64, scale_fill_prob=1.0)
    np.testing.assert_allclose(np.asarray(nb[0, :4]), [0, 0, 64, 64], atol=1e-4)


def test_random_flip_boxes():
    img = _img()
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 40.0, 1.0]])
    mask = jnp.asarray([True])
    # find keys that certainly flip (prob 1)
    out, nb, _ = random_flip(jax.random.PRNGKey(0), img, boxes, mask,
                             flip_lr_prob=1.0, flip_ud_prob=0.0)
    np.testing.assert_allclose(np.asarray(nb[0, :4]), [64 - 30, 20, 64 - 10, 40])
    out, nb, _ = random_flip(jax.random.PRNGKey(0), img, boxes, mask,
                             flip_lr_prob=0.0, flip_ud_prob=1.0)
    np.testing.assert_allclose(np.asarray(nb[0, :4]), [10, 64 - 40, 30, 64 - 20])


def test_random_perspective_identity_limits():
    """With all magnitudes 0 the warp is translation-to-center only."""
    img = _img()
    boxes = jnp.asarray([[10.0, 10.0, 50.0, 50.0, 0.0]])
    mask = jnp.asarray([True])
    out, nb, nm = random_perspective(jax.random.PRNGKey(0), img, boxes, mask,
                                     degrees=0.0, translate=0.0, scale=0.0,
                                     shear=0.0, perspective=0.0)
    # scale in [1, 1.1]: box roughly preserved; still valid
    assert bool(nm[0])
    b = np.asarray(nb[0, :4])
    assert 0 <= b[0] <= 20 and 40 <= b[2] <= 64


def test_random_perspective_rotation_grows_box():
    img = _img()
    boxes = jnp.asarray([[22.0, 22.0, 42.0, 42.0, 0.0]])
    mask = jnp.asarray([True])
    out, nb, nm = random_perspective(jax.random.PRNGKey(1), img, boxes, mask,
                                     degrees=45.0, translate=0.0, scale=0.0,
                                     shear=0.0)
    b = np.asarray(nb[0, :4])
    # rotated square's AABB is larger than the original (up to sqrt(2)x)
    assert (b[2] - b[0]) >= 19.0


def test_box_candidates_filter():
    box1 = jnp.asarray([[0.0, 0, 100, 100], [0, 0, 100, 100]])
    box2 = jnp.asarray([[0.0, 0, 90, 90], [0, 0, 1.5, 90]])  # second too thin
    keep = np.asarray(box_candidates(box1, box2))
    assert keep.tolist() == [True, False]


def test_equalize_spreads_histogram():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(100, 140, (32, 32, 3)).astype(np.float32))
    out = np.asarray(equalize(img))
    assert out.std() > np.asarray(img).std() * 2


def test_equalize_bit_exact_vs_pil():
    """Golden: equalize == PIL ImageOps.equalize (the algorithm torchvision's
    RandomEqualize implements; main/enhance_package.py:30)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    from PIL import ImageOps
    rs = np.random.RandomState(7)
    cases = [
        rs.randint(0, 256, (37, 53, 3)).astype(np.uint8),
        (rs.rand(64, 48, 3) ** 3 * 255).astype(np.uint8),   # skewed histogram
        np.full((16, 16, 3), 77, np.uint8),                 # degenerate: identity
        np.clip(rs.normal(128, 20, (40, 40, 3)), 0, 255).astype(np.uint8),
    ]
    for arr in cases:
        golden = np.asarray(ImageOps.equalize(PIL_Image.fromarray(arr)))
        ours = np.asarray(equalize(arr.astype(np.float32))).astype(np.uint8)
        np.testing.assert_array_equal(ours, golden)


def test_enhance_package_pipeline():
    cfg = {"scale_fill": 0.0, "equalize": 0.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "degrees": 10, "translate": 0.1, "scale": 0.1,
           "shear": 10, "perspective": 0.0, "flip_ud": 0.5, "flip_lr": 0.5}
    pkg = EnhancePackage(64, cfg)
    img = _img(48, 64)
    boxes = jnp.asarray([[5.0, 5.0, 40.0, 40.0, 0.0]])
    mask = jnp.asarray([True])
    out, nb, nm = pkg(jax.random.PRNGKey(0), img, boxes, mask, enhance=True)
    assert out.shape == (64, 64, 3)
    # enhance=False -> letterbox only (enhance_package.py:41-48)
    out2, nb2, _ = pkg(jax.random.PRNGKey(0), img, boxes, mask, enhance=False)
    assert out2.shape == (64, 64, 3)
