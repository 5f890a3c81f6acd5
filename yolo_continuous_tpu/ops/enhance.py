"""Stand-alone image-enhance ops (device-side, op-per-class parity).

Parity targets (the ``image_enhance/`` layer, L2 in SURVEY §1):
- ``letter_box.py:9-58``        LetterBox (incl. probabilistic scale_fill)
- ``augment_hsv.py:5-27``       RandomHSV
- ``random_flip.py:6-37``       RandomFlip (lr + ud with box remap)
- ``random_perspective.py:9-101`` RandomPerspective (center/perspective/
  rotation/scale/shear/translation matrix composition, warp, 4-corner box
  transform + clip + area/aspect candidate filter)
- torchvision ``RandomEqualize`` as used by ``main/enhance_package.py:30``
- ``main/enhance_package.py:12-53`` EnhancePackage (config-driven pipeline)

Every op is a pure jittable function ``(key, img, boxes, mask) ->
(img, boxes, mask)`` over float images (0..255) and xyxy pixel boxes with
a static-capacity validity mask — the device-side analogue of the
reference's ``(img, boxes) -> (img, boxes)`` callables. The reference's
mosaic stub ``random_sample.py`` (0 LoC) is realized for real in
``ops/augment.augment_mosaic``.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .augment import GRAY, hsv_to_rgb_cv, rgb_to_hsv_cv


def _uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


# ---------------------------------------------------------------------------
# LetterBox (device variant; the host/cv2 variant lives in ops/preprocess)
# ---------------------------------------------------------------------------

def letter_box(key, img, boxes, mask, new_shape: int = 640,
               scale_fill_prob: float = 1.0, color: float = 114.0):
    """Aspect-preserving resize + pad, or probabilistic full stretch.

    img: (H, W, 3) float 0..255 (static shape). Mirrors
    letter_box.py:27-58 with jax.image warps instead of cv2.
    """
    h0, w0 = img.shape[:2]
    s = float(new_shape)
    stretch = jax.random.uniform(key) < scale_fill_prob

    r = min(s / w0, s / h0)
    dw = (s - w0 * r) / 2.0
    dh = (s - h0 * r) / 2.0

    kx = jnp.where(stretch, s / w0, r)
    ky = jnp.where(stretch, s / h0, r)
    tx = jnp.where(stretch, 0.0, dw)
    ty = jnp.where(stretch, 0.0, dh)
    out = jax.image.scale_and_translate(
        img - color, (new_shape, new_shape, 3), (0, 1),
        jnp.stack([ky, kx]), jnp.stack([ty, tx]), method="linear",
        antialias=True) + color
    nb = boxes.at[:, 0].set(boxes[:, 0] * kx + tx)
    nb = nb.at[:, 2].set(boxes[:, 2] * kx + tx)
    nb = nb.at[:, 1].set(boxes[:, 1] * ky + ty)
    nb = nb.at[:, 3].set(boxes[:, 3] * ky + ty)
    return out, nb, mask


# ---------------------------------------------------------------------------
# RandomHSV / RandomEqualize
# ---------------------------------------------------------------------------

def random_hsv(key, img, boxes, mask, hgain=0.015, sgain=0.7, vgain=0.4):
    """Per-image HSV gain jitter; augment_hsv.py:16-27."""
    r = _uniform(key, -1.0, 1.0, (3,)) * jnp.array([hgain, sgain, vgain]) + 1.0
    hsv = rgb_to_hsv_cv(img)
    h = (hsv[..., 0] * r[0]) % 180.0
    s = jnp.clip(hsv[..., 1] * r[1], 0.0, 255.0)
    v = jnp.clip(hsv[..., 2] * r[2], 0.0, 255.0)
    return hsv_to_rgb_cv(jnp.stack([h, s, v], -1)), boxes, mask


def equalize(img):
    """Per-channel histogram equalization, bit-exact to the PIL algorithm
    that torchvision's ``RandomEqualize`` implements (the op used by
    ``main/enhance_package.py:30``): per channel,
    ``step = (total - last_nonzero_count) // 255`` and
    ``lut[i] = (step//2 + sum_{j<i} hist[j]) // step`` (identity when
    step == 0), all in integer math.
    """
    def eq_chan(c):
        q = jnp.clip(jnp.round(c), 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.int32).at[q.reshape(-1)].add(1)
        nz = hist > 0
        last_nz = hist[255 - jnp.argmax(nz[::-1])]
        step = (jnp.sum(hist) - last_nz) // 255
        cum_before = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)[:-1]])
        lut = jnp.clip((step // 2 + cum_before) // jnp.maximum(step, 1),
                       0, 255)
        return jnp.where(step == 0, q, lut[q]).astype(jnp.float32)
    return jnp.stack([eq_chan(img[..., i]) for i in range(img.shape[-1])], -1)


def random_equalize(key, img, boxes, mask, prob: float = 0.0):
    do = jax.random.uniform(key) < prob
    return jnp.where(do, equalize(img), img), boxes, mask


# ---------------------------------------------------------------------------
# RandomFlip
# ---------------------------------------------------------------------------

def random_flip(key, img, boxes, mask, flip_lr_prob=0.5, flip_ud_prob=0.5):
    """LR/UD flips with box remap; random_flip.py:20-37."""
    h, w = img.shape[0], img.shape[1]
    k1, k2 = jax.random.split(key)
    do_lr = jax.random.uniform(k1) < flip_lr_prob
    do_ud = jax.random.uniform(k2) < flip_ud_prob
    img = jnp.where(do_lr, img[:, ::-1, :], img)
    img = jnp.where(do_ud, img[::-1, :, :], img)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    nx1 = jnp.where(do_lr, w - x2, x1)
    nx2 = jnp.where(do_lr, w - x1, x2)
    ny1 = jnp.where(do_ud, h - y2, y1)
    ny2 = jnp.where(do_ud, h - y1, y2)
    nb = jnp.stack([nx1, ny1, nx2, ny2] + [boxes[:, i] for i in range(4, boxes.shape[1])], -1)
    return img, nb, mask


# ---------------------------------------------------------------------------
# RandomPerspective
# ---------------------------------------------------------------------------

class PerspectiveCfg(NamedTuple):
    degrees: float = 10.0
    translate: float = 0.1
    scale: float = 0.1
    shear: float = 10.0
    perspective: float = 0.0


def _perspective_matrix(key, h: int, w: int, cfg: PerspectiveCfg):
    """Compose center @ perspective @ rotation/scale @ shear @ translation
    exactly as random_perspective.py:40-66 (same order, same ranges)."""
    k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 8)

    center = jnp.eye(3)
    center = center.at[0, 2].set(-w / 2.0)
    center = center.at[1, 2].set(-h / 2.0)

    pers = jnp.eye(3)
    pers = pers.at[2, 0].set(_uniform(k1, -cfg.perspective, cfg.perspective))
    pers = pers.at[2, 1].set(_uniform(k2, -cfg.perspective, cfg.perspective))

    a = _uniform(k3, -cfg.degrees, cfg.degrees) * math.pi / 180.0
    s = _uniform(k4, 1 - cfg.scale, 1.1 + cfg.scale)  # note the 1.1 (:53)
    cos_a, sin_a = jnp.cos(a) * s, jnp.sin(a) * s
    rot = jnp.eye(3)
    # cv2.getRotationMatrix2D(center=(0,0), angle, scale) convention
    rot = rot.at[0, 0].set(cos_a).at[0, 1].set(sin_a)
    rot = rot.at[1, 0].set(-sin_a).at[1, 1].set(cos_a)

    shear = jnp.eye(3)
    shear = shear.at[0, 1].set(jnp.tan(_uniform(k5, -cfg.shear, cfg.shear) * math.pi / 180))
    shear = shear.at[1, 0].set(jnp.tan(_uniform(k6, -cfg.shear, cfg.shear) * math.pi / 180))

    trans = jnp.eye(3)
    trans = trans.at[0, 2].set(_uniform(k7, 0.5 - cfg.translate, 0.5 + cfg.translate) * w)
    trans = trans.at[1, 2].set(_uniform(k8, 0.5 - cfg.translate, 0.5 + cfg.translate) * h)

    return trans @ shear @ rot @ pers @ center


def _warp_image(img, matrix, fill: float = 114.0):
    """Inverse-map bilinear warp (gather-based): out(p) = img(M^-1 p)."""
    h, w = img.shape[:2]
    inv = jnp.linalg.inv(matrix)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xx)
    pts = jnp.stack([xx, yy, ones])            # (3, H, W) in (x, y, 1)
    src = jnp.einsum("ij,jhw->ihw", inv, pts)
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    inside = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)

    def sample(c):
        return jax.scipy.ndimage.map_coordinates(
            c, [sy, sx], order=1, mode="constant", cval=fill)
    out = jnp.stack([sample(img[..., i]) for i in range(img.shape[-1])], -1)
    return jnp.where(inside[..., None], out, fill)


def box_candidates(box1, box2, wh_thr=2.0, ar_thr=20.0, area_thr=0.1,
                   eps=1e-16):
    """Area/aspect survivor filter; random_perspective.py:95-101.
    box1/box2: (..., 4) xyxy (pre/post transform)."""
    w1 = box1[..., 2] - box1[..., 0]
    h1 = box1[..., 3] - box1[..., 1]
    w2 = box2[..., 2] - box2[..., 0]
    h2 = box2[..., 3] - box2[..., 1]
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


def random_perspective(key, img, boxes, mask, degrees=10.0, translate=0.1,
                       scale=0.1, shear=10.0, perspective=0.0):
    """Full random perspective/affine; random_perspective.py:27-101.

    boxes: (MB, >=4) xyxy px + trailing fields; returns warped image and
    transformed/clipped/filtered boxes with an updated mask.
    """
    h, w = img.shape[0], img.shape[1]
    cfg = PerspectiveCfg(degrees, translate, scale, shear, perspective)
    k_m, _ = jax.random.split(key)
    m = _perspective_matrix(k_m, h, w, cfg)
    out = _warp_image(img, m)

    # 4-corner transform (:73-86)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = jnp.stack([
        jnp.stack([x1, y1], -1), jnp.stack([x2, y2], -1),
        jnp.stack([x1, y2], -1), jnp.stack([x2, y1], -1)], axis=1)  # (MB,4,2)
    ones = jnp.ones(corners.shape[:-1] + (1,))
    pts = jnp.concatenate([corners, ones], -1) @ m.T                 # (MB,4,3)
    use_persp = perspective != 0.0
    xy = pts[..., :2] / pts[..., 2:3] if use_persp else pts[..., :2]
    nx1 = jnp.clip(jnp.min(xy[..., 0], axis=1), 0, w)
    ny1 = jnp.clip(jnp.min(xy[..., 1], axis=1), 0, h)
    nx2 = jnp.clip(jnp.max(xy[..., 0], axis=1), 0, w)
    ny2 = jnp.clip(jnp.max(xy[..., 1], axis=1), 0, h)
    new = jnp.stack([nx1, ny1, nx2, ny2] +
                    [boxes[:, i] for i in range(4, boxes.shape[1])], -1)

    # candidate filter vs scale-adjusted originals (:91-92; the reference
    # uses the sampled rotation scale s — sqrt|det| recovers it)
    scale_est = jnp.sqrt(jnp.abs(jnp.linalg.det(m[:2, :2])))
    keep = box_candidates(boxes[:, :4] * scale_est, new[:, :4], area_thr=0.10)
    return out, new, mask & keep


# ---------------------------------------------------------------------------
# EnhancePackage
# ---------------------------------------------------------------------------

class EnhancePackage:
    """Config-driven pipeline from an enhance YAML dict.

    Mirrors main/enhance_package.py:12-53: constructs equalize / hsv /
    flip / perspective / letterbox from the cfg; like the reference, the
    active chain is equalize -> hsv -> flip -> letterbox. The constructed
    perspective op is exposed as ``self.perspective`` (the reference
    builds it but never inserts it, enhance_package.py:32-35 — kept
    opt-in here via ``use_perspective=True`` rather than silently dropped).
    """

    def __init__(self, target_shape: int, enhance_cfg: dict,
                 use_perspective: bool = False):
        self.size = target_shape if isinstance(target_shape, int) else target_shape[0]
        c = enhance_cfg
        self.cfg = c
        self.use_perspective = use_perspective

    def __call__(self, key, img, boxes, mask, enhance: bool = True):
        c = self.cfg
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        if enhance:
            img, boxes, mask = random_equalize(k1, img, boxes, mask,
                                               c.get("equalize", 0.0))
            img, boxes, mask = random_hsv(k2, img, boxes, mask,
                                          c.get("hsv_h", 0.015),
                                          c.get("hsv_s", 0.7),
                                          c.get("hsv_v", 0.4))
            img, boxes, mask = random_flip(k3, img, boxes, mask,
                                           c.get("flip_lr", 0.5),
                                           c.get("flip_ud", 0.5))
            if self.use_perspective:
                img, boxes, mask = random_perspective(
                    k4, img, boxes, mask, c.get("degrees", 10.0),
                    c.get("translate", 0.1), c.get("scale", 0.1),
                    c.get("shear", 10.0), c.get("perspective", 0.0))
        return letter_box(k5, img, boxes, mask, self.size,
                          c.get("scale_fill", 1.0))
