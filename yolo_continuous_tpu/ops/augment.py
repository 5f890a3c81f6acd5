"""Batched on-device augmentation graph (the BASELINE.json centerpiece).

Replaces the reference's per-worker CPU pipeline
(``dataset/yolo_dataset_git.py:101-401``: PIL jitter-resize + paste,
LR flip, HSV LUT, 4-image mosaic with cut-line box merging, 0.5/0.5
mixup) with ONE fused, jitted, vmapped XLA graph:

- every geometric transform is a single ``jax.image.scale_and_translate``
  warp from a fixed-size staging canvas (static shapes; the gray-fill
  border comes from warping ``img - 128`` and adding 128 back),
- HSV gains are computed directly in cv2's HSV ranges (H in [0,180),
  S/V in [0,255]) instead of uint8 LUTs,
- mosaic = 4 warps + quadrant-mask compositing + the reference's
  ``merge_bboxes`` cut-line rules vectorized over a padded box tensor,
- mixup blends a sample with its batch neighbor (the reference draws one
  extra random image; rolling the batch is the batched equivalent),
- boxes ride through as fixed-capacity (max_boxes, 5) [x1,y1,x2,y2,cls]
  pixel tensors + masks; output labels are the collate format
  [cls, cx, cy, w, h] normalized (yolo_dataset_git.py:73-96).

Randomness: per-sample jax PRNG keys — deterministic, reproducible,
race-free (SURVEY §5: the torch loader's worker RNG is neither).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

GRAY = 128.0  # train-pipeline fill (yolo_dataset_git.py:129,167,327)


class AugConfig(NamedTuple):
    size: int = 640
    jitter: float = 0.3        # yolo_dataset_git.py:101
    hue: float = 0.1           # yolo_dataset_git.py:101 (dataset defaults;
    sat: float = 0.7           #  overridden by enhance.yaml when the plan
    val: float = 0.4           #  plumbs it — see aug_config_from_plan)
    scale_min: float = 0.25    # single-image scale range (:153)
    scale_max: float = 2.0
    mosaic_scale_min: float = 0.4   # mosaic tile scale range (:302)
    mosaic_scale_max: float = 1.0
    min_offset_lo: float = 0.3      # mosaic cut position range (:264-265)
    min_offset_hi: float = 0.7
    # box-level copy-paste from the batch neighbor. The reference DECLARES
    # copy_paste/paste_in in enhance.yaml but never implements them
    # (SURVEY §2: image_enhance/random_sample.py is a 0-LoC stub family);
    # implemented here, off by default like the shipped config.
    copy_paste: float = 0.0         # per-box paste probability
    # enhance.yaml-driven knobs (main/enhance_package.py:12-53). flip_lr is
    # the reference dataset's hard-coded 0.5 LR flip; flip_ud/equalize are
    # EnhancePackage capabilities plumbed into the device train path;
    # perspective is the op the reference builds but never inserts
    # (enhance_package.py:32-35) — opt-in here via use_perspective.
    flip_lr: float = 0.5            # yolo_dataset_git.py:160-162
    flip_ud: float = 0.0            # enhance.yaml flip_ud (off in train path
    equalize: float = 0.0           #  unless plumbed); random_flip.py:24-36
    use_perspective: bool = False
    degrees: float = 10.0           # random_perspective.py:40-66 ranges
    translate: float = 0.1
    pscale: float = 0.1
    shear: float = 10.0
    perspective: float = 0.0


def aug_config_from_plan(plan) -> "AugConfig":
    """Build the device AugConfig from a TrainPlan, consuming the plan's
    enhance YAML (``plan.enhance_cfg``) when ``plan.enhance`` is set.

    This fixes the reference wart where ``main/data_loader.py:14-23``
    hard-codes dataset parameters and ignores ``plan.enhance_cfg``
    entirely: HSV gains, flip probabilities, equalize probability and the
    perspective magnitudes here all come from the config.
    """
    c = dict(getattr(plan, "enhance_dict", None) or {})
    if not getattr(plan, "enhance", True):
        c = {}
    base = AugConfig(size=plan.image_size)
    return base._replace(
        hue=c.get("hsv_h", base.hue),
        sat=c.get("hsv_s", base.sat),
        val=c.get("hsv_v", base.val),
        flip_lr=c.get("flip_lr", base.flip_lr),
        flip_ud=c.get("flip_ud", 0.0),
        equalize=c.get("equalize", 0.0),
        copy_paste=c.get("copy_paste", 0.0),
        use_perspective=bool(getattr(plan, "use_perspective", False)),
        degrees=c.get("degrees", base.degrees),
        translate=c.get("translate", base.translate),
        pscale=c.get("scale", base.pscale),
        shear=c.get("shear", base.shear),
        perspective=c.get("perspective", base.perspective),
    )


def _uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


# ---------------------------------------------------------------------------
# color: RGB <-> HSV in cv2 ranges (H in [0,180), S/V in [0,255])
# ---------------------------------------------------------------------------

def rgb_to_hsv_cv(img: jnp.ndarray) -> jnp.ndarray:
    """img float (H,W,3) in 0..255 -> HSV with cv2's ranges."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h = (h * 30.0) % 180.0
    h = jnp.where(diff > 0, h, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0) * 255.0, 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb_cv(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] / 30.0, hsv[..., 1] / 255.0, hsv[..., 2]
    i = jnp.floor(h) % 6
    f = h - jnp.floor(h)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def random_hsv(key, img: jnp.ndarray, hue, sat, val) -> jnp.ndarray:
    """HSV gain jitter; yolo_dataset_git.py:182-197 without the uint8 LUT."""
    r = _uniform(key, -1.0, 1.0, (3,)) * jnp.array([hue, sat, val]) + 1.0
    hsv = rgb_to_hsv_cv(img)
    h = (hsv[..., 0] * r[0]) % 180.0
    s = jnp.clip(hsv[..., 1] * r[1], 0.0, 255.0)
    v = jnp.clip(hsv[..., 2] * r[2], 0.0, 255.0)
    return hsv_to_rgb_cv(jnp.stack([h, s, v], axis=-1))


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def warp_canvas(img: jnp.ndarray, ky, kx, ty, tx, size: int) -> jnp.ndarray:
    """out(y,x) = img((y-ty)/ky, (x-tx)/kx), gray fill outside."""
    out = jax.image.scale_and_translate(
        img - GRAY, (size, size, 3), (0, 1),
        jnp.stack([ky, kx]), jnp.stack([ty, tx]),
        method="linear", antialias=True)
    return out + GRAY


def _jitter_geometry(key, meta, cfg: AugConfig, scale_lo, scale_hi):
    """Sample the jitter-resize geometry of yolo_dataset_git.py:152-159.

    meta = (iw, ih, r0, ox, oy) describing the staging placement.
    Returns (nw, nh) in output px.
    """
    iw, ih = meta[0], meta[1]
    k1, k2, k3 = jax.random.split(key, 3)
    j = cfg.jitter
    new_ar = (iw / ih) * _uniform(k1, 1 - j, 1 + j) / _uniform(k2, 1 - j, 1 + j)
    scale = _uniform(k3, scale_lo, scale_hi)
    s = float(cfg.size)
    nh_if = scale * s
    nw_if = nh_if * new_ar
    nw_else = scale * s
    nh_else = nw_else / new_ar
    lt1 = new_ar < 1
    nw = jnp.where(lt1, nw_if, nw_else)
    nh = jnp.where(lt1, nh_if, nh_else)
    return nw, nh


def _place_tile(img, meta, nw, nh, dx, dy, cfg: AugConfig):
    """Warp a staging canvas so the original occupies (nw, nh) at (dx, dy)."""
    iw, ih, r0, ox, oy = meta
    kx = nw / (iw * r0)
    ky = nh / (ih * r0)
    tx = dx - ox * kx
    ty = dy - oy * ky
    return warp_canvas(img, ky, kx, ty, tx, cfg.size)


def _transform_boxes(boxes, mask, iw, ih, nw, nh, dx, dy, flip, size):
    """Box remap + clip + min-size filter; yolo_dataset_git.py:202-212.

    boxes: (MB, 5) [x1,y1,x2,y2,cls] in ORIGINAL px; flip is pre-resize
    horizontal flip (x -> iw - x), as in the mosaic path (:293-296); for
    the single-image path flip-after-paste is equivalent to flip-before
    because the paste is then mirrored too - we fold both into this form.
    """
    x1, y1, x2, y2, cls = (boxes[:, i] for i in range(5))
    fx1 = jnp.where(flip, iw - x2, x1)
    fx2 = jnp.where(flip, iw - x1, x2)
    sx, sy = nw / iw, nh / ih
    nx1 = fx1 * sx + dx
    nx2 = fx2 * sx + dx
    ny1 = y1 * sy + dy
    ny2 = y2 * sy + dy
    nx1 = jnp.clip(nx1, 0.0, None)
    ny1 = jnp.clip(ny1, 0.0, None)
    nx2 = jnp.minimum(nx2, size)
    ny2 = jnp.minimum(ny2, size)
    ok = mask & (nx2 - nx1 > 1.0) & (ny2 - ny1 > 1.0)
    return jnp.stack([nx1, ny1, nx2, ny2, cls], axis=-1), ok


def augment_single(key, img, meta, boxes, bmask, cfg: AugConfig):
    """Train-mode single-image augmentation; yolo_dataset_git.py:149-214.

    img: (S,S,3) staging canvas float 0..255; meta: (5,) [iw,ih,r0,ox,oy];
    boxes: (MB,5) original-px xyxy+cls.
    Returns (out_img, out_boxes, out_mask) in output px.
    """
    kg, kp, kf, kh = jax.random.split(key, 4)
    iw, ih = meta[0], meta[1]
    s = float(cfg.size)
    nw, nh = _jitter_geometry(kg, meta, cfg, cfg.scale_min, cfg.scale_max)
    kdx, kdy = jax.random.split(kp)
    dx = _uniform(kdx, 0.0, 1.0) * (s - nw)   # rand(0, w-nw); negative ok (:165)
    dy = _uniform(kdy, 0.0, 1.0) * (s - nh)
    flip = jax.random.bernoulli(kf, cfg.flip_lr)

    out = _place_tile(img, meta, nw, nh, dx, dy, cfg)
    out = jnp.where(flip, out[:, ::-1, :], out)
    out = random_hsv(kh, out, cfg.hue, cfg.sat, cfg.val)
    # flip-after-paste == flip-before with mirrored placement:
    fdx = jnp.where(flip, s - dx - nw, dx)
    nb, nm = _transform_boxes(boxes, bmask, iw, ih, nw, nh, fdx, dy, flip, s)
    return out, nb, nm


def _merge_mosaic_boxes(q, boxes, mask, cutx, cuty):
    """Cut-line clipping rules; yolo_dataset_git.py:216-260 (quadrant q)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    spans_y = (y2 >= cuty) & (y1 <= cuty)
    spans_x = (x2 >= cutx) & (x1 <= cutx)
    if q == 0:      # top-left
        drop = (y1 > cuty) | (x1 > cutx)
        y2 = jnp.where(spans_y, cuty, y2)
        x2 = jnp.where(spans_x, cutx, x2)
    elif q == 1:    # bottom-left
        drop = (y2 < cuty) | (x1 > cutx)
        y1 = jnp.where(spans_y, cuty, y1)
        x2 = jnp.where(spans_x, cutx, x2)
    elif q == 2:    # bottom-right
        drop = (y2 < cuty) | (x2 < cutx)
        y1 = jnp.where(spans_y, cuty, y1)
        x1 = jnp.where(spans_x, cutx, x1)
    else:           # top-right
        drop = (y1 > cuty) | (x2 < cutx)
        y2 = jnp.where(spans_y, cuty, y2)
        x1 = jnp.where(spans_x, cutx, x1)
    out = jnp.stack([x1, y1, x2, y2, boxes[:, 4]], axis=-1)
    return out, mask & ~drop


def augment_mosaic(key, tiles, metas, boxes, bmasks, cfg: AugConfig):
    """4-image mosaic; yolo_dataset_git.py:262-391.

    tiles: (4,S,S,3); metas: (4,5); boxes: (4,MB,5); bmasks: (4,MB).
    Returns (img, boxes (4*MB,5), mask (4*MB,)).
    """
    s = float(cfg.size)
    kcx, kcy, kh, *tkeys = jax.random.split(key, 7)
    mox = _uniform(kcx, cfg.min_offset_lo, cfg.min_offset_hi)
    moy = _uniform(kcy, cfg.min_offset_lo, cfg.min_offset_hi)
    cutx = jnp.floor(s * mox)
    cuty = jnp.floor(s * moy)

    imgs, bxs, bms = [], [], []
    for q in range(4):
        kq = tkeys[q] if q < len(tkeys) else jax.random.fold_in(key, q)
        kg, kf = jax.random.split(kq)
        flip = jax.random.bernoulli(kf, cfg.flip_lr)
        nw, nh = _jitter_geometry(kg, metas[q], cfg,
                                  cfg.mosaic_scale_min, cfg.mosaic_scale_max)
        # quadrant placement (:314-325)
        dx = cutx - nw if q in (0, 1) else cutx
        dy = cuty - nh if q in (0, 3) else cuty
        iw, ih = metas[q][0], metas[q][1]
        # flip happens on the original BEFORE resize (:293-296): mirror the
        # staging canvas and flip the offset inside it
        timg = jnp.where(flip, tiles[q][:, ::-1, :], tiles[q])
        tmeta = metas[q]
        img_q = _place_tile(timg, tmeta, nw, nh, dx, dy, cfg)
        nb, nm = _transform_boxes(boxes[q], bmasks[q], iw, ih, nw, nh, dx, dy,
                                  flip, s)
        nb, nm = _merge_mosaic_boxes(q, nb, nm, cutx, cuty)
        imgs.append(img_q)
        bxs.append(nb)
        bms.append(nm)

    yy = jnp.arange(cfg.size, dtype=jnp.float32)[:, None]
    xx = jnp.arange(cfg.size, dtype=jnp.float32)[None, :]
    top = yy < cuty
    left = xx < cutx
    quad = jnp.where(top & left, 0, jnp.where(~top & left, 1,
                     jnp.where(~top & ~left, 2, 3)))  # (:355-362)
    stack = jnp.stack(imgs)  # (4,S,S,3)
    img = jnp.take_along_axis(stack, quad[None, :, :, None].astype(jnp.int32),
                              axis=0)[0]
    img = random_hsv(kh, img, cfg.hue, cfg.sat, cfg.val)  # (:369-384)
    return img, jnp.concatenate(bxs, 0), jnp.concatenate(bms, 0)


def copy_paste_batch(key, imgs, boxes, bmasks, prob: float):
    """Box-level copy-paste from the batch neighbor (capability the
    reference declares in enhance.yaml but leaves unimplemented).

    For each valid box of sample i-1, with probability ``prob`` its
    rectangular patch is pasted onto sample i at the same position and
    its label appended. Rectangle masks keep everything static-shape.
    """
    B, S = imgs.shape[0], imgs.shape[1]
    src_imgs = jnp.roll(imgs, 1, axis=0)
    src_bx = jnp.roll(boxes, 1, axis=0)
    src_bm = jnp.roll(bmasks, 1, axis=0)
    take = jax.random.bernoulli(key, prob, src_bm.shape) & src_bm  # (B, MB)

    yy = jnp.arange(S, dtype=jnp.float32)[:, None]
    xx = jnp.arange(S, dtype=jnp.float32)[None, :]

    def paste_one(img, src, bx, sel):
        # union mask of all selected source boxes
        inside = ((xx[None] >= bx[:, None, None, 0])
                  & (xx[None] < bx[:, None, None, 2])
                  & (yy[None] >= bx[:, None, None, 1])
                  & (yy[None] < bx[:, None, None, 3]))      # (MB, S, S)
        m = jnp.any(inside & sel[:, None, None], axis=0)
        return jnp.where(m[..., None], src, img)

    imgs = jax.vmap(paste_one)(imgs, src_imgs, src_bx, take)
    boxes = jnp.concatenate([boxes, src_bx], axis=1)
    bmasks = jnp.concatenate([bmasks, take], axis=1)
    return imgs, boxes, bmasks


def _post_enhance(key, img, bx, bm, cfg: AugConfig):
    """Opt-in enhance.yaml ops on a composed train sample (px xyxy boxes):
    perspective (the op the reference builds but never inserts,
    main/enhance_package.py:32-35), UD flip, equalize. Static-gated so the
    default config compiles to nothing extra."""
    # lazy import: ops.enhance imports color helpers from this module
    from .enhance import random_equalize, random_flip, random_perspective
    kp, kf, ke = jax.random.split(key, 3)
    if cfg.use_perspective:
        img, bx, bm = random_perspective(
            kp, img, bx, bm, cfg.degrees, cfg.translate, cfg.pscale,
            cfg.shear, cfg.perspective)
    if cfg.flip_ud > 0.0:
        img, bx, bm = random_flip(kf, img, bx, bm, 0.0, cfg.flip_ud)
    if cfg.equalize > 0.0:
        img, bx, bm = random_equalize(ke, img, bx, bm, cfg.equalize)
    return img, bx, bm


def _cap_boxes(boxes, mask, cap: int):
    """Keep the first `cap` valid boxes (static capacity)."""
    order = jnp.argsort(~mask)  # valid first, stable
    boxes = boxes[order][:cap]
    mask = mask[order][:cap]
    return boxes, mask


def boxes_to_labels(boxes, mask, size: int):
    """px xyxy+cls -> normalized [cls, cx, cy, w, h]; yolo_dataset_git.py:79-94."""
    x1, y1, x2, y2, cls = (boxes[..., i] for i in range(5))
    s = float(size)
    w = (x2 - x1) / s
    h = (y2 - y1) / s
    cx = (x1 + x2) / 2.0 / s
    cy = (y1 + y2) / 2.0 / s
    lab = jnp.stack([cls, cx, cy, w, h], axis=-1)
    return lab * mask[..., None]


@partial(jax.jit, static_argnames=("cfg", "max_gt", "train"))
def augment_batch(
    key,
    tiles: jnp.ndarray,      # (B, 4, S, S, 3) uint8 staging canvases
    metas: jnp.ndarray,      # (B, 4, 5) [iw, ih, r0, ox, oy]
    boxes: jnp.ndarray,      # (B, 4, MB, 5) original-px xyxy + cls
    bmasks: jnp.ndarray,     # (B, 4, MB)
    mosaic_flag: jnp.ndarray,  # (B,) bool — host-sampled (prob/epoch gate)
    mixup_flag: jnp.ndarray,   # (B,) bool
    cfg: AugConfig = AugConfig(),
    max_gt: int = 128,
    train: bool = True,
):
    """Full train-batch pipeline -> (images (B,S,S,3) float 0..1,
    labels (B, max_gt, 5) [cls, cx, cy, w, h] normalized, mask (B, max_gt)).

    Eval mode (train=False) reproduces the deterministic letterbox branch
    (yolo_dataset_git.py:118-147): the staging canvas IS that output.
    """
    B, T = tiles.shape[0], tiles.shape[1]
    tiles_f = tiles.astype(jnp.float32)

    if not train:
        def eval_one(img, meta, bx, bm):
            iw, ih, r0, ox, oy = meta
            x1 = bx[:, 0] * r0 + ox
            y1 = bx[:, 1] * r0 + oy
            x2 = bx[:, 2] * r0 + ox
            y2 = bx[:, 3] * r0 + oy
            ok = bm & (x2 - x1 > 1.0) & (y2 - y1 > 1.0)
            nb = jnp.stack([x1, y1, x2, y2, bx[:, 4]], -1)
            return img, nb, ok
        imgs, bx, bm = jax.vmap(eval_one)(tiles_f[:, 0], metas[:, 0],
                                          boxes[:, 0], bmasks[:, 0])
        bx, bm = jax.vmap(lambda b, m: _cap_boxes(b, m, max_gt))(bx, bm)
        labels = boxes_to_labels(bx, bm, cfg.size)
        return imgs / 255.0, labels, bm

    keys = jax.random.split(key, B)

    def one(k, tile4, meta4, box4, bm4, use_mosaic):
        k1, k2, kx, kxp = jax.random.split(k, 4)
        s_img, s_bx, s_bm = augment_single(k2, tile4[0], meta4[0], box4[0],
                                           bm4[0], cfg)
        # the mixup PARTNER also sees the opt-in enhance ops (its own key)
        # — without this, enabling perspective/flip-UD/equalize trains
        # mixup halves under two different recipes. Identity (compiles to
        # nothing) at the default reference-parity config.
        p_img, p_bx, p_bm = _post_enhance(kxp, s_img, s_bx, s_bm, cfg)
        if T == 1:
            # single-tile batches (mosaic disabled at the loader): skip the
            # mosaic branch entirely — 4x less host->device traffic
            img, bx, bm = _post_enhance(kx, s_img, s_bx, s_bm, cfg)
            return img, bx, bm, p_img, p_bx, p_bm
        m_img, m_bx, m_bm = augment_mosaic(k1, tile4, meta4, box4, bm4, cfg)
        pad = m_bx.shape[0] - s_bx.shape[0]
        s_bx_p = jnp.pad(s_bx, ((0, pad), (0, 0)))
        s_bm_p = jnp.pad(s_bm, (0, pad))
        img = jnp.where(use_mosaic, m_img, s_img)
        bx = jnp.where(use_mosaic, m_bx, s_bx_p)
        bm = jnp.where(use_mosaic, m_bm, s_bm_p)
        img, bx, bm = _post_enhance(kx, img, bx, bm, cfg)
        return img, bx, bm, p_img, p_bx, p_bm

    imgs, bx, bm, s_imgs, s_bx, s_bm = jax.vmap(one)(
        keys, tiles_f, metas, boxes, bmasks, mosaic_flag)

    # mixup; yolo_dataset_git.py:393-401. The reference blends the mosaic
    # composite with a FRESH single-augmented image (:59-62) — mixing two
    # mosaic composites (which a naive roll of the outputs would do 25% of
    # the time at the shipped probabilities) trains on ~80-box 0.5-alpha
    # supervision the reference never produces. The batched equivalent of
    # "one extra random image" is the batch NEIGHBOR's single-path
    # augment, which `one` already computes for every sample.
    r_imgs = jnp.roll(s_imgs, 1, axis=0)
    r_bx = jnp.roll(s_bx, 1, axis=0)
    r_bm = jnp.roll(s_bm, 1, axis=0)
    if r_bx.shape[1] < bx.shape[1]:
        pad = bx.shape[1] - r_bx.shape[1]
        r_bx = jnp.pad(r_bx, ((0, 0), (0, pad), (0, 0)))
        r_bm = jnp.pad(r_bm, ((0, 0), (0, pad)))
    do = mixup_flag[:, None, None, None]
    imgs = jnp.where(do, imgs * 0.5 + r_imgs * 0.5, imgs)
    bx = jnp.concatenate([bx, r_bx], axis=1)
    bm = jnp.concatenate([bm, r_bm & mixup_flag[:, None]], axis=1)

    if cfg.copy_paste > 0.0:
        cp_key = jax.random.fold_in(key, 0x5e1f)
        imgs, bx, bm = copy_paste_batch(cp_key, imgs, bx, bm, cfg.copy_paste)

    bx, bm = jax.vmap(lambda b, m: _cap_boxes(b, m, max_gt))(bx, bm)
    labels = boxes_to_labels(bx, bm, cfg.size)
    return imgs / 255.0, labels, bm


@partial(jax.jit, static_argnames=("cfg", "max_gt", "train"))
def augment_batch_from_pool(
    key,
    pool_tiles: jnp.ndarray,   # (N, S, S, 3) uint8 — ALL staged canvases
    pool_metas: jnp.ndarray,   # (N, 5)
    pool_boxes: jnp.ndarray,   # (N, MB, 5)
    pool_masks: jnp.ndarray,   # (N, MB)
    tile_idx: jnp.ndarray,     # (B, T) int32 into the pool
    mosaic_flag: jnp.ndarray,  # (B,) bool
    mixup_flag: jnp.ndarray,   # (B,) bool
    cfg: AugConfig = AugConfig(),
    max_gt: int = 128,
    train: bool = True,
):
    """``augment_batch`` fed from a device-resident staged-image pool.

    Staging is deterministic per image (letterbox only — every random
    draw happens in the device warps), so the whole staged dataset can
    be ``device_put`` ONCE and each step ships just ``(B, T)`` int32
    tile indices + 2 flag vectors instead of ``B*T*S*S*3`` pixel bytes.
    This removes the per-step host->device pixel stream entirely — on
    the tunneled-TPU setup that stream is also mirrored in host RAM
    until process exit (see train_loop `host_sync_every` note), so the
    pool mode is what makes very long schedules feasible. The gather
    and the math are identical to ``augment_batch`` on host-assembled
    tiles (equality-tested in tests/test_augment.py).
    """
    tiles = jnp.take(pool_tiles, tile_idx, axis=0)
    metas = jnp.take(pool_metas, tile_idx, axis=0)
    boxes = jnp.take(pool_boxes, tile_idx, axis=0)
    masks = jnp.take(pool_masks, tile_idx, axis=0)
    return augment_batch(key, tiles, metas, boxes, masks, mosaic_flag,
                         mixup_flag, cfg=cfg, max_gt=max_gt, train=train)
