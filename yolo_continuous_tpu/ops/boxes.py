"""Bounding-box math (pure, jit/vmap-safe).

Parity targets in the reference:
- ``utils/bbox.py:29-59``  cvt_bbox (XYXY / XXYY / XYWH conversions)
- ``utils/bbox.py:62-72``  box_iou (NxM IoU matrix)
- ``utils/bbox.py:75-118`` bbox_iou (elementwise IoU + GIoU/DIoU/CIoU)
- ``utils/bbox.py:201-204`` make_grid

All functions are shape-polymorphic pure jnp functions; boxes ride on the
last axis so everything vmaps/batches freely (the torch original hard-codes
2-D ``(n, 4)`` tensors and transposes).
"""
from __future__ import annotations

import math
from enum import Enum

import jax.numpy as jnp
from jax import lax


class BBoxType(Enum):
    XYXY = 0  # x1, y1, x2, y2
    XYWH = 1  # cx, cy, w, h
    XXYY = 2  # x1, x2, y1, y2


class CvtFlag(Enum):
    CVT_XXYY_XYXY = 0
    CVT_XXYY_XYWH = 1
    CVT_XYXY_XXYY = 2
    CVT_XYXY_XYWH = 3
    CVT_XYWH_XXYY = 4
    CVT_XYWH_XYXY = 5


def cvt_bbox(bbox: jnp.ndarray, flag: CvtFlag) -> jnp.ndarray:
    """Convert box format along the last axis. Mirrors ``utils/bbox.py:29-59``."""
    a, b, c, d = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    if flag in (CvtFlag.CVT_XXYY_XYXY, CvtFlag.CVT_XYXY_XXYY):
        out = jnp.stack([a, c, b, d], axis=-1)
    elif flag == CvtFlag.CVT_XXYY_XYWH:
        # bbox = x1, x2, y1, y2
        w = b - a
        h = d - c
        out = jnp.stack([a + w / 2, c + h / 2, w, h], axis=-1)
    elif flag == CvtFlag.CVT_XYXY_XYWH:
        w = c - a
        h = d - b
        out = jnp.stack([a + w / 2, b + h / 2, w, h], axis=-1)
    elif flag == CvtFlag.CVT_XYWH_XXYY:
        out = jnp.stack([a - c / 2, a + c / 2, b - d / 2, b + d / 2], axis=-1)
    elif flag == CvtFlag.CVT_XYWH_XYXY:
        out = jnp.stack([a - c / 2, b - d / 2, a + c / 2, b + d / 2], axis=-1)
    else:  # pragma: no cover
        raise ValueError(f"bad flag {flag}")
    return out


def box_area(box: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes along the last axis."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix of xyxy boxes, ``(..., N, 4) x (..., M, 4) -> (..., N, M)``.

    Mirrors ``utils/bbox.py:62-72``.
    """
    area1 = box_area(box1)  # (..., N)
    area2 = box_area(box2)  # (..., M)
    lt = jnp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = jnp.minimum(box1[..., :, None, 2:], box2[..., None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0, None), axis=-1)  # (..., N, M)
    return inter / (area1[..., :, None] + area2[..., None, :] - inter)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    x1y1x2y2: bool = True,
    giou: bool = False,
    diou: bool = False,
    ciou: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Elementwise IoU (optionally GIoU/DIoU/CIoU) of broadcast-compatible boxes.

    Boxes ride on the last axis. Replicates the exact formula set of
    ``utils/bbox.py:75-118`` including its epsilon placement (``h + eps`` only)
    and the no-grad alpha of CIoU (``:111-112``, stop_gradient here).
    """
    if x1y1x2y2:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))
    else:  # xywh -> xyxy
        b1_x1, b1_x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
        b1_y1, b1_y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
        b2_x1, b2_x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
        b2_y1, b2_y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * \
            jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None)

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if ciou or diou:
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 +
                (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if diou:
            return iou - rho2 / c2
        v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def make_grid(nx: int = 20, ny: int = 20) -> jnp.ndarray:
    """``(1, 1, ny, nx, 2)`` grid of (x, y) cell indices. Mirrors ``utils/bbox.py:201-204``."""
    yv, xv = jnp.meshgrid(jnp.arange(ny), jnp.arange(nx), indexing="ij")
    return jnp.stack((xv, yv), 2).reshape(1, 1, ny, nx, 2).astype(jnp.float32)
