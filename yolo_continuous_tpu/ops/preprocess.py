"""Host-side image preparation (decode + staging letterbox) and the
predict-path letterbox.

Parity targets:
- ``image_enhance/letter_box.py:9-58``  LetterBox (aspect-preserving resize
  + gray pad, or probabilistic full-stretch), used by the predict path
  with fill (114,114,114)
- ``dataset/yolo_dataset_git.py:118-147`` eval-mode letterbox with fill
  (128,128,128), centered
- ``detect.py:16-26`` prepare_test_image (imread -> letterbox -> /255 ->
  CHW; here NHWC)

TPU design note: training images are staged on the host as fixed-size
letterboxed canvases (fill 128, centered); ALL randomized augmentation
(jitter/flip/HSV/mosaic/mixup) then runs on device as one fused batched
graph (``ops/augment.py``). The host does only decode + one resize.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the image
    cv2 = None


@dataclass
class StagingMeta:
    """How an original image sits inside its staging canvas."""
    iw: int       # original width
    ih: int       # original height
    scale: float  # r0 = min(S/iw, S/ih)
    ox: float     # x offset of the image inside the canvas
    oy: float     # y offset


def letterbox(img: np.ndarray, new_shape=(640, 640), color=(114, 114, 114),
              scale_fill: bool = False) -> Tuple[np.ndarray, Tuple[float, float],
                                                 Tuple[float, float]]:
    """Classic letterbox; mirrors image_enhance/letter_box.py:27-58.

    Returns (image, ratio (rx, ry), (dw, dh)); boxes map as
    ``x' = x * rx + dw``, ``y' = y * ry + dh``.
    """
    h0, w0 = img.shape[:2]
    new_w, new_h = (new_shape, new_shape) if isinstance(new_shape, int) else new_shape
    if scale_fill:
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        return img, (new_w / w0, new_h / h0), (0.0, 0.0)
    r = min(new_w / w0, new_h / h0)
    nw, nh = int(round(w0 * r)), int(round(h0 * r))
    dw, dh = (new_w - nw) / 2, (new_h - nh) / 2
    if (w0, h0) != (nw, nh):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=color)
    return img, (r, r), (dw, dh)


def letterbox_boxes(boxes_xyxy: np.ndarray, ratio, offset) -> np.ndarray:
    """Apply the letterbox box remap (letter_box.py:56-58)."""
    out = np.array(boxes_xyxy, np.float32, copy=True)
    if out.size:
        out[:, [0, 2]] = out[:, [0, 2]] * ratio[0] + offset[0]
        out[:, [1, 3]] = out[:, [1, 3]] * ratio[1] + offset[1]
    return out


def stage_image(img_rgb: np.ndarray, size: int = 640,
                fill: int = 128) -> Tuple[np.ndarray, StagingMeta]:
    """Center-letterbox to the staging canvas (train-pipeline host step).

    Matches the geometry of yolo_dataset_git.py:118-131 (centered, gray
    128) but keeps the canvas + placement metadata so the device graph can
    warp back through the original frame.
    """
    ih, iw = img_rgb.shape[:2]
    r = min(size / iw, size / ih)
    nw, nh = int(iw * r), int(ih * r)
    ox, oy = (size - nw) // 2, (size - nh) // 2
    canvas = np.full((size, size, 3), fill, np.uint8)
    resized = cv2.resize(img_rgb, (nw, nh), interpolation=cv2.INTER_CUBIC)
    canvas[oy:oy + nh, ox:ox + nw] = resized
    return canvas, StagingMeta(iw=iw, ih=ih, scale=r, ox=float(ox), oy=float(oy))


def prepare_test_image(image_path: str, target_size=(640, 640)):
    """detect.py:16-26: imread -> LetterBox(114, no stretch) -> /255 NHWC."""
    image = cv2.imread(image_path)  # BGR, like the reference
    img, ratio, offset = letterbox(image, target_size, color=(114, 114, 114),
                                   scale_fill=False)
    data = (np.asarray(img, np.float32) / 255.0)[None]  # (1, H, W, 3) BGR
    return data, image
