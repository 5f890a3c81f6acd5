"""Dataset-level validation: batched inference -> mAP.

NEW capability vs the reference (loss-only validation, train.py:104-112;
no mAP anywhere — SURVEY §5). Drives the device-side Detector over a val
index file in fixed-size batches, un-maps letterboxed boxes, and feeds
the numpy evaluator.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..config.plan import TrainPlan
from ..data.dataset import Annotation, load_annotation_file
from ..detect_api import Detector
from ..eval.evaluator import (DetectionRecord, GroundTruthRecord,
                              MAPEvaluator)
from ..ops.nms import yolo_correct_boxes
from ..ops.preprocess import letterbox

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def validate(plan: TrainPlan, detector: Optional[Detector] = None,
             annotations: Optional[Sequence[Annotation]] = None,
             conf_thres: float = 0.01, nms_thres: float = 0.4,
             max_det: int = 300, max_images: Optional[int] = None,
             log=print) -> dict:
    """Run mAP evaluation over ``plan.val_indexes``."""
    det = detector or Detector(plan)
    anns = annotations if annotations is not None else \
        load_annotation_file(plan.val_indexes)
    if max_images:
        anns = anns[:max_images]
    size = (plan.image_size, plan.image_size)
    ev = MAPEvaluator(plan.num_labels)

    batch = max(int(plan.batch_size), 1)
    for start in range(0, len(anns), batch):
        chunk = anns[start:start + batch]
        imgs, shapes = [], []
        for ann in chunk:
            bgr = cv2.imread(ann.path)
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            img, _, _ = letterbox(rgb, size, (114, 114, 114))
            imgs.append(img)
            shapes.append(rgb.shape[:2])
        # pad the final partial batch so the jit shape is stable
        npad = batch - len(chunk)
        if npad:
            imgs += [imgs[-1]] * npad
        images = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
        boxes, scores, classes, valid = det(images, conf_thres, nms_thres,
                                            max_det)
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        classes = np.asarray(classes)
        valid = np.asarray(valid)
        for i, ann in enumerate(chunk):
            m = valid[i]
            mapped = np.asarray(yolo_correct_boxes(
                jnp.asarray(boxes[i]), size, shapes[i], True))  # y1x1y2x2
            xyxy = mapped[:, [1, 0, 3, 2]]
            ev.add(DetectionRecord(xyxy[m], scores[i][m], classes[i][m]),
                   GroundTruthRecord(ann.boxes[:, :4],
                                     ann.boxes[:, 4].astype(np.int32)))
    summary = ev.summary()
    log(" ".join(f"{k}={v:.4f}" for k, v in summary.items()))
    return summary
