#!/usr/bin/env python
"""Validation entry point: mAP over the plan's val set.

New capability vs the reference (which validates on loss only and has no
mAP evaluation anywhere; SURVEY §5).

Usage:
    python val.py cfg/voc_train.yaml [--conf 0.01] [--nms 0.4] [--max-images N]
"""
import argparse
import os

from yolo_continuous_tpu.config.plan import TrainPlan, check_file
from yolo_continuous_tpu.eval.validate import validate


def main():
    ap = argparse.ArgumentParser(description="Evaluate mAP on the val set")
    ap.add_argument("cfg", nargs="?", default="cfg/voc_train.yaml")
    ap.add_argument("--conf", type=float, default=0.01)
    ap.add_argument("--nms", type=float, default=0.4)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--quantize", action="store_true",
                    help="evaluate the int8 PTQ serving path (calibrates "
                         "on the first val batch) — quantified accuracy "
                         "cost of Detector(quantize=True)")
    ap.add_argument("--calib-images", type=int, default=16,
                    help="val images used for int8 calibration")
    ap.add_argument("--device",
                    default=os.environ.get("JAX_PLATFORMS", "").strip(),
                    help="backend: '', 'cpu', 'tpu'")
    args = ap.parse_args()
    if args.device:
        from yolo_continuous_tpu.utils.timing import select_device
        select_device(args.device)
    plan = TrainPlan(check_file(args.cfg))
    detector = None
    if args.quantize:
        import cv2
        import jax.numpy as jnp
        import numpy as np

        from yolo_continuous_tpu.data.dataset import load_annotation_file
        from yolo_continuous_tpu.detect_api import Detector
        from yolo_continuous_tpu.ops.preprocess import letterbox

        detector = Detector(plan, quantize=True)
        size = (plan.image_size, plan.image_size)
        imgs = []
        for ann in load_annotation_file(plan.val_indexes)[:args.calib_images]:
            rgb = cv2.cvtColor(cv2.imread(ann.path), cv2.COLOR_BGR2RGB)
            imgs.append(letterbox(rgb, size, (114, 114, 114))[0])
        detector.calibrate(jnp.asarray(np.stack(imgs), jnp.float32) / 255.0)
        print(f"int8 calibration: {len(imgs)} val images")
    validate(plan, detector=detector, conf_thres=args.conf,
             nms_thres=args.nms, max_images=args.max_images)


if __name__ == "__main__":
    main()
