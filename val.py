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
    ap.add_argument("--device",
                    default=os.environ.get("JAX_PLATFORMS", "").strip(),
                    help="backend: '', 'cpu', 'tpu'")
    args = ap.parse_args()
    if args.device:
        from yolo_continuous_tpu.utils.timing import select_device
        select_device(args.device)
    plan = TrainPlan(check_file(args.cfg))
    validate(plan, conf_thres=args.conf, nms_thres=args.nms,
             max_images=args.max_images)


if __name__ == "__main__":
    main()
