#!/usr/bin/env python
"""Training entry point.

Public behavior mirrors the reference ``train.py`` (``train(cfg_file)``
driven by a train-plan YAML) plus a real CLI — the reference hard-codes
its config path in ``__main__`` (``train.py:125-127``, flagged in
SURVEY §1 "no CLI layer").

Usage:
    python train.py [cfg/voc_train.yaml]
"""
import argparse
import os

from yolo_continuous_tpu.config.plan import check_file
from yolo_continuous_tpu.train.train_loop import train


def main():
    ap = argparse.ArgumentParser(description="Train a detector from a plan YAML")
    ap.add_argument("cfg", nargs="?", default="cfg/voc_train.yaml",
                    help="train-plan YAML (default: cfg/voc_train.yaml)")
    ap.add_argument("--device",
                    default=os.environ.get("JAX_PLATFORMS", "").strip(),
                    help="backend: '' (default), 'cpu', 'tpu' "
                         "(select_device analogue; JAX_PLATFORMS env "
                         "honored — the TPU plugin ignores the env var)")
    ap.add_argument("--verbose", action="store_true",
                    help="print the per-layer param table "
                         "(Model.print_info parity, nets/yolo.py:127-141)")
    args = ap.parse_args()
    if args.device:
        from yolo_continuous_tpu.utils.timing import select_device
        select_device(args.device)
    train(check_file(args.cfg), verbose=args.verbose)


if __name__ == "__main__":
    main()
