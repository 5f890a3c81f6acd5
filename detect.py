#!/usr/bin/env python
"""Single-image inference entry point.

Public behavior mirrors the reference ``detect.py``
(``predict(cfg_file, image_path, conf, nms)``) plus a real CLI — the
reference hard-codes its paths in ``__main__`` (``detect.py:268-272``).

Usage:
    python detect.py cfg/chip_tiny.yaml resource/horses.jpg --conf 0.3 --nms 0.3
"""
import argparse
import os

from yolo_continuous_tpu.detect_api import predict


def main():
    ap = argparse.ArgumentParser(description="Run single-image inference")
    ap.add_argument("cfg", nargs="?", default="cfg/chip_tiny.yaml")
    ap.add_argument("image", nargs="?", default="resource/horses.jpg")
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--nms", type=float, default=0.3)
    ap.add_argument("--save", default=None, help="write rendered image here")
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--device",
                    default=os.environ.get("JAX_PLATFORMS", "").strip(),
                    help="backend: '', 'cpu', 'tpu'")
    ap.add_argument("--verbose", action="store_true",
                    help="print the per-layer param table "
                         "(Model.print_info parity)")
    args = ap.parse_args()
    if args.device:
        from yolo_continuous_tpu.utils.timing import select_device
        select_device(args.device)
    predict(args.cfg, args.image, conf_threshold=args.conf,
            nms_threshold=args.nms, save_path=args.save, show=args.show,
            verbose=args.verbose)


if __name__ == "__main__":
    main()
