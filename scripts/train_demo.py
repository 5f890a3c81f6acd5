#!/usr/bin/env python
"""Generalization demo through the PRODUCTION path: real Trainer.run()
(native C++ staging, device mosaic/mixup augmentation, LR schedule, EMA,
checkpoints) on a synthetic 2-class shapes dataset with a held-out val
split, then mAP via the standard validate() pipeline.

Run: python scripts/train_demo.py [epochs]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml
import jax


def make_dataset(tmpdir, n_train=120, n_val=24, size=320, seed=0):
    import cv2
    rs = np.random.RandomState(seed)

    def gen(n, prefix):
        lines = []
        for i in range(n):
            img = np.full((size, size, 3), 120, np.uint8)
            img += rs.randint(0, 16, img.shape).astype(np.uint8)
            boxes = []
            for _ in range(rs.randint(1, 4)):
                w, h = rs.randint(50, 120), rs.randint(50, 120)
                x1 = rs.randint(0, size - w)
                y1 = rs.randint(0, size - h)
                cls = rs.randint(0, 2)
                if cls == 0:  # red rectangle
                    color = (int(rs.randint(170, 255)), 30, 30)
                    cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
                else:         # blue ellipse
                    color = (30, 30, int(rs.randint(170, 255)))
                    cv2.ellipse(img, (x1 + w // 2, y1 + h // 2),
                                (w // 2, h // 2), 0, 0, 360, color, -1)
                boxes.append(f"{x1},{y1},{x1+w},{y1+h},{cls}")
            p = os.path.join(tmpdir, f"{prefix}{i}.jpg")
            cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            lines.append(p + " " + " ".join(boxes) + "\n")
        ann = os.path.join(tmpdir, f"{prefix}.txt")
        with open(ann, "w") as f:
            f.writelines(lines)
        return ann

    return gen(n_train, "train"), gen(n_val, "val")


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.eval.validate import validate

    tmpdir = "/tmp/train_demo"
    os.makedirs(tmpdir, exist_ok=True)
    train_ann, val_ann = make_dataset(tmpdir)

    cfg = yaml.safe_load(open("cfg/raccoon_tiny.yaml"))
    cfg.update(train=train_ann, val=val_ann, image_size=320, batch_size=8,
               max_boxes=32, epochs=epochs, save_dir=tmpdir,
               save_name="demo", resume=False, adam=True, lrI=0.001,
               lrF=0.1, decay="Cosine", warmup=True, warmup_epochs=2,
               warmup_max_iter=30, cache_images=True,
               labels=["red_rect", "blue_ellipse"])
    plan = TrainPlan(cfg)
    tr = Trainer(plan)
    t0 = time.time()
    state = tr.run()
    print(f"trained {epochs} epochs in {time.time()-t0:.0f}s")

    det = Detector(plan, params=state["ema"].tree["params"],
                   batch_stats=state["ema"].tree["batch_stats"])
    print("held-out val:")
    validate(plan, detector=det, conf_thres=0.1, nms_thres=0.4)


if __name__ == "__main__":
    main()
