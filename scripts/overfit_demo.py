#!/usr/bin/env python
"""End-to-end learning proof: overfit a synthetic detection task and
report mAP. Draws bright rectangles on gray backgrounds, trains
yolov7-tiny at 160px for a few hundred steps, then evaluates mAP@0.5 on
the training images. Expected: mAP -> ~1.0.

Run: python scripts/overfit_demo.py [steps]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml
import jax
import jax.numpy as jnp


def make_dataset(tmpdir, n=8, size=320, seed=0):
    import cv2
    rs = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        img = np.full((size, size, 3), 110, np.uint8)
        img += rs.randint(0, 12, img.shape).astype(np.uint8)
        boxes = []
        for _ in range(rs.randint(1, 3)):
            w, h = rs.randint(60, 140), rs.randint(60, 140)
            x1 = rs.randint(0, size - w)
            y1 = rs.randint(0, size - h)
            color = (int(rs.randint(180, 255)), int(rs.randint(0, 80)),
                     int(rs.randint(0, 80)))
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
            boxes.append(f"{x1},{y1},{x1+w},{y1+h},0")
        p = os.path.join(tmpdir, f"ov{i}.jpg")
        cv2.imwrite(p, img)
        lines.append(p + " " + " ".join(boxes) + "\n")
    ann = os.path.join(tmpdir, "train.txt")
    with open(ann, "w") as f:
        f.writelines(lines)
    return ann


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer
    from yolo_continuous_tpu.data.dataset import YoloDataset, load_annotation_file
    from yolo_continuous_tpu.ops.schedules import LRSchedule

    tmpdir = "/tmp/overfit_demo"
    os.makedirs(tmpdir, exist_ok=True)
    ann = make_dataset(tmpdir)

    cfg = yaml.safe_load(open("cfg/raccoon_tiny.yaml"))
    cfg.update(train=ann, val=ann, image_size=160, batch_size=8, max_boxes=16,
               epochs=100, save_dir=tmpdir, save_name="overfit", resume=False,
               adam=True, lrI=0.001, lrF=0.1, decay="Cosine",
               warmup=True, warmup_epochs=3, warmup_max_iter=50)
    plan = TrainPlan(cfg)
    tr = Trainer(plan)
    state = tr.init_state(jax.random.PRNGKey(0))

    ds = YoloDataset(load_annotation_file(ann), 160, 16, mosaic=False,
                     mixup=False, train=True, epoch_length=100)
    batch = ds.batch(list(range(8)))
    rng = jax.random.PRNGKey(1)
    sched = LRSchedule(plan.learn_initial, plan.learn_final, plan.epochs,
                       plan.decay, plan.momentum, plan.warmup,
                       plan.warmup_epochs, plan.warmup_max_iter,
                       plan.warmup_momentum, plan.warmup_bias_lr, 10)
    step_fn = tr.jitted_train_step()
    t0 = time.time()
    for s in range(steps):
        rng, k = jax.random.split(rng)
        imgs, labels, lmask = tr.augment(k, batch, True)
        hy = sched(s)
        state, m = step_fn(state, imgs, labels, lmask, hy.lr_weights,
                           hy.lr_bias, hy.momentum)
        if s % 50 == 0 or s == steps - 1:
            print(f"step {s} loss {float(m['loss']):.4f} fg {int(m['num_fg'])}",
                  flush=True)
    print(f"trained {steps} steps in {time.time()-t0:.1f}s")

    # evaluate with the EMA weights
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.eval.validate import validate
    det = Detector(plan, params=state["ema"].tree["params"],
                   batch_stats=state["ema"].tree["batch_stats"])
    out = validate(plan, detector=det, conf_thres=0.1, nms_thres=0.4)
    print("EMA mAP:", out, flush=True)
    det2 = Detector(plan, params=state["params"], batch_stats=state["batch_stats"])
    out2 = validate(plan, detector=det2, conf_thres=0.1, nms_thres=0.4)
    print("RAW mAP:", out2, flush=True)


if __name__ == "__main__":
    main()
