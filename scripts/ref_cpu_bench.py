#!/usr/bin/env python
"""Measure the torch reference's train-step throughput on THIS host
(round-3 verdict #4: anchor bench.py's ``vs_baseline`` denominator with
a measured number instead of only the documented 55 img/s GPU stand-in).

Times the reference's own step — Model forward under amp.autocast +
YOLOLoss + GradScaler backward + Adam — exactly as train.py:79-88 runs
it, on synthetic batches (no dataloader cost included, which FAVORS the
reference), at the A/B config (yolov7-tiny@320) and at the BASELINE
config (full yolov7@640) as far as CPU tolerates.

Run AFTER any background torch training finishes (1 CPU core).

Usage: python scripts/ref_cpu_bench.py [out.json]
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, "/root/reference")

# torchvision stub (not in image; the train path never calls a tv op)
_tv = types.ModuleType("torchvision")
_tv.ops = types.ModuleType("torchvision.ops")
_tv.transforms = types.ModuleType("torchvision.transforms")
_tv.ops.nms = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
_tv.transforms.RandomEqualize = type("RE", (), {"__init__":
                                                lambda self, *a, **k: None})
sys.modules.update({"torchvision": _tv, "torchvision.ops": _tv.ops,
                    "torchvision.transforms": _tv.transforms})


def time_config(net_cfg, size, batch, nc=16, steps=5):
    import numpy as np
    import torch
    from torch.cuda import amp

    from losses.yolo_loss import YOLOLoss
    from nets.yolo import Model, WeightInitial
    from utils.helper_io import cvt_cfg

    anchors = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
               [142, 110, 192, 243, 459, 401]]
    torch.manual_seed(0)
    net = Model(cvt_cfg(net_cfg), anchors, nc, image_chan=3,
                weight_initial=WeightInitial.Random)
    net.train()
    model_train = torch.nn.DataParallel(net)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    scaler = amp.GradScaler(enabled=True)
    loss_fn = YOLOLoss(np.array(anchors).reshape(-1, 2), nc, (size, size))

    images = torch.rand(batch, 3, size, size)
    # targets in the collate layout the loss expects
    # (yolo_dataset_git.py:405-415): ONE concatenated (N, 6) tensor of
    # [img_idx, cls, cx, cy, w, h] normalized rows
    rows = []
    for i in range(batch):
        rows.append([i, 0, 0.5, 0.5, 0.4, 0.4])
        rows.append([i, 1, 0.3, 0.3, 0.2, 0.25])
    targets = torch.tensor(rows, dtype=torch.float32)

    times = []
    for k in range(steps + 1):
        t0 = time.time()
        with amp.autocast(enabled=True):
            pred = model_train(images)
            loss = loss_fn(pred, targets, images)
        scaler.scale(loss).backward()
        scaler.step(opt)
        scaler.update()
        opt.zero_grad()
        dt = time.time() - t0
        if k > 0:          # skip first (lazy init/alloc)
            times.append(dt)
        print(f"  step {k}: {dt:.2f}s loss {float(loss):.4f}", flush=True)
    med = sorted(times)[len(times) // 2]
    return batch / med, med


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_cpu_bench.json"
    res = {"host": "1-core CPU (same machine as TPU bench)"}
    print("yolov7-tiny @320 bs8 (the A/B config):")
    ips, med = time_config("/root/reference/cfg/net/yolov7-tiny.yaml",
                           320, 8, steps=5)
    res["tiny_320_bs8"] = {"img_s": round(ips, 2), "step_s": round(med, 2)}
    print(f"  -> {ips:.2f} img/s")
    print("yolov7 @640 bs4 (BASELINE config, reduced batch for CPU):")
    ips, med = time_config("/root/reference/cfg/net/yolov7.yaml",
                           640, 4, steps=3)
    res["yolov7_640_bs4"] = {"img_s": round(ips, 2), "step_s": round(med, 2)}
    print(f"  -> {ips:.2f} img/s")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
