#!/usr/bin/env python
"""Benchmark: yolov7 (flagship) training throughput at 640px on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Measures the full jitted training step (bf16 forward + SimOTA loss +
backward + 3-group SGD update + EMA) with device-resident synthetic data,
i.e. the sustained compute throughput of one chip.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is a documented GPU-normalized stand-in: ~55 img/s for
YOLOv7 @640 single-GPU (V100-class) training of the torch reference
(DataParallel, AMP). The BASELINE.json target is >3x this.
"""
import json
import sys
import time

REF_GPU_TRAIN_IPS = 55.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = 640
    nc = 80

    cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
    cfg["image_size"] = size
    cfg["batch_size"] = batch
    cfg["max_boxes"] = 64
    plan = TrainPlan(cfg)

    trainer = Trainer(plan)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
    labels = np.zeros((batch, 64, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    labels[:, 1] = [3, 0.3, 0.3, 0.2, 0.25]
    lmask = np.zeros((batch, 64), bool)
    lmask[:, :2] = True
    labels = jnp.asarray(labels)
    lmask = jnp.asarray(lmask)

    step = trainer.jitted_train_step()
    # warm-up/compile
    state, metrics = step(state, images, labels, lmask, 0.01, 0.1, 0.937)
    _ = float(metrics["loss"])

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, images, labels, lmask, 0.01, 0.1, 0.937)
        _ = float(m["loss"])  # real host sync (block_until_ready is
        return time.perf_counter() - t0  # unreliable through the tunnel)

    # the state chains step-to-step, so every iteration executes for real;
    # subtracting a 1-iteration run cancels the per-sync tunnel RTT.
    t1 = run(1)
    iters = 20
    dt = max(run(iters + 1) - t1, 1e-9)
    ips = iters * batch / dt

    print(json.dumps({
        "metric": "640px train images/sec/chip (yolov7, bf16, SimOTA step)",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / REF_GPU_TRAIN_IPS, 3),
    }))


if __name__ == "__main__":
    main()
