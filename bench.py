#!/usr/bin/env python
"""Benchmark: all three BASELINE.json metrics on one chip, ONE JSON line.

Headline metric (the driver-recorded ``value``): yolov7 (flagship)
training throughput at 640px — full jitted step (bf16 forward + SimOTA
loss + backward + 3-group SGD + EMA) with device-resident data, best of
a small batch-size sweep. Extra keys carry the other BASELINE metrics:

- ``infer_img_s``  end-to-end batched inference (forward + device decode
  + device NMS) images/sec — the path replacing detect.py:29-144
- ``nms_p50_ms``   NMS p50 latency, 25200 candidates -> 300 kept — the
  op replacing the torchvision host round-trip (detect.py:130-140)
- ``train_sweep``  per-batch-size train throughput

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so
the denominator is a documented GPU-normalized stand-in: ~55 img/s for
YOLOv7 @640 single-GPU (V100-class) training of the torch reference
(DataParallel, AMP). The BASELINE.json target is >3x this.

Measurement notes (axon tunnel): every host sync costs a ~100ms RTT, so
iterations are chained (state/input feeds the next step — the device
must execute them all) and a 1-iteration run is subtracted to cancel
the sync RTT.
"""
import json
import os
import sys
import time

REF_GPU_TRAIN_IPS = 55.0
# measured on THIS host (scripts/ref_cpu_bench.py, BASELINE.md): the
# unmodified torch reference train step, yolov7 @640 — a second, honest
# anchor for the ratio (the 55 GPU-normalized stand-in stays primary)
REF_CPU_MEASURED_IPS = 0.21

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_bench_cache")


def _setup_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_train(batch, size=640, iters=20, extra_cfg=None,
                image_dtype="float32"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer

    cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
    cfg["image_size"] = size
    cfg["batch_size"] = batch
    cfg["max_boxes"] = 64
    cfg.update(extra_cfg or {})
    plan = TrainPlan(cfg)

    trainer = Trainer(plan)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(batch, size, size, 3),
                         getattr(jnp, image_dtype))
    labels = np.zeros((batch, 64, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    labels[:, 1] = [3, 0.3, 0.3, 0.2, 0.25]
    lmask = np.zeros((batch, 64), bool)
    lmask[:, :2] = True
    labels = jnp.asarray(labels)
    lmask = jnp.asarray(lmask)

    step = trainer.jitted_train_step()
    state, metrics = step(state, images, labels, lmask, 0.01, 0.1, 0.937)
    _ = float(metrics["loss"])  # warm-up/compile + sync

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, images, labels, lmask, 0.01, 0.1, 0.937)
        _ = float(m["loss"])  # single real host sync
        return time.perf_counter() - t0

    # the state chains step-to-step, so every iteration executes for
    # real; subtracting a 1-iteration run cancels the per-sync RTT.
    # Best-of-2 passes: the tunnel's RTT spikes only ever ADD time, so
    # the faster pass is the truer device number.
    t1 = run(1)
    dt = max(min(run(iters + 1), run(iters + 1)) - t1, 1e-9)
    return iters * batch / dt


def bench_infer(batch=16, size=640, iters=24):
    """End-to-end inference (fwd + decode + NMS) img/s and NMS p50 ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.ops.nms import nms_single

    cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
    cfg["image_size"] = size
    plan = TrainPlan(cfg)
    plan.save_path = "/nonexistent/x.msgpack"   # random weights
    # serve configuration: bf16 logits — measured ZERO mAP cost at
    # inference on the parity A/B task (PARITY_AB.md: only TRAINING
    # under bf16-rounded logits costs accuracy) and halves the head-map
    # HBM traffic into decode (throughput parity-or-better measured)
    det = Detector(plan, head_dtype=jnp.bfloat16)
    infer = det._build_infer(0.25, 0.45, 300)

    NVAR = 4
    rs = np.random.RandomState(0)
    variants = [jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
                for _ in range(NVAR)]

    @jax.jit
    def step(x, carry):
        return infer(det.params, det.batch_stats, x + carry)

    def chained(fn, inputs, chain_of, n):
        def run(k):
            carry = jnp.float32(0.0)
            t0 = time.perf_counter()
            for i in range(k):
                out = fn(inputs[i % NVAR], carry)
                carry = chain_of(out)
            _ = float(carry)
            return time.perf_counter() - t0
        run(1)            # warm
        t_zero = run(1)   # ~RTT + 1 iter
        t_full = min(run(n + 1), run(n + 1))   # best-of-2 (RTT spikes add)
        return max(t_full - t_zero, 1e-9) / n

    dt = chained(step, variants, lambda o: jnp.sum(o[1]) * 1e-12, iters)
    infer_ips = batch / dt

    preds = [jnp.asarray(
        np.concatenate([rs.rand(25200, 2), rs.rand(25200, 2) * 0.1 + 0.01,
                        rs.rand(25200, 1), rs.rand(25200, 80)], -1),
        jnp.float32) for _ in range(NVAR)]
    f = jax.jit(lambda p, c: nms_single(p + c, 0.25, 0.45, 300))
    nms_dt = chained(f, preds, lambda o: jnp.sum(o[1]) * 1e-12, 40)
    return infer_ips, nms_dt * 1000.0


def main():
    _setup_cache()
    batches = [int(b) for b in sys.argv[1:]] or [16, 32]
    sweep = {}
    for b in batches:
        sweep[b] = round(bench_train(b), 2)
    best_bs = max(sweep, key=sweep.get)
    ips = sweep[best_bs]

    infer_ips, nms_p50 = bench_infer()

    print(json.dumps({
        "metric": "640px train images/sec/chip (yolov7, bf16, SimOTA step, "
                  f"bs={best_bs})",
        "value": ips,
        "unit": "img/s",
        "vs_baseline": round(ips / REF_GPU_TRAIN_IPS, 3),
        "train_sweep": {str(k): v for k, v in sweep.items()},
        "infer_img_s": round(infer_ips, 2),
        "nms_p50_ms": round(nms_p50, 3),
        "ref_cpu_measured_img_s": REF_CPU_MEASURED_IPS,
        "vs_ref_cpu_measured": round(ips / REF_CPU_MEASURED_IPS, 1),
    }))


if __name__ == "__main__":
    main()
