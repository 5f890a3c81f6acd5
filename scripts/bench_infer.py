#!/usr/bin/env python
"""Inference benchmarks on one chip: batched end-to-end (forward + decode
+ NMS) images/sec and NMS p50 latency (BASELINE.json metrics).

Measurement notes (axon tunnel): un-synced repeated dispatch is ~free
(async + remote memoization) and every host sync costs ~100ms RTT, so
each iteration's INPUT is chained to the previous OUTPUT — the device
must execute all iterations for real — and the single final sync is
amortized (and subtracted via a zero-iteration calibration).

Run: python scripts/bench_infer.py [batch]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml
import jax
import jax.numpy as jnp

NVAR = 4


def chained_time(fn, inputs, chain_of, iters):
    """Run fn over rotating inputs with a dependency chain; returns
    seconds/iter with the sync RTT subtracted."""
    def run(n):
        carry = jnp.float32(0.0)
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(inputs[i % NVAR], carry)
            carry = chain_of(out)
        v = float(carry)  # single real sync
        return time.perf_counter() - t0
    run(1)           # warm
    t_zero = run(1)  # ~RTT + 1 iter
    t_full = run(iters + 1)
    return max(t_full - t_zero, 1e-9) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.ops.nms import nms_single
    from yolo_continuous_tpu.kernels.nms_pallas import nms_single_pallas

    cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
    cfg["image_size"] = 640
    plan = TrainPlan(cfg)
    plan.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan)
    infer = det._build_infer(0.25, 0.45, 300)

    rs = np.random.RandomState(0)
    variants = [jnp.asarray(rs.rand(batch, 640, 640, 3), jnp.float32)
                for _ in range(NVAR)]

    @jax.jit
    def step(x, carry):
        return infer(det.params, det.batch_stats, x + carry)

    dt = chained_time(step, variants,
                      lambda out: jnp.sum(out[1]) * 1e-12, 24)
    print(f"end-to-end infer (fwd+decode+NMS) bs={batch}: "
          f"{dt*1000:.2f} ms/batch = {batch/dt:.1f} img/s")

    singles = [v[:1] for v in variants]
    dt1 = chained_time(lambda x, c: infer(det.params, det.batch_stats, x + c),
                       singles, lambda out: jnp.sum(out[1]) * 1e-12, 24)
    print(f"single-image e2e device latency: {dt1*1000:.2f} ms")

    preds = [jnp.asarray(
        np.concatenate([rs.rand(25200, 2), rs.rand(25200, 2)*0.1+0.01,
                        rs.rand(25200, 1), rs.rand(25200, 80)], -1),
        jnp.float32) for _ in range(NVAR)]
    for name, fn in (("xla-fixpoint", nms_single),
                     ("pallas", nms_single_pallas)):
        f = jax.jit(lambda p, c: fn(p + c, 0.25, 0.45, 300))
        dt = chained_time(f, preds, lambda out: jnp.sum(out[1]) * 1e-12, 40)
        print(f"NMS p50 ({name}, 25200 cand -> 300): {dt*1000:.3f} ms")


if __name__ == "__main__":
    main()
