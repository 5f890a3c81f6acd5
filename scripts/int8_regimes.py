#!/usr/bin/env python
"""int8 PTQ regime table (round-4 verdict weak #6 / next #6).

Round 4 measured int8 only on the batched full-yolov7 @640 path — the
activation-bound regime where halved WEIGHT traffic can't matter — and
found a regression (406 vs 493 img/s). This script measures bf16 vs
int8 end-to-end (forward + decode + NMS) across the regimes where int8
could actually pay (weight-bound shapes: single-image serve, tiny nets,
small images, large batches of small images), and writes
reports/int8_regimes.json for the README regime table.

Shapes: full yolov7 {1,16}@640; yolov7-tiny {1,16,64}@320, 64@224.

Run (serialized through the TPU queue): python scripts/int8_regimes.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_bench_cache")

ITERS = 24
NVAR = 4


def chained(step, inputs, n=ITERS):
    import jax.numpy as jnp

    def run(k):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(k):
            out = step(inputs[i % NVAR], carry)
            carry = jnp.sum(out[1]) * 1e-12
        _ = float(carry)
        return time.perf_counter() - t0

    run(1)
    t_zero = run(1)
    t_full = min(run(n + 1), run(n + 1))
    return max(t_full - t_zero, 1e-9) / n


def measure(cfg_file, size, batch):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector

    cfg = yaml.safe_load(open(cfg_file))
    cfg["image_size"] = size
    plan = TrainPlan(cfg)
    plan.save_path = "/nonexistent/x.msgpack"  # random weights
    rs = np.random.RandomState(0)
    variants = [jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
                for _ in range(NVAR)]
    row = {}
    for label, kw in (("bf16", {}), ("int8", {"quantize": True})):
        det = Detector(plan, head_dtype=jnp.bfloat16, **kw)
        if kw:
            det.calibrate(variants[0])
        infer = det._build_infer(0.25, 0.45, 300)

        @jax.jit
        def step(x, carry, _infer=infer, _det=det):
            return _infer(_det.params, _det.batch_stats, x + carry)

        dt = chained(step, variants)
        row[label] = {"img_s": round(batch / dt, 2),
                      "ms": round(dt * 1000.0, 3)}
    row["int8_speedup"] = round(row["int8"]["img_s"] / row["bf16"]["img_s"],
                                3)
    return row


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shapes = [
        ("yolov7@640", os.path.join(here, "cfg/coco_train.yaml"), 640,
         [1, 16]),
        ("tiny@320", os.path.join(here, "cfg/raccoon_tiny.yaml"), 320,
         [1, 16, 64]),
        ("tiny@224", os.path.join(here, "cfg/raccoon_tiny.yaml"), 224,
         [64]),
    ]
    out = {}
    for name, cfg_file, size, batches in shapes:
        for b in batches:
            key = f"{name}/bs{b}"
            out[key] = measure(cfg_file, size, b)
            print(key, out[key])
            with open(os.path.join(here, "reports/int8_regimes.json"),
                      "w") as f:
                json.dump(out, f, indent=1)
    print("wrote reports/int8_regimes.json")


if __name__ == "__main__":
    main()
