#!/usr/bin/env python
"""Per-lever byte/FLOP accounting for the yolov7@640 train step
(round-3 verdict #1: prove the throughput residue with compiler numbers,
not guesses).

For each lever the XLA cost model of the COMPILED step is queried
(flops, bytes accessed, peak temp memory); combined with the measured
img/s (scripts/throughput_sweep.py) this pins where the remaining time
goes:  t_roofline = max(bytes/BW_HBM, flops/FLOPS_MXU).

Writes /tmp/cost_analysis.json and prints a markdown table.

Run on the TPU (one client at a time): python scripts/cost_analysis.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_tpu_cache")

# v5e per-chip peaks (public spec): 394 bf16 TFLOP/s, 819 GB/s HBM
PEAK_TFLOPS = 394.0
PEAK_HBM_GBS = 819.0

MODES = {
    "base": (None, "float32"),
    "remat-conv": ({"remat": "conv"}, "float32"),
    "remat-full": ({"remat": True}, "float32"),
    "bf16-img": (None, "bfloat16"),
    "remat-conv+bf16-img": ({"remat": "conv"}, "bfloat16"),
    # per-block BN+act tail checkpointing (layers.bn_tail_remat): saves
    # only conv outputs for the backward; bit-identical numerics
    "bn-remat": ({"bn_remat": True}, "float32"),
}


def analyze(batch=16, size=640, extra_cfg=None, image_dtype="float32"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer

    cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
    cfg.update(image_size=size, batch_size=batch, max_boxes=64)
    cfg.update(extra_cfg or {})
    plan = TrainPlan(cfg)
    tr = Trainer(plan)
    state = tr.init_state(jax.random.PRNGKey(0))
    images = jnp.zeros((batch, size, size, 3), getattr(jnp, image_dtype))
    labels = jnp.zeros((batch, 64, 5), jnp.float32)
    lmask = jnp.zeros((batch, 64), bool)
    compiled = jax.jit(tr.train_step_fn, donate_argnums=(0,)).lower(
        state, images, labels, lmask, 0.01, 0.1, 0.937).compile()
    ca = compiled.cost_analysis()
    ma = compiled.memory_analysis()
    out = {
        "tflop_per_step": round(ca.get("flops", 0) / 1e12, 3),
        "gb_accessed_per_step": round(ca.get("bytes accessed", 0) / 1e9, 3),
        "peak_temp_gb": round(getattr(ma, "temp_size_in_bytes", 0) / 1e9, 3)
        if ma is not None else None,
    }
    t_flops = ca.get("flops", 0) / 1e12 / PEAK_TFLOPS
    t_bytes = ca.get("bytes accessed", 0) / 1e9 / PEAK_HBM_GBS
    out["t_mxu_ms"] = round(t_flops * 1e3, 2)
    out["t_hbm_ms"] = round(t_bytes * 1e3, 2)
    out["roofline_img_s"] = round(batch / max(t_flops, t_bytes), 1)
    out["bound"] = "HBM" if t_bytes > t_flops else "MXU"
    return out


def main():
    batch = 16
    results = {}
    modes = sys.argv[1:] or ["base", "remat-conv", "bf16-img",
                             "remat-conv+bf16-img"]
    for mode in modes:
        extra, dt = MODES[mode]
        print(f"analyzing {mode} ...", flush=True)
        results[mode] = analyze(batch, extra_cfg=extra, image_dtype=dt)
        print(" ", json.dumps(results[mode]), flush=True)
    with open("/tmp/cost_analysis.json", "w") as f:
        json.dump({"batch": batch, "size": 640, "peak_tflops": PEAK_TFLOPS,
                   "peak_hbm_gbs": PEAK_HBM_GBS, "modes": results}, f,
                  indent=1)
    print("\n| mode | TFLOP/step | GB/step | t_MXU ms | t_HBM ms | "
          "roofline img/s | bound |")
    print("|---|---|---|---|---|---|---|")
    for m, r in results.items():
        print(f"| {m} | {r['tflop_per_step']} | {r['gb_accessed_per_step']} "
              f"| {r['t_mxu_ms']} | {r['t_hbm_ms']} | {r['roofline_img_s']} "
              f"| {r['bound']} |")


if __name__ == "__main__":
    main()
