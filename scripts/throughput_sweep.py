#!/usr/bin/env python
"""Round-3 throughput experiment driver (verdict item #1: >=165 img/s).

Measures the yolov7@640 train step under each candidate lever, one at a
time, with bench.py's chained-iteration methodology (RTT-cancelled):

  base        round-2 configuration (no remat)
  remat-conv  selective remat: keep conv/matmul outputs, recompute the
              fused BN/activation/concat tails in the backward
  remat-dots  matmul-only saveable (convs recompute) — expected slow,
              measured for the record
  bf16-img    feed images as bf16 (halves input-read traffic)

Usage: python scripts/throughput_sweep.py [mode ...]
   modes default to: base remat-conv bf16-img, each at bs 8 16 24 32
Prints one JSON line per (mode, bs) and a summary.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)

MODES = {
    "base": dict(extra_cfg=None, image_dtype="float32"),
    # per-block BN+act tail checkpointing (layers.bn_tail_remat):
    # bit-identical numerics (tests/test_bn_remat.py), saves only conv
    # outputs as backward residuals
    "bn-remat": dict(extra_cfg={"bn_remat": True}, image_dtype="float32"),
    "remat-conv": dict(extra_cfg={"remat": "conv"}, image_dtype="float32"),
    "remat-dots": dict(extra_cfg={"remat": "dots"}, image_dtype="float32"),
    "remat-full": dict(extra_cfg={"remat": True}, image_dtype="float32"),
    "bf16-img": dict(extra_cfg=None, image_dtype="bfloat16"),
    "remat-conv+bf16-img": dict(extra_cfg={"remat": "conv"},
                                image_dtype="bfloat16"),
    # XLA compiler-option levers (ride the compile request via the
    # `xla_opts` plan key -> jit compiler_options; XLA_FLAGS cannot carry
    # TPU backend flags through the remote-compile tunnel)
    "vmem64m": dict(extra_cfg={"xla_opts":
                               {"xla_tpu_scoped_vmem_limit_kib": 65536}},
                    image_dtype="float32"),
    "vmem96m": dict(extra_cfg={"xla_opts":
                               {"xla_tpu_scoped_vmem_limit_kib": 98304}},
                    image_dtype="float32"),
    "lhs": dict(extra_cfg={"xla_opts":
                           {"xla_tpu_enable_latency_hiding_scheduler": True}},
                image_dtype="float32"),
    "lhs+vmem64m": dict(extra_cfg={"xla_opts": {
        "xla_tpu_enable_latency_hiding_scheduler": True,
        "xla_tpu_scoped_vmem_limit_kib": 65536}}, image_dtype="float32"),
}


def main():
    bench._setup_cache()
    argv = sys.argv[1:]
    batches = [16]
    if "--bs" in argv:
        i = argv.index("--bs")
        batches = [int(b) for b in argv[i + 1].split(",")]
        argv = argv[:i] + argv[i + 2:]
    modes = argv or ["base", "remat-conv", "bf16-img"]
    results = {}
    for mode in modes:
        kw = MODES[mode]
        for bs in batches:
            try:
                ips = bench.bench_train(bs, iters=20, **kw)
            except Exception as e:  # e.g. OOM at large bs
                print(json.dumps({"mode": mode, "bs": bs,
                                  "error": f"{type(e).__name__}: {e}"[:200]}))
                continue
            results[(mode, bs)] = ips
            print(json.dumps({"mode": mode, "bs": bs,
                              "img_s": round(ips, 2)}), flush=True)
    if results:
        best = max(results, key=results.get)
        print(json.dumps({"best_mode": best[0], "best_bs": best[1],
                          "best_img_s": round(results[best], 2)}))


if __name__ == "__main__":
    main()
