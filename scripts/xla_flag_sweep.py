#!/usr/bin/env python
"""XLA compiler-flag sweep for the train-step throughput target.

Each config re-runs throughput_sweep.py (base mode, bs16 @640) in a
fresh subprocess with XLA_FLAGS set — flags must be fixed before
backend init, so one process per config. The parent never imports jax
(it must not dial the TPU tunnel itself).

Candidates target the two knobs XLA exposes that matter for a
conv-dominated single-chip step: scoped-VMEM budget for fusions and the
latency-hiding scheduler. Reference step being replaced:
/root/reference/train.py:79-88.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "lhs+vmem64m": ("--xla_tpu_enable_latency_hiding_scheduler=true "
                    "--xla_tpu_scoped_vmem_limit_kib=65536"),
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        flags = CONFIGS[name]
        print(json.dumps({"config": name, "xla_flags": flags}), flush=True)
        env = dict(os.environ, XLA_FLAGS=flags)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/throughput_sweep.py"),
             "base", "--bs", "16"],
            env=env, cwd=REPO, timeout=4000,
            capture_output=True, text=True)
        print(r.stdout, flush=True)
        if r.returncode != 0:
            print(json.dumps({"config": name, "rc": r.returncode,
                              "stderr_tail": r.stderr[-400:]}), flush=True)
        print(json.dumps({"config": name, "wall_s": round(time.time() - t0)}),
              flush=True)
        time.sleep(60)  # let the far-end tunnel settle between clients


if __name__ == "__main__":
    main()
