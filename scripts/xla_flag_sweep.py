#!/usr/bin/env python
"""XLA compiler-option sweep for the train-step throughput target.

Finding from the first attempt: XLA_FLAGS is a dead end in this
environment — the LOCAL plugin's flag parser fatally rejects unknown
(TPU-backend) flags before any work starts, and with remote compiles
the env var would not reach the far-end compiler anyway. Compiler
options must ride the compile request itself: ``jax.jit(...,
compiler_options=...)``, exposed product-side as the ``xla_opts`` plan
key (train/train_loop.py::jitted_train_step).

This driver just runs the option modes defined in throughput_sweep.py
(scoped-VMEM budget, latency-hiding scheduler) in ONE process/client.
Reference step being replaced: /root/reference/train.py:79-88.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    modes = sys.argv[1:] or ["base", "vmem64m", "vmem96m", "lhs",
                             "lhs+vmem64m"]
    sys.exit(subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts/throughput_sweep.py"),
         *modes, "--bs", "16"], cwd=REPO))
