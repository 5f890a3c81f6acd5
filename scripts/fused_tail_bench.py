#!/usr/bin/env python
"""Micro-benchmark: Pallas fused conv+BN+SiLU tail vs the identical XLA
graph, at the yolov7 neck tail shapes (round-3 verdict #1 lever (b)).

Chained-iteration timing (RTT-cancelled, bench.py methodology). Prints
one JSON line per shape. Run on the TPU, one client at a time.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_tpu_cache")

SHAPES = [   # (B, H, W, Cin, Cout) — yolov7 @640 neck/head tails
    (16, 20, 20, 1024, 512),
    (16, 40, 40, 512, 256),
    (16, 80, 80, 256, 128),
]


def timeit(fn, args, iters=30):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x, carry):
        return fn(x + carry, *args[1:])

    x = args[0]

    def run(n):
        carry = jnp.zeros((), x.dtype)
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = step(x, carry)
            carry = (jnp.sum(out[..., :1]) * 1e-12).astype(x.dtype)
        _ = float(jnp.sum(out))
        return time.perf_counter() - t0
    run(1)
    t1 = run(1)
    return max(min(run(iters + 1), run(iters + 1)) - t1, 1e-9) / iters


def main():
    import jax.numpy as jnp
    import numpy as np

    from yolo_continuous_tpu.kernels.fused_conv_pallas import (
        fused_pointwise_conv, xla_pointwise_conv)

    rs = np.random.RandomState(0)
    for B, H, W, Ci, Co in SHAPES:
        x = jnp.asarray(rs.randn(B, H, W, Ci), jnp.bfloat16)
        w = jnp.asarray(rs.randn(Ci, Co) * 0.05, jnp.bfloat16)
        s = jnp.asarray(rs.rand(Co) + 0.5, jnp.float32)
        b = jnp.asarray(rs.randn(Co) * 0.1, jnp.float32)

        got = np.asarray(fused_pointwise_conv(x, w, s, b), np.float32)
        want = np.asarray(xla_pointwise_conv(x, w, s, b), np.float32)
        err = float(np.max(np.abs(got - want)))

        t_pallas = timeit(fused_pointwise_conv, (x, w, s, b))
        t_xla = timeit(xla_pointwise_conv, (x, w, s, b))
        bytes_min = (x.size + w.size) * 2 + B * H * W * Co * 2
        print(json.dumps({
            "shape": f"{B}x{H}x{W}x{Ci}->{Co}",
            "pallas_us": round(t_pallas * 1e6, 1),
            "xla_us": round(t_xla * 1e6, 1),
            "speedup": round(t_xla / t_pallas, 3),
            "max_abs_err": round(err, 4),
            "hbm_floor_us": round(bytes_min / 819e9 * 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
