#!/usr/bin/env python
"""On-TPU NMS dispatch validation (round-4 verdict weak #4).

Round 3 proved the tiled Pallas kernel's keep-set bit-matches the XLA
fixpoint at K=2048/4096 on hardware but never timed the XLA fixpoint at
those sizes — `_auto_pallas` + the K>1024 branch (ops/nms.py:100-130)
could have been routing large-max_det callers onto a slower path. This
smoke measures BOTH paths at K in {1024, 2048, 4096} with the bench's
chained-iteration timing (the tunnel RTT only ever ADDS time; chaining
device-side and syncing once cancels it), bit-checks the keep-sets, and
writes reports/nms_tpu_smoke.json. The dispatch constants in ops/nms.py
are set from this record.

Run (serialized through the TPU queue): python scripts/tpu_smoke_nms.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_bench_cache")

import numpy as np

ITERS = 20


def chained_ms(f, b, c, v, iters=ITERS):
    """Median-free chained timing: run `iters` dependent calls, sync
    once; subtract the 1-call time (≈RTT + 1 iter); best of 2 passes.

    Two memoization defenses (the axon tunnel caches identical
    executions — a first version using a carry of sum(keep)*1e-20 saw
    0.0 ms results because the perturbation rounded away in fp32 and
    every iteration replayed from cache): (a) the carry scale is 1e-3,
    large enough to change input bits; (b) it shifts ALL box corners
    uniformly, and translation preserves pairwise IoU, so the keep-set
    work is identical while the execution is distinct."""
    import jax.numpy as jnp

    def run(k):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(k):
            out = f(b + carry, c, v)
            carry = (jnp.sum(out).astype(jnp.float32) + i) * jnp.float32(1e-3)
        _ = float(carry)
        return time.perf_counter() - t0

    run(1)  # warm / compile
    t1 = run(1)
    dt = max(min(run(iters + 1), run(iters + 1)) - t1, 1e-9)
    return dt / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from yolo_continuous_tpu.kernels.nms_pallas import (pallas_suppress,
                                                        pallas_suppress_tiled)
    from yolo_continuous_tpu.ops.boxes import box_iou
    from yolo_continuous_tpu.ops.nms import _fixpoint_suppress

    backend = jax.default_backend()
    out = {"backend": backend, "iters": ITERS, "cases": {}}
    rs = np.random.RandomState(0)
    for k in (300, 512, 1024, 2048, 4096):
        # clustered boxes so suppression chains actually form; the
        # cluster area scales with K so the suppressed FRACTION stays
        # realistic at every size (a fixed 640px field at K=300 had
        # kept=300/300 — a fixpoint that converges in one iteration
        # measures nothing)
        side = 640.0 * (k / 4096.0) ** 0.5
        centers = rs.rand(k, 2) * side
        wh = rs.rand(k, 2) * 80 + 10
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
        classes = rs.randint(0, 20, k).astype(np.int32)
        valid = np.ones((k,), bool)
        b, c, v = jnp.asarray(boxes, jnp.float32), jnp.asarray(classes), \
            jnp.asarray(valid)

        def xla_path(b, c, v):
            iou = box_iou(b, b)
            same = c[:, None] == c[None, :]
            return _fixpoint_suppress(iou, same, v, 0.45)

        cands = {"xla": jax.jit(xla_path),
                 "tiled": jax.jit(
                     lambda b, c, v: pallas_suppress_tiled(b, c, v, 0.45))}
        if k <= 1024:   # single-VMEM-block kernel caps at K~1024
            cands["block"] = jax.jit(
                lambda b, c, v: pallas_suppress(b, c, v, 0.45))

        keep_ref = np.asarray(cands["xla"](b, c, v)).astype(bool)
        case = {"kept": int(keep_ref.sum())}
        match_all = True
        for name, f in cands.items():
            match = bool((np.asarray(f(b, c, v)).astype(bool)
                          == keep_ref).all())
            match_all &= match
            case[name + "_ms"] = round(chained_ms(f, b, c, v), 3)
            case[name + "_match"] = match
        case["winner"] = min(
            (n for n in cands), key=lambda n: case[n + "_ms"])
        out["cases"][str(k)] = case
        print(f"K={k}: kept={case['kept']} winner={case['winner']} " +
              " ".join(f"{n}={case[n + '_ms']}ms" for n in cands))
        assert match_all, f"K={k}: keep-set mismatch across paths"

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(here, "reports"), exist_ok=True)
    with open(os.path.join(here, "reports/nms_tpu_smoke.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote reports/nms_tpu_smoke.json")


if __name__ == "__main__":
    main()
