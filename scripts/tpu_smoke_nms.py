#!/usr/bin/env python
"""On-TPU smoke for the tiled Pallas NMS kernel at the auto-dispatch
sizes (round-3 advisor finding: pallas_suppress_tiled was only ever
validated in interpret mode off-TPU; its VMEM residency at K=4096 was
unproven on hardware).

Runs pallas_suppress_tiled on the REAL chip at K in {2048, 4096},
compares the keep-set bit-for-bit against the XLA fixpoint reference
(ops/nms._fixpoint_suppress), and times it. Writes a JSON line to
reports/nms_tpu_smoke.json.

Run (serialized through the TPU queue): python scripts/tpu_smoke_nms.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_bench_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yolo_continuous_tpu.kernels.nms_pallas import pallas_suppress_tiled
    from yolo_continuous_tpu.ops.boxes import box_iou
    from yolo_continuous_tpu.ops.nms import _fixpoint_suppress

    backend = jax.default_backend()
    out = {"backend": backend, "cases": {}}
    rs = np.random.RandomState(0)
    for k in (2048, 4096):
        # clustered boxes so suppression chains actually form
        centers = rs.rand(k, 2) * 640
        wh = rs.rand(k, 2) * 80 + 10
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
        classes = rs.randint(0, 20, k).astype(np.int32)
        valid = np.ones((k,), bool)
        b, c, v = jnp.asarray(boxes, jnp.float32), jnp.asarray(classes), \
            jnp.asarray(valid)

        keep_p = np.asarray(jax.jit(
            lambda b, c, v: pallas_suppress_tiled(b, c, v, 0.45))(b, c, v))

        iou = box_iou(b, b)
        same = classes[:, None] == classes[None, :]
        keep_ref = np.asarray(_fixpoint_suppress(
            iou, jnp.asarray(same), v, 0.45))

        match = bool((keep_p.astype(bool) == keep_ref.astype(bool)).all())

        f = jax.jit(lambda b, c, v: pallas_suppress_tiled(b, c, v, 0.45))
        f(b, c, v)  # warm
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(f(b, c, v))
            ts.append(time.perf_counter() - t0)
        p50 = sorted(ts)[len(ts) // 2] * 1000
        out["cases"][str(k)] = {"match": match, "p50_ms": round(p50, 3),
                                "kept": int(keep_p.astype(bool).sum())}
        print(f"K={k}: match={match} p50={p50:.3f} ms "
              f"kept={int(keep_p.astype(bool).sum())}")
        assert match, f"K={k}: pallas keep-set != fixpoint reference"

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(here, "reports"), exist_ok=True)
    with open(os.path.join(here, "reports/nms_tpu_smoke.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote reports/nms_tpu_smoke.json")


if __name__ == "__main__":
    main()
