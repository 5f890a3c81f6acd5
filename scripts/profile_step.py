#!/usr/bin/env python
"""Hardware profile of the flagship train step: where does the 73.6 GB
/ 100 ms actually go?

Captures a jax.profiler trace (perfetto JSON) of a few chained train
steps on the real chip and aggregates device-track event durations by
kernel/fusion name, writing the top-N table to
reports/profile_step.json. This attributes the measured gap between the
158-164 img/s step and its 178 img/s XLA-traffic roofline
(reports/minimal_traffic.json) to named kernels instead of prose.

Run (serialized through the TPU queue):
    python scripts/profile_step.py [--batch 16] [--iters 8]
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_bench_cache")

LOGDIR = "/tmp/jax-profile-step"


def build_step(batch, size=640, extra_cfg=None):
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
    trainer = Trainer(TrainPlan(cfg))
    state = trainer.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
    labels = np.zeros((batch, 64, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    labels[:, 1] = [3, 0.3, 0.3, 0.2, 0.25]
    lmask = np.zeros((batch, 64), bool)
    lmask[:, :2] = True
    step = trainer.jitted_train_step()
    args = (jnp.asarray(labels), jnp.asarray(lmask), 0.01, 0.1, 0.937)
    return step, state, images, args


def aggregate_perfetto(path, out, iters):
    """Sum device-track slice durations by event name."""
    with gzip.open(path, "rt", errors="replace") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
    # device tracks: pid/tid names containing TPU/device; fall back to
    # aggregating every complete ('X') event and reporting track names.
    tracks = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") in ("process_name",
                                                      "thread_name"):
            key = (ev.get("pid"), ev.get("tid") if
                   ev["name"] == "thread_name" else None)
            tracks[key] = ev.get("args", {}).get("name", "")
    agg, track_totals = {}, {}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        tname = tracks.get((pid, tid)) or tracks.get((pid, None)) or ""
        ptrack = tracks.get((pid, None), "")
        full = f"{ptrack}/{tname}"
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        track_totals[full] = track_totals.get(full, 0.0) + dur
        low = full.lower()
        if "tpu" in low or "device" in low or "xla" in low:
            name = ev.get("name", "?")
            a = agg.setdefault(name, [0.0, 0])
            a[0] += dur
            a[1] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    out["tracks_ms"] = {k: round(v, 2) for k, v in sorted(
        track_totals.items(), key=lambda kv: -kv[1])[:12]}
    out["top_device_ops_ms"] = [
        {"name": k, "total_ms": round(v[0], 3),
         "per_step_ms": round(v[0] / iters, 3), "count": v[1]}
        for k, v in top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mode", default="base",
                    help="base or any TRAIN_MODES key from bench.py")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    extra = {} if args.mode == "base" else {args.mode: True}
    step, state, images, rest = build_step(args.batch, extra_cfg=extra)
    # compile + warm outside the trace
    state, m = step(state, images, *rest)
    _ = float(m["loss"])

    os.makedirs(LOGDIR, exist_ok=True)
    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    for _ in range(args.iters):
        state, m = step(state, images, *rest)
    _ = float(m["loss"])
    jax.profiler.stop_trace()

    out = {"batch": args.batch, "iters": args.iters, "mode": args.mode,
           "backend": jax.default_backend()}
    perfetto = sorted(glob.glob(os.path.join(
        LOGDIR, "**", "*.trace.json.gz"), recursive=True))
    if perfetto:
        aggregate_perfetto(perfetto[-1], out, args.iters)
    else:
        out["error"] = ("no perfetto trace produced; xplane files: "
                        + str(glob.glob(os.path.join(LOGDIR, "**", "*"),
                                        recursive=True))[:500])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "reports", "profile_step.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    for row in out.get("top_device_ops_ms", [])[:15]:
        print(f"{row['per_step_ms']:9.3f} ms/step  x{row['count']:<4d}"
              f" {row['name'][:90]}")


if __name__ == "__main__":
    main()
