#!/usr/bin/env python
"""Benchmark: all three BASELINE.json metrics on one chip, ONE JSON line.

Headline metric (the driver-recorded ``value``): yolov7 (flagship)
training throughput at 640px — full jitted step (bf16 forward + SimOTA
loss + backward + 3-group SGD + EMA) with device-resident data, best of
a small batch-size sweep. Extra keys carry the other BASELINE metrics:

- ``infer_img_s``    end-to-end batched inference (forward + device
  decode + device NMS) images/sec — the path replacing detect.py:29-144
- ``infer_1_ms``     single-image end-to-end device latency (the
  detect.py:227-234 single-image serve path)
- ``nms_p50_ms``     NMS p50 latency, 25200 candidates -> 300 kept — the
  op replacing the torchvision host round-trip (detect.py:130-140)
- ``train_sweep``    per-batch-size train throughput

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so
the denominator is a documented GPU-normalized stand-in: ~55 img/s for
YOLOv7 @640 single-GPU (V100-class) training of the torch reference
(DataParallel, AMP). The BASELINE.json target is >3x this. A second,
measured-on-this-host anchor is read from BASELINE_MEASURED.json.

Wedge-proofing (round-4 verdict #1): the axon TPU tunnel can be wedged
by an orphaned far-end claim for an hour+ (ROADMAP operations note), and
round 3's perf record was LOST to a bench that died on the first
UNAVAILABLE. This bench therefore (a) probes the device with a tiny op
in a TIMEOUTED SUBPROCESS (a wedged tunnel blocks forever inside the
client, so in-process try/except cannot recover), (b) retries with
multi-minute cooldowns, (c) runs each metric section in its own
timeouted subprocess, and (d) ALWAYS prints one valid JSON line —
partial metrics plus an ``error`` field if sections failed — and exits
0 so the driver records whatever was captured.
"""
import json
import os
import subprocess
import sys
import time

REF_GPU_TRAIN_IPS = 55.0
CACHE_DIR = "/tmp/xla_bench_cache"

def _env_int(name, default):
    return int(os.environ.get(name, default))


PROBE_TIMEOUT = _env_int("BENCH_PROBE_TIMEOUT", 900)   # tiny op; generous —
PROBE_RETRIES = _env_int("BENCH_PROBE_RETRIES", 4)     # a draining far-end
PROBE_COOLDOWN = _env_int("BENCH_PROBE_COOLDOWN", 600)  # claim takes 10s of min
TRAIN_TIMEOUT = _env_int("BENCH_TRAIN_TIMEOUT", 5400)  # cold remote compile
INFER_TIMEOUT = _env_int("BENCH_INFER_TIMEOUT", 3600)
SECTION_RETRIES = _env_int("BENCH_SECTION_RETRIES", 1)
SECTION_COOLDOWN = _env_int("BENCH_SECTION_COOLDOWN", 600)


def _ref_cpu_measured():
    """Measured torch-reference CPU throughput (scripts/ref_cpu_bench.py
    writes BASELINE_MEASURED.json); fall back to the round-3 value if
    the file is gone so the ratio stays traceable."""
    try:
        rec = json.load(open(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BASELINE_MEASURED.json")))
        return float(rec["yolov7_640_bs4"]["img_s"]), "BASELINE_MEASURED.json"
    except Exception:
        return 0.21, "fallback-constant (BASELINE_MEASURED.json unreadable)"


def _setup_cache():
    import jax
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# sections (each runs in its own subprocess: `bench.py --section NAME`)
# ---------------------------------------------------------------------------

def section_probe():
    import jax
    import jax.numpy as jnp
    x = jnp.ones((128, 128))
    y = (x @ x).block_until_ready()
    print(json.dumps({"ok": True, "backend": jax.default_backend(),
                      "sum": float(y.sum())}))


def bench_train(batch, size=640, iters=20, extra_cfg=None,
                image_dtype="float32"):
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
    plan = TrainPlan(cfg)

    trainer = Trainer(plan)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(batch, size, size, 3),
                         getattr(jnp, image_dtype))
    labels = np.zeros((batch, 64, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    labels[:, 1] = [3, 0.3, 0.3, 0.2, 0.25]
    lmask = np.zeros((batch, 64), bool)
    lmask[:, :2] = True
    labels = jnp.asarray(labels)
    lmask = jnp.asarray(lmask)

    step = trainer.jitted_train_step()
    state, metrics = step(state, images, labels, lmask, 0.01, 0.1, 0.937)
    _ = float(metrics["loss"])  # warm-up/compile + sync

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, images, labels, lmask, 0.01, 0.1, 0.937)
        _ = float(m["loss"])  # single real host sync
        return time.perf_counter() - t0

    # the state chains step-to-step, so every iteration executes for
    # real; subtracting a 1-iteration run cancels the per-sync RTT.
    # Best-of-2 passes: the tunnel's RTT spikes only ever ADD time, so
    # the faster pass is the truer device number.
    t1 = run(1)
    dt = max(min(run(iters + 1), run(iters + 1)) - t1, 1e-9)
    return iters * batch / dt


# train-step lever configurations swept by the train section. bn_remat
# (plan key; layers.bn_tail_remat) checkpoints each BN+act tail so the
# backward saves only conv outputs — attacks the 3.57x fusion-headroom
# residue in reports/minimal_traffic.json. Numerics are bit-identical
# (tests/test_bn_remat.py), so whichever mode is faster is simply the
# better compilation of the SAME step.
TRAIN_MODES = {
    "base": {},
    "bn_remat": {"bn_remat": True},
}


def section_train(batches, mode="base"):
    _setup_cache()
    sweep = {}
    for b in batches:
        key = str(b) if mode == "base" else f"{b}/{mode}"
        sweep[key] = round(bench_train(b, extra_cfg=TRAIN_MODES[mode]), 2)
    print(json.dumps({"train_sweep": sweep}))


def section_infer(batch=16, size=640, iters=24):
    """End-to-end inference (fwd + decode + NMS) img/s, single-image
    latency, and NMS p50 ms."""
    _setup_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.ops.nms import nms_single

    cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
    cfg["image_size"] = size
    plan = TrainPlan(cfg)
    plan.save_path = "/nonexistent/x.msgpack"   # random weights
    # serve configuration: bf16 logits — measured ZERO mAP cost at
    # inference on the parity A/B task (PARITY_AB.md: only TRAINING
    # under bf16-rounded logits costs accuracy) and halves the head-map
    # HBM traffic into decode (throughput parity-or-better measured)
    det = Detector(plan, head_dtype=jnp.bfloat16)
    infer = det._build_infer(0.25, 0.45, 300)

    NVAR = 4
    rs = np.random.RandomState(0)

    @jax.jit
    def step(x, carry):
        return infer(det.params, det.batch_stats, x + carry)

    def chained(fn, inputs, chain_of, n):
        def run(k):
            carry = jnp.float32(0.0)
            t0 = time.perf_counter()
            for i in range(k):
                out = fn(inputs[i % NVAR], carry)
                carry = chain_of(out)
            _ = float(carry)
            return time.perf_counter() - t0
        run(1)            # warm
        t_zero = run(1)   # ~RTT + 1 iter
        t_full = min(run(n + 1), run(n + 1))   # best-of-2 (RTT spikes add)
        return max(t_full - t_zero, 1e-9) / n

    variants = [jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
                for _ in range(NVAR)]
    dt = chained(step, variants, lambda o: jnp.sum(o[1]) * 1e-12, iters)
    infer_ips = batch / dt

    singles = [jnp.asarray(rs.rand(1, size, size, 3), jnp.float32)
               for _ in range(NVAR)]
    dt1 = chained(step, singles, lambda o: jnp.sum(o[1]) * 1e-12, iters)

    # serve-latency variant: the fused Pallas 1x1 matmul+BN+SiLU neck
    # tails (layers.Conv.fused_tail; 1.45x on the widest shape,
    # reports/fused_tail_bench.log) on the single-image path they serve
    det_f = Detector(plan, head_dtype=jnp.bfloat16, fused_tails=True)
    infer_f = det_f._build_infer(0.25, 0.45, 300)

    @jax.jit
    def step_f(x, carry):
        return infer_f(det_f.params, det_f.batch_stats, x + carry)

    dt1_f = chained(step_f, singles, lambda o: jnp.sum(o[1]) * 1e-12, iters)

    # int8 PTQ serving variant (layers.quant_ctx; v5e MXU int8 path):
    # calibrate on the bench inputs, then batched end-to-end throughput
    det_q = Detector(plan, head_dtype=jnp.bfloat16, quantize=True)
    det_q.calibrate(variants[0])
    infer_q = det_q._build_infer(0.25, 0.45, 300)

    @jax.jit
    def step_q(x, carry):
        return infer_q(det_q.params, det_q.batch_stats, x + carry)

    dt_q = chained(step_q, variants, lambda o: jnp.sum(o[1]) * 1e-12, iters)

    preds = [jnp.asarray(
        np.concatenate([rs.rand(25200, 2), rs.rand(25200, 2) * 0.1 + 0.01,
                        rs.rand(25200, 1), rs.rand(25200, 80)], -1),
        jnp.float32) for _ in range(NVAR)]
    f = jax.jit(lambda p, c: nms_single(p + c, 0.25, 0.45, 300))
    nms_dt = chained(f, preds, lambda o: jnp.sum(o[1]) * 1e-12, 40)
    print(json.dumps({"infer_img_s": round(infer_ips, 2),
                      "infer_img_s_int8": round(batch / dt_q, 2),
                      "infer_1_ms": round(dt1 * 1000.0, 3),
                      "infer_1_ms_fused_tails": round(dt1_f * 1000.0, 3),
                      "nms_p50_ms": round(nms_dt * 1000.0, 3)}))


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def _run_section(args, timeout):
    """Run `bench.py --section ...` in a subprocess; return (dict|None,
    error|None). A wedged tunnel blocks forever inside the client, so
    the timeout is the only reliable recovery."""
    cmd = [sys.executable, os.path.abspath(__file__)] + args
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None, f"{args}: timeout after {timeout}s"
    for line in reversed(p.stdout.strip().splitlines() or [""]):
        try:
            return json.loads(line), None
        except json.JSONDecodeError:
            continue
    tail = (p.stderr or p.stdout or "")[-300:].replace("\n", " | ")
    return None, f"{args}: rc={p.returncode} {tail}"


def _probe_until_healthy(log):
    for attempt in range(PROBE_RETRIES):
        out, err = _run_section(["--section", "probe"], PROBE_TIMEOUT)
        if out and out.get("ok"):
            log(f"probe ok (backend {out.get('backend')})")
            return True
        log(f"probe attempt {attempt + 1}/{PROBE_RETRIES} failed: {err}; "
            f"cooling down {PROBE_COOLDOWN}s")
        if attempt + 1 < PROBE_RETRIES:
            time.sleep(PROBE_COOLDOWN)
    return False


def _with_retry(args, timeout, log):
    out, err = _run_section(args, timeout)
    for _ in range(SECTION_RETRIES):
        if out is not None:
            break
        log(f"section failed ({err}); cooling down {SECTION_COOLDOWN}s")
        time.sleep(SECTION_COOLDOWN)
        out, err = _run_section(args, timeout)
    return out, err


def main():
    if "--section" in sys.argv:
        i = sys.argv.index("--section")
        name = sys.argv[i + 1]
        rest = sys.argv[i + 2:]
        if name == "probe":
            section_probe()
        elif name == "train":
            mode = "base"
            if "--mode" in rest:
                j = rest.index("--mode")
                mode = rest[j + 1]
                rest = rest[:j] + rest[j + 2:]
            section_train([int(b) for b in rest] or [16, 32], mode)
        elif name == "infer":
            section_infer()
        return

    def log(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    batches = [b for b in sys.argv[1:] if b.isdigit()] or ["16", "32"]
    errors = []
    result = {
        "metric": "640px train images/sec/chip (yolov7, bf16, SimOTA step)",
        "value": None, "unit": "img/s", "vs_baseline": None,
    }

    healthy = _probe_until_healthy(log)
    if not healthy:
        errors.append("device probe never succeeded "
                      f"({PROBE_RETRIES}x{PROBE_TIMEOUT}s + cooldowns)")

    if healthy:
        modes = os.environ.get("BENCH_TRAIN_MODES", "base,bn_remat").split(",")
        sweep = {}
        for mode in [m for m in modes if m in TRAIN_MODES]:
            out, err = _with_retry(
                ["--section", "train", "--mode", mode] + batches,
                TRAIN_TIMEOUT, log)
            if out:
                sweep.update(out["train_sweep"])
            if err:
                errors.append(err)
        good = {k: v for k, v in sweep.items() if v and v > 0}
        if good:
            best = max(good, key=good.get)
            result["value"] = good[best]
            result["metric"] += f" bs={best}"
            result["train_sweep"] = sweep

        out, err = _with_retry(["--section", "infer"], INFER_TIMEOUT, log)
        if out:
            result.update(out)
        if err:
            errors.append(err)

    if result["value"]:
        result["vs_baseline"] = round(result["value"] / REF_GPU_TRAIN_IPS, 3)
        ref_cpu, src = _ref_cpu_measured()
        result["ref_cpu_measured_img_s"] = ref_cpu
        result["ref_cpu_measured_source"] = src
        result["vs_ref_cpu_measured"] = round(result["value"] / ref_cpu, 1)
    if errors:
        result["error"] = "; ".join(errors)
    print(json.dumps(result))
    sys.exit(0)


if __name__ == "__main__":
    main()
