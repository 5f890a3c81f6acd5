#!/usr/bin/env python
"""Benchmark: the BASELINE.json metrics on one chip, ONE JSON line.

Headline metric (the driver-recorded ``value``): yolov7 (flagship)
training throughput at 640px — full jitted step (bf16 forward + SimOTA
loss + backward + 3-group SGD + EMA) with device-resident data. Extra
keys carry the other BASELINE metrics:

- ``infer_img_s``    end-to-end batched inference (forward + device
  decode + device NMS) images/sec — the path replacing detect.py:29-144
- ``infer_1_ms``     single-image end-to-end device latency (the
  detect.py:227-234 single-image serve path)
- ``nms_p50_ms``     NMS p50 latency, 25200 candidates -> 300 kept — the
  op replacing the torchvision host round-trip (detect.py:130-140)

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so
the denominator is a documented GPU-normalized stand-in: ~55 img/s for
YOLOv7 @640 single-GPU (V100-class) training of the torch reference
(DataParallel, AMP). The BASELINE.json target is >3x this. A second,
measured-on-this-host anchor is read from BASELINE_MEASURED.json.

Budget discipline (round-5; rounds 3 AND 4 lost their driver perf
record — rc=1 then rc=124): this bench now
(a) keeps a GLOBAL wall-clock deadline (env ``BENCH_TOTAL_BUDGET``
    seconds, default 2100 = 35 min warm-cache) and derives every
    section timeout from the remaining budget, so the orchestrator
    CANNOT outlive the driver's patience;
(b) prints the (partial) result JSON line after EVERY section — the
    driver parses the LAST valid JSON line, so whatever was captured
    survives a later wedge or kill;
(c) emits the same line from a SIGTERM/SIGINT handler (GNU timeout
    sends TERM first) and exits 0 on its own deadline;
(d) runs ONLY the sections that feed the headline by default:
    train base bs16 + infer(base) + single-image + NMS. The known
    lever variants (bn_remat, int8, fused tails, the bs sweep) are
    already recorded in reports/ and stay behind env flags:
    BENCH_TRAIN_MODES=base,bn_remat  BENCH_BATCHES="16 32"
    BENCH_INFER_EXTRAS=int8,fused_tails
(e) probes the device in a timeouted subprocess first (a wedged
    tunnel blocks forever inside the client), retrying only while the
    probe phase's budget share (40%) lasts.
"""
import atexit
import json
import os
import signal
import subprocess
import sys
import time

REF_GPU_TRAIN_IPS = 55.0
CACHE_DIR = os.environ.get("BENCH_CACHE_DIR", "/tmp/xla_bench_cache")


def _env_int(name, default):
    return int(os.environ.get(name, default))


TOTAL_BUDGET = _env_int("BENCH_TOTAL_BUDGET", 2100)
PROBE_TIMEOUT = _env_int("BENCH_PROBE_TIMEOUT", 300)
PROBE_COOLDOWN = _env_int("BENCH_PROBE_COOLDOWN", 120)
INFER_RESERVE = _env_int("BENCH_INFER_RESERVE", 480)  # kept back for infer
SECTION_MIN = 120          # don't bother launching a section with less

_T0 = time.monotonic()


def _remaining():
    return TOTAL_BUDGET - (time.monotonic() - _T0)


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


# train-step lever configurations sweepable by the train section.
# bn_remat (plan key; layers.bn_tail_remat) checkpoints each BN+act
# tail; measured -12% on hardware (reports/bench_r4_manual.json), so it
# is NOT in the default mode list — enable via BENCH_TRAIN_MODES.
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
        # partial sweep escapes even if a later batch size wedges
        print(json.dumps({"train_sweep": dict(sweep)}), flush=True)


def section_infer(batch=16, size=640, iters=24, extras=()):
    """End-to-end inference (fwd + decode + NMS) img/s, single-image
    latency, and NMS p50 ms. ``extras`` ("int8", "fused_tails") add the
    lever variants — extra compiles, so off by default."""
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
    out = {}

    @jax.jit
    def step(x, carry):
        return infer(det.params, det.batch_stats, x + carry)

    def chained(fn, inputs, chain_of, n):
        def run(k):
            carry = jnp.float32(0.0)
            t0 = time.perf_counter()
            for i in range(k):
                o = fn(inputs[i % NVAR], carry)
                carry = chain_of(o)
            _ = float(carry)
            return time.perf_counter() - t0
        run(1)            # warm
        t_zero = run(1)   # ~RTT + 1 iter
        t_full = min(run(n + 1), run(n + 1))   # best-of-2 (RTT spikes add)
        return max(t_full - t_zero, 1e-9) / n

    variants = [jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
                for _ in range(NVAR)]
    dt = chained(step, variants, lambda o: jnp.sum(o[1]) * 1e-12, iters)
    out["infer_img_s"] = round(batch / dt, 2)
    print(json.dumps(dict(out)), flush=True)

    singles = [jnp.asarray(rs.rand(1, size, size, 3), jnp.float32)
               for _ in range(NVAR)]
    dt1 = chained(step, singles, lambda o: jnp.sum(o[1]) * 1e-12, iters)
    out["infer_1_ms"] = round(dt1 * 1000.0, 3)
    print(json.dumps(dict(out)), flush=True)

    preds = [jnp.asarray(
        np.concatenate([rs.rand(25200, 2), rs.rand(25200, 2) * 0.1 + 0.01,
                        rs.rand(25200, 1), rs.rand(25200, 80)], -1),
        jnp.float32) for _ in range(NVAR)]
    f = jax.jit(lambda p, c: nms_single(p + c, 0.25, 0.45, 300))
    nms_dt = chained(f, preds, lambda o: jnp.sum(o[1]) * 1e-12, 40)
    out["nms_p50_ms"] = round(nms_dt * 1000.0, 3)
    print(json.dumps(dict(out)), flush=True)

    if "fused_tails" in extras:
        # fused Pallas 1x1 matmul+BN+SiLU neck tails
        # (layers.Conv.fused_tail) on the single-image path they serve
        det_f = Detector(plan, head_dtype=jnp.bfloat16, fused_tails=True)
        infer_f = det_f._build_infer(0.25, 0.45, 300)

        @jax.jit
        def step_f(x, carry):
            return infer_f(det_f.params, det_f.batch_stats, x + carry)

        dt1_f = chained(step_f, singles, lambda o: jnp.sum(o[1]) * 1e-12,
                        iters)
        out["infer_1_ms_fused_tails"] = round(dt1_f * 1000.0, 3)
        print(json.dumps(dict(out)), flush=True)

    if "int8" in extras:
        # int8 PTQ serving variant (layers.quant_ctx; v5e MXU int8 path)
        det_q = Detector(plan, head_dtype=jnp.bfloat16, quantize=True)
        det_q.calibrate(variants[0])
        infer_q = det_q._build_infer(0.25, 0.45, 300)

        @jax.jit
        def step_q(x, carry):
            return infer_q(det_q.params, det_q.batch_stats, x + carry)

        dt_q = chained(step_q, variants, lambda o: jnp.sum(o[1]) * 1e-12,
                       iters)
        out["infer_img_s_int8"] = round(batch / dt_q, 2)
        print(json.dumps(dict(out)), flush=True)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def _run_section(args, timeout):
    """Run `bench.py --section ...` in a subprocess; return (dict|None,
    error|None). A wedged tunnel blocks forever inside the client, so
    the timeout is the only reliable recovery. The LAST parseable JSON
    line wins — sections print cumulative partials as they go."""
    cmd = [sys.executable, os.path.abspath(__file__)] + args
    stdout = ""
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        stdout, rc, stderr = p.stdout, p.returncode, p.stderr
        err = None
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"").decode(errors="replace") \
            if isinstance(e.stdout, bytes) else (e.stdout or "")
        rc, stderr = None, ""
        err = f"{args}: timeout after {timeout}s"
    for line in reversed(stdout.strip().splitlines() or [""]):
        try:
            return json.loads(line), err
        except json.JSONDecodeError:
            continue
    if err is None:
        tail = (stderr or stdout or "")[-300:].replace("\n", " | ")
        err = f"{args}: rc={rc} {tail}"
    return None, err


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
            section_train([int(b) for b in rest] or [16], mode)
        elif name == "infer":
            extras = [x for x in rest if x in ("int8", "fused_tails")]
            section_infer(extras=extras)
        return

    def log(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] "
              f"(T+{time.monotonic() - _T0:.0f}s) {msg}",
              file=sys.stderr, flush=True)

    batches = (os.environ.get("BENCH_BATCHES", "").split()
               or [b for b in sys.argv[1:] if b.isdigit()] or ["16"])
    batches = [b for b in batches if b]
    errors = []
    result = {
        "metric": "640px train images/sec/chip (yolov7, bf16, SimOTA step)",
        "value": None, "unit": "img/s", "vs_baseline": None,
    }
    emitted = {"done": False}

    def emit():
        """Print the one JSON line with whatever has been captured so
        far. Called after every section; the driver takes the LAST
        line, so each call supersedes the previous."""
        if result["value"]:
            result["vs_baseline"] = round(
                result["value"] / REF_GPU_TRAIN_IPS, 3)
            ref_cpu, src = _ref_cpu_measured()
            result["ref_cpu_measured_img_s"] = ref_cpu
            result["ref_cpu_measured_source"] = src
            result["vs_ref_cpu_measured"] = round(result["value"] / ref_cpu,
                                                  1)
        if errors:
            result["error"] = "; ".join(errors)
        print(json.dumps(result), flush=True)

    def on_term(signum, frame):
        if not emitted["done"]:
            emitted["done"] = True
            errors.append(f"killed by signal {signum} at "
                          f"T+{time.monotonic() - _T0:.0f}s")
            emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)
    atexit.register(lambda: None if emitted["done"] else emit())

    # ---- probe phase: at most 40% of the budget ----
    probe_deadline = _T0 + 0.4 * TOTAL_BUDGET
    healthy, attempt = False, 0
    while not healthy and time.monotonic() < probe_deadline:
        attempt += 1
        t = min(PROBE_TIMEOUT, max(30, probe_deadline - time.monotonic()))
        out, err = _run_section(["--section", "probe"], t)
        if out and out.get("ok"):
            log(f"probe ok (backend {out.get('backend')})")
            healthy = True
            break
        log(f"probe attempt {attempt} failed: {err}")
        if time.monotonic() + PROBE_COOLDOWN < probe_deadline:
            log(f"cooling down {PROBE_COOLDOWN}s")
            time.sleep(PROBE_COOLDOWN)
        else:
            break
    if not healthy:
        errors.append(f"device probe never succeeded ({attempt} attempts "
                      f"within the {0.4 * TOTAL_BUDGET:.0f}s probe budget)")
        emitted["done"] = True
        emit()
        sys.exit(0)
    emit()

    # ---- train phase: leave INFER_RESERVE for the infer section ----
    modes = [m for m in os.environ.get("BENCH_TRAIN_MODES", "base").split(",")
             if m in TRAIN_MODES]
    sweep = {}
    for mode in modes:
        t = min(_remaining() - INFER_RESERVE, _remaining() - 60)
        if t < SECTION_MIN:
            errors.append(f"train mode {mode} skipped: {_remaining():.0f}s "
                          "left in the global budget")
            break
        out, err = _run_section(
            ["--section", "train", "--mode", mode] + batches, t)
        if out and "train_sweep" in out:
            sweep.update(out["train_sweep"])
        if err:
            errors.append(err)
        good = {k: v for k, v in sweep.items() if v and v > 0}
        if good:
            best = max(good, key=good.get)
            result["value"] = good[best]
            result["train_sweep"] = sweep
            result["train_best_bs"] = best
        emit()
        log(f"train mode {mode} done: {out}")

    # ---- infer phase: the rest of the budget ----
    t = _remaining() - 30
    if t < SECTION_MIN:
        errors.append(f"infer skipped: {_remaining():.0f}s left")
    else:
        extras = [x for x in
                  os.environ.get("BENCH_INFER_EXTRAS", "").split(",") if x]
        out, err = _run_section(["--section", "infer"] + extras, t)
        if out:
            result.update({k: v for k, v in out.items()
                           if k != "train_sweep"})
        if err:
            errors.append(err)
        log(f"infer done: {out}")

    emitted["done"] = True
    emit()
    sys.exit(0)


if __name__ == "__main__":
    main()
