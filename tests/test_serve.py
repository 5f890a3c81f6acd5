"""Serving layer test: real HTTP server, micro-batched device inference.

New capability vs the reference (SURVEY §1: "no serving layer"). A tiny
model serves on localhost; concurrent clients post JPEGs and get JSON
detections back; the batching engine coalesces them into one device
batch.
"""
import json
import socket
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.detect_api import Detector
from yolo_continuous_tpu.serve import make_server

ANCHORS = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]


def _tiny_plan():
    net = {"depth_multiple": 1.0, "width_multiple": 1.0,
           "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                        [-1, 1, "Conv", [16, 3, 2]],
                        [-1, 1, "Conv", [16, 3, 2]],
                        [-1, 1, "Conv", [32, 3, 2]],
                        [-1, 1, "Conv", [64, 3, 2]]],
           "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]]}
    return TrainPlan({
        "device": "cpu", "train": "x", "val": "x", "epochs": 1,
        "batch_size": 2, "image_size": 64, "image_chan": 3, "enhance": True,
        "shuffle": True, "pin_memory": False, "drop_last": False,
        "workers": 0, "labels": ["a", "b"],
        "enhance_cfg": "cfg/enhance/enhance.yaml", "model_cfg": net,
        "anchors": ANCHORS, "anchors_mask": [[6, 7, 8], [3, 4, 5], [0, 1, 2]],
        "adam": True, "decay": "Cosine", "lrI": 0.001, "lrF": 0.1,
        "momentum": 0.9, "weight_decay": 0.0, "warmup": False,
        "warmup_epochs": 1, "warmup_max_iter": 1, "warmup_momentum": 0.8,
        "warmup_bias_lr": 0.1, "focal_gamma": 1.5, "focal_alpha": 0.25,
        "resume": False, "save_dir": "/tmp", "save_name": "serve_t",
        "max_boxes": 8,
    })


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_serve_http_roundtrip():
    cv2 = pytest.importorskip("cv2")
    plan = _tiny_plan()
    plan.save_path = "/nonexistent/x.msgpack"    # random weights are fine
    det = Detector(plan, dtype=jnp.float32)
    port = _free_port()
    srv = make_server(plan, port=port, batch_size=4, max_wait_ms=20.0,
                      conf=0.0, nms=0.5, detector=det)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["batch"] == 4

        img = np.full((48, 80, 3), 120, np.uint8)
        cv2.rectangle(img, (10, 10), (40, 35), (230, 40, 40), -1)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok

        results = []

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=enc.tobytes(),
                headers={"Content-Type": "image/jpeg"})
            with urllib.request.urlopen(req, timeout=120) as r:
                results.append(json.loads(r.read()))

        threads = [threading.Thread(target=post) for _ in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        assert len(results) == 3
        for res in results:
            assert set(res) == {"boxes", "scores", "classes", "labels"}
            assert len(res["boxes"]) == len(res["scores"]) \
                == len(res["classes"]) == len(res["labels"])
            for b in res["boxes"]:           # original-image pixel coords
                assert len(b) == 4
        # identical inputs -> identical outputs (batched together or not)
        assert results[0] == results[1] == results[2]
    finally:
        srv.shutdown()
        srv.engine.close()


class _FlakyDetector:
    """Delegates to a real Detector but raises on chosen calls."""

    def __init__(self, det, fail_first=1):
        self._det = det
        self.plan = det.plan
        self.calls = 0
        self._fail_first = fail_first

    def __call__(self, *a, **k):
        self.calls += 1
        if self.calls <= self._fail_first:
            raise RuntimeError("injected batch failure")
        return self._det(*a, **k)


def test_serve_batch_failure_isolated():
    """A batch that raises must produce error JSON + 500 for ITS requests
    only; the worker thread survives and the NEXT request succeeds
    (serve.py _loop's except path)."""
    cv2 = pytest.importorskip("cv2")
    plan = _tiny_plan()
    plan.save_path = "/nonexistent/x.msgpack"
    det = _FlakyDetector(Detector(plan, dtype=jnp.float32), fail_first=1)
    port = _free_port()
    # warmup=False so the injected failure hits the first REQUEST batch,
    # not the construction-time warm batch
    srv = make_server(plan, port=port, batch_size=2, max_wait_ms=5.0,
                      conf=0.0, nms=0.5, detector=det, warmup=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = np.full((32, 32, 3), 90, np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=enc.tobytes(),
                headers={"Content-Type": "image/jpeg"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, body = post()          # first batch -> injected failure
        assert code == 500
        assert "injected batch failure" in body["error"]

        code, body = post()          # worker survived; next batch is fine
        assert code == 200
        assert set(body) == {"boxes", "scores", "classes", "labels"}
    finally:
        srv.shutdown()
        srv.engine.close()


def test_submit_timeout_returns_none():
    """submit() must give up after the engine's submit_timeout (503 at
    the HTTP layer) when the device side stalls."""
    import time

    from yolo_continuous_tpu.serve import BatchingEngine

    plan = _tiny_plan()
    plan.save_path = "/nonexistent/x.msgpack"
    real = Detector(plan, dtype=jnp.float32)

    class _Stalling:
        plan = real.plan

        def __call__(self, *a, **k):
            time.sleep(2.0)
            return real(*a, **k)

    eng = BatchingEngine(_Stalling(), batch_size=1, max_wait_ms=1.0,
                         conf=0.0, nms=0.5, submit_timeout=0.2,
                         warmup=False)
    try:
        t0 = time.monotonic()
        res = eng.submit(np.full((16, 16, 3), 80, np.uint8))
        assert res is None                      # timed out, not hung
        assert time.monotonic() - t0 < 1.5
    finally:
        eng.close()


def test_serve_multi_model_stats_and_conf():
    """Multi-model routing (POST /detect/<name>), /models + /stats
    monitoring endpoints, and the per-request ?conf= post-filter."""
    cv2 = pytest.importorskip("cv2")
    from yolo_continuous_tpu.serve import make_multi_server

    plan_a, plan_b = _tiny_plan(), _tiny_plan()
    plan_a.save_path = plan_b.save_path = "/nonexistent/x.msgpack"
    det_a = Detector(plan_a, dtype=jnp.float32)
    det_b = Detector(plan_b, dtype=jnp.float32)
    port = _free_port()
    srv = make_multi_server({"a": (plan_a, det_a), "b": (plan_b, det_b)},
                            port=port, batch_size=2, max_wait_ms=5.0,
                            conf=0.0, nms=0.5)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert set(health["models"]) == {"a", "b"}

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/models", timeout=30) as r:
            models = json.loads(r.read())
        assert models["a"]["labels"] == ["a", "b"]
        assert models["b"]["image_size"] == 64

        img = np.full((48, 80, 3), 120, np.uint8)
        cv2.rectangle(img, (10, 10), (40, 35), (230, 40, 40), -1)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok

        def post(path):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=enc.tobytes(),
                headers={"Content-Type": "image/jpeg"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        res_a = post("/detect/a")            # named route
        res_default = post("/detect")        # default = first entry ("a")
        assert res_a == res_default
        res_b = post("/detect/b")            # independent engine, same cfg
        assert set(res_b) == {"boxes", "scores", "classes", "labels"}

        # per-request conf post-filter: strictly fewer-or-equal results,
        # and every surviving score clears the threshold
        if res_a["scores"]:
            cut = sorted(res_a["scores"])[len(res_a["scores"]) // 2]
            res_cut = post(f"/detect/a?conf={cut}")
            assert len(res_cut["scores"]) <= len(res_a["scores"])
            assert all(s >= cut for s in res_cut["scores"])

        # unknown model -> 404 with the model list
        try:
            post("/detect/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            body = json.loads(e.read())
            assert e.code == 404 and set(body["models"]) == {"a", "b"}

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["a"]["requests"] >= 3
        assert stats["a"]["batches"] >= 1
        assert stats["a"]["latency_ms"]["p50"] > 0
        assert stats["b"]["requests"] == 1
        assert stats["a"]["timeouts"] == 0
    finally:
        srv.shutdown()
        for e in srv.engines.values():
            e.close()


def test_priority_ordering():
    """Queued requests must be drained high-priority-first (FIFO within
    a level): with the worker blocked on its first batch, low/normal/
    high requests enqueued together are processed high, normal, low
    (serve.py BatchingEngine priority queue)."""
    import time

    from yolo_continuous_tpu.serve import PRIORITIES, BatchingEngine

    plan = _tiny_plan()
    plan.save_path = "/nonexistent/x.msgpack"
    real = Detector(plan, dtype=jnp.float32)

    order = []
    gate = threading.Event()

    class _Recorder:
        plan = real.plan

        def __call__(self, imgs, *a, **k):
            gate.wait(30)           # holds the FIRST batch open until
            order.append(int(round(  # the contenders are all enqueued
                float(np.asarray(imgs)[0].max()) * 255)))
            return real(imgs, *a, **k)

    # batch_size=1: every request becomes its own batch, so `order`
    # records the exact drain order of the queue
    eng = BatchingEngine(_Recorder(), batch_size=1, max_wait_ms=1.0,
                         conf=0.0, nms=0.5, warmup=False)
    try:
        # 64x64 inputs == model size: letterbox is identity (no 114
        # padding), so each image's max pixel is its marker value
        def img(v):
            return np.full((64, 64, 3), v, np.uint8)

        threads = [threading.Thread(
            target=eng.submit, args=(img(10),))]    # occupies the worker
        threads[0].start()
        deadline = time.monotonic() + 10
        while eng._q.qsize() > 0 and time.monotonic() < deadline:
            time.sleep(0.01)        # worker picked up the first request
        for v, pri in [(40, PRIORITIES["low"]), (80, PRIORITIES["normal"]),
                       (120, PRIORITIES["high"])]:
            t = threading.Thread(target=eng.submit, args=(img(v),),
                                 kwargs={"priority": pri})
            t.start()
            threads.append(t)
        deadline = time.monotonic() + 10
        while eng._q.qsize() < 3 and time.monotonic() < deadline:
            time.sleep(0.01)        # all three contenders enqueued
        assert eng._q.qsize() == 3
        gate.set()
        for t in threads:
            t.join(timeout=60)
        assert order == [10, 120, 80, 40]
        stats = eng.stats()
        assert stats["by_priority"] == {"low": 1, "normal": 2, "high": 1}
    finally:
        gate.set()
        eng.close()


def test_urgent_skips_fill_wait():
    """An urgent request must dispatch immediately instead of sitting
    out max_wait_ms waiting for the batch to fill; a normal request in
    the same engine pays the full fill wait (serve.py _drain)."""
    import time

    from yolo_continuous_tpu.serve import PRIORITIES, BatchingEngine

    plan = _tiny_plan()
    plan.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan, dtype=jnp.float32)
    eng = BatchingEngine(det, batch_size=4, max_wait_ms=1500.0,
                         conf=0.0, nms=0.5)       # warmup pays compile
    try:
        img = np.full((64, 64, 3), 90, np.uint8)
        t0 = time.monotonic()
        res = eng.submit(img, priority=PRIORITIES["urgent"])
        dt_urgent = time.monotonic() - t0
        assert res is not None
        t0 = time.monotonic()
        res = eng.submit(img)                     # normal: waits for fill
        dt_normal = time.monotonic() - t0
        assert res is not None
        assert dt_normal >= 1.2                   # sat out max_wait_ms
        assert dt_urgent < 1.0                    # did not
    finally:
        eng.close()


def test_model_hot_reload(tmp_path):
    """POST /models/<name>/reload hot-swaps weights from the plan's
    checkpoint: 404 while no checkpoint exists, then a successful
    reload changes the detections for the same input (Detector.
    reload_weights swaps params without recompiling the infer graph)."""
    cv2 = pytest.importorskip("cv2")
    import jax

    from yolo_continuous_tpu.train.checkpoint import save_checkpoint

    plan = _tiny_plan()
    ckpt = str(tmp_path / "reload.msgpack")
    plan.save_path = ckpt                        # does not exist yet
    det = Detector(plan, dtype=jnp.float32)
    port = _free_port()
    srv = make_server(plan, port=port, batch_size=2, max_wait_ms=5.0,
                      conf=0.0, nms=0.5, detector=det)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = np.full((48, 80, 3), 120, np.uint8)
        cv2.rectangle(img, (10, 10), (40, 35), (230, 40, 40), -1)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok

        def post(path, data=b""):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=data,
                headers={"Content-Type": "application/octet-stream"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, before = post("/detect", enc.tobytes())
        assert code == 200 and before["scores"]

        code, body = post("/models/default/reload")     # no ckpt yet
        assert code == 404 and body["reloaded"] is False

        code, body = post("/models/nope/reload")
        assert code == 404 and "unknown model" in body["error"]

        # write a checkpoint with DIFFERENT weights (scaled params)
        new_params = jax.tree.map(lambda a: np.asarray(a) * 1.5,
                                  det.params)
        save_checkpoint(ckpt, {
            "params": new_params, "batch_stats": det.batch_stats,
            "ema": {"tree": {"params": new_params,
                             "batch_stats": det.batch_stats}}})

        code, body = post("/models/default/reload")
        assert code == 200 and body["reloaded"] is True

        code, after = post("/detect", enc.tobytes())
        assert code == 200
        assert after != before                   # new weights serving
    finally:
        srv.shutdown()
        srv.engine.close()


def test_auto_reload_watcher(tmp_path):
    """reload_every > 0: the engine polls the checkpoint mtime and
    hot-swaps weights when it changes — the continuous-training serving
    loop (BatchingEngine._watch_checkpoint)."""
    import time

    import jax

    from yolo_continuous_tpu.serve import BatchingEngine
    from yolo_continuous_tpu.train.checkpoint import save_checkpoint

    plan = _tiny_plan()
    ckpt = str(tmp_path / "watch.msgpack")
    plan.save_path = ckpt                        # not written yet
    det = Detector(plan, dtype=jnp.float32)
    leaf = jax.tree.leaves(det.params)[0]
    before = np.asarray(leaf).copy()
    eng = BatchingEngine(det, batch_size=1, max_wait_ms=1.0,
                         conf=0.0, nms=0.5, warmup=False,
                         reload_every=0.1)
    try:
        time.sleep(0.4)                          # polls see no file: noop
        assert eng.stats()["reloads"] == 0

        new_params = jax.tree.map(lambda a: np.asarray(a) * 2.0,
                                  det.params)
        save_checkpoint(ckpt, {
            "params": new_params, "batch_stats": det.batch_stats,
            "ema": {"tree": {"params": new_params,
                             "batch_stats": det.batch_stats}}})
        deadline = time.monotonic() + 10
        while eng.stats()["reloads"] == 0 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert eng.stats()["reloads"] >= 1
        after = np.asarray(jax.tree.leaves(det.params)[0])
        np.testing.assert_allclose(after, before * 2.0, rtol=1e-6)
    finally:
        eng.close()


def test_stream_endpoint():
    """POST /detect/stream: length-prefixed frames in, one NDJSON line
    per frame out (in order), matching the single-shot /detect results
    for the same images; plus the trailing done record."""
    cv2 = pytest.importorskip("cv2")
    import http.client
    import struct

    plan = _tiny_plan()
    plan.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan, dtype=jnp.float32)
    port = _free_port()
    srv = make_server(plan, port=port, batch_size=4, max_wait_ms=10.0,
                      conf=0.0, nms=0.5, detector=det)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        frames, encs = [], []
        for shade in (60, 130, 200):              # three distinct frames
            img = np.full((48, 80, 3), shade, np.uint8)
            cv2.rectangle(img, (10, 10), (40, 35), (230, 40, 40), -1)
            ok, enc = cv2.imencode(".jpg", img)
            assert ok
            frames.append(img)
            encs.append(enc.tobytes())
        body = b"".join(struct.pack(">I", len(e)) + e for e in encs)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/detect/stream", body=body)
        resp = conn.getresponse()                 # http.client de-chunks
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "application/x-ndjson"
        lines = [json.loads(x) for x in resp.read().decode().splitlines()]
        conn.close()

        assert lines[-1] == {"done": True, "frames": 3}
        results = lines[:-1]
        assert [r["frame"] for r in results] == [0, 1, 2]   # in order
        for r in results:
            assert set(r) == {"frame", "boxes", "scores", "classes",
                              "labels"}

        # each streamed frame's detections == the single-shot endpoint's
        for i, enc in enumerate(encs):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=enc,
                headers={"Content-Type": "image/jpeg"})
            with urllib.request.urlopen(req, timeout=120) as r:
                single = json.loads(r.read())
            assert {k: v for k, v in results[i].items() if k != "frame"} \
                == single

        # undecodable frame -> per-frame error line, stream continues
        junk = b"\x00" * 32
        body = (struct.pack(">I", len(junk)) + junk
                + struct.pack(">I", len(encs[0])) + encs[0])
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/detect/stream", body=body)
        resp = conn.getresponse()
        lines = [json.loads(x) for x in resp.read().decode().splitlines()]
        conn.close()
        assert lines[0] == {"frame": 0, "error": "undecodable image"}
        assert lines[1]["frame"] == 1 and "boxes" in lines[1]
        assert lines[-1] == {"done": True, "frames": 2}
    finally:
        srv.shutdown()
        srv.engine.close()
