"""Batched HTTP serving around ``Detector`` (deployment layer).

The reference has no serving story at all (SURVEY §1: "no serving
layer") — its only inference surface is the single-image ``predict``
script (detect.py:208-265). This module turns the device-resident
batched inference path (forward + decode + NMS in one jitted graph,
fixed shapes) into a production-style microservice:

- **micro-batching**: concurrent requests are coalesced into one device
  batch (up to ``batch_size``, waiting at most ``max_wait_ms``) — the
  TPU sees large batches even under many small callers, which is where
  its throughput lives (MXU utilization rises with batch).
- **fixed-shape serving**: the device graph is compiled ONCE for
  (batch_size, size, size, 3); partial batches are padded. No
  per-request recompiles, no dynamic shapes — and the engine warms
  (compiles) that graph at construction, so the first real client
  never pays the compile inside its request timeout.
- **one device sync per batch**: the letterbox-inverse box mapping back
  to original-image pixels runs on host in numpy
  (``ops.nms.yolo_correct_boxes_np``) — per-request device round trips
  would serialize ~100 ms tunnel RTTs inside the worker loop.
- no framework dependencies: stdlib HTTP (ThreadingHTTPServer) + numpy;
  cv2 is used only to decode request JPEG/PNG bytes (without it the
  server still runs and returns 503 with an explanatory error).

- **request prioritization**: every request carries a priority
  (``low`` < ``normal`` < ``high`` < ``urgent``). The shared queue is a
  priority queue (FIFO within a level), so under load high-priority
  traffic is batched first; an ``urgent`` request additionally cuts the
  batching wait short — the worker dispatches immediately with whatever
  is queued instead of waiting ``max_wait_ms`` for fill. This bounds
  tail latency for latency-critical callers without a separate engine.
- **streaming**: ``POST /detect/stream`` accepts a stream of frames
  (4-byte big-endian length prefix + JPEG/PNG bytes, repeated; body may
  be Content-Length or chunked) and streams back one NDJSON line per
  frame as results complete, in frame order. Frames are pipelined
  through the batching engine (up to ``batch_size`` in flight), so a
  single video client still fills device batches.

Endpoints:
    POST /detect          body = JPEG/PNG bytes -> JSON {boxes, scores,
                          classes, labels} in original-image pixel
                          coordinates. Optional ``?conf=0.6`` raises the
                          score threshold for THIS request (host-side
                          post-filter; it can only tighten the engine's
                          batch threshold, never loosen it). Optional
                          ``?priority=low|normal|high|urgent``.
    POST /detect/<model>  same, routed to a named model
                          (multi-model serving, ``make_multi_server``)
    POST /detect/stream   length-prefixed frame stream in, NDJSON lines
                          out (one per frame, in order, streamed as
                          they complete). ``?conf=``/``?priority=``
                          apply to every frame. Also
                          ``/detect/<model>/stream`` (a model cannot be
                          named "stream").
    POST /models/<m>/reload  hot-swap <m>'s weights from its plan's
                          checkpoint (no recompile, no downtime: params
                          are call arguments to the jitted graph; the
                          swap is serialized against in-flight batches).
    GET  /healthz         -> {"ok": true, "models": {...}}
    GET  /models          -> per-model config (image size, labels, batch)
    GET  /stats           -> per-model live counters: requests, batches,
                          mean batch fill, errors, per-priority request
                          counts, request-latency p50/p95/max ms

Run: python -m yolo_continuous_tpu.serve cfg/chip_tiny.yaml --port 8100
Multi-model: ... serve cfg/a.yaml --model tiny=cfg/b.yaml --model x=cfg/c.yaml
"""
from __future__ import annotations

import collections
import itertools
import json
import queue
import threading
import time
import urllib.parse
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# request priority levels (names accepted at the HTTP layer); higher
# runs sooner. URGENT additionally skips the batching fill-wait.
PRIORITIES = {"low": -1, "normal": 0, "high": 1, "urgent": 2}
URGENT = PRIORITIES["urgent"]


class _Pending:
    __slots__ = ("image", "shape", "event", "result")

    def __init__(self, image, shape):
        self.image = image          # letterboxed (H, W, 3) float array
        self.shape = shape          # original (h, w)
        self.event = threading.Event()
        self.result = None


class BatchingEngine:
    """Coalesces requests into fixed-size device batches."""

    def __init__(self, detector, batch_size: int = 8, max_wait_ms: float = 5.0,
                 conf: float = 0.3, nms: float = 0.45, max_det: int = 100,
                 submit_timeout: float = 60.0, warmup: bool = True,
                 reload_every: float = 0.0):
        """``reload_every`` > 0 starts a checkpoint watcher: every that
        many seconds the plan's save_path mtime is polled and a change
        triggers a hot reload — the continuous-training serving story
        (a Trainer writing checkpoints next door is picked up live,
        zero downtime, no recompile)."""
        import jax.numpy as jnp

        from .ops.nms import yolo_correct_boxes_np
        from .ops.preprocess import letterbox

        self._jnp = jnp
        self._letterbox = letterbox
        self._correct_np = yolo_correct_boxes_np
        self.det = detector
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self.conf, self.nms, self.max_det = conf, nms, max_det
        self.submit_timeout = submit_timeout
        self.size = (detector.plan.image_size, detector.plan.image_size)
        # priority queue of (-priority, seq, pending): higher priority
        # first, FIFO within a level (seq is a global monotonic counter)
        self._q: "queue.PriorityQueue" = queue.PriorityQueue()
        self._seq = itertools.count()
        self._stop = threading.Event()
        # serializes weight hot-swaps (reload) against in-flight batches
        self._det_lock = threading.Lock()
        # live monitoring counters (GET /stats)
        self._stats_lock = threading.Lock()
        self._t0 = time.monotonic()
        self._n_requests = 0
        self._n_timeouts = 0
        self._n_batches = 0
        self._n_batched_reqs = 0
        self._n_errors = 0
        self._n_reloads = 0
        self._n_by_priority = collections.Counter()
        self._latencies = collections.deque(maxlen=512)  # seconds
        if warmup:
            # compile the fixed-shape serving graph NOW: a lazy first
            # compile through the TPU tunnel can exceed any sane client
            # timeout and turn cold starts into spurious 503s.
            z = jnp.zeros((self.batch_size, *self.size, 3), jnp.float32)
            out = self.det(z, self.conf, self.nms, self.max_det)
            _ = np.asarray(out[3])
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        self.reload_every = reload_every
        if reload_every and reload_every > 0:
            threading.Thread(target=self._watch_checkpoint,
                             daemon=True).start()

    # -- client side -----------------------------------------------------
    def submit(self, rgb: np.ndarray, timeout: Optional[float] = None,
               conf: Optional[float] = None,
               priority: int = 0) -> Optional[dict]:
        """Block until this image's detections are ready.

        ``conf``: optional per-request score threshold — a host-side
        post-filter on the shared batch's results (the device batch runs
        at the engine's threshold, so a request can only tighten it).

        ``priority``: PRIORITIES value (default normal). Higher-priority
        requests are drained into device batches first; ``urgent`` also
        makes the worker dispatch its batch without waiting for fill."""
        t_in = time.monotonic()
        img, _, _ = self._letterbox(rgb, self.size, (114, 114, 114))
        p = _Pending(np.asarray(img, np.float32) / 255.0, rgb.shape[:2])
        with self._stats_lock:
            self._n_requests += 1
            self._n_by_priority[priority] += 1
        self._q.put((-priority, next(self._seq), p))
        if not p.event.wait(self.submit_timeout if timeout is None
                            else timeout):
            with self._stats_lock:
                self._n_timeouts += 1
            return None
        with self._stats_lock:
            self._latencies.append(time.monotonic() - t_in)
        res = p.result
        if (conf is not None and res is not None and "scores" in res
                and conf > self.conf):
            keep = [i for i, s in enumerate(res["scores"]) if s >= conf]
            res = {k: ([v[i] for i in keep] if isinstance(v, list) else v)
                   for k, v in res.items()}
        return res

    def stats(self) -> dict:
        """Live counters for the /stats monitoring endpoint."""
        with self._stats_lock:
            lats = sorted(self._latencies)
            n_b = self._n_batches
            out = {
                "uptime_s": round(time.monotonic() - self._t0, 1),
                "requests": self._n_requests,
                "timeouts": self._n_timeouts,
                "batches": n_b,
                "mean_batch_fill": round(self._n_batched_reqs / n_b, 3)
                if n_b else None,
                "batch_errors": self._n_errors,
                "reloads": self._n_reloads,
                "by_priority": {
                    name: self._n_by_priority[v]
                    for name, v in PRIORITIES.items()
                    if self._n_by_priority[v]},
            }
            if lats:
                out["latency_ms"] = {
                    "p50": round(lats[len(lats) // 2] * 1e3, 2),
                    "p95": round(lats[int(len(lats) * 0.95)
                                      if len(lats) > 1 else 0] * 1e3, 2),
                    "max": round(lats[-1] * 1e3, 2),
                    "window": len(lats),
                }
        return out

    # -- device side -----------------------------------------------------
    def _drain(self) -> List[_Pending]:
        neg, _, first = self._q.get()    # block for the first request
        batch = [first]
        if -neg >= URGENT:
            # urgent head-of-line: take whatever is ALREADY queued (free
            # batching) but never sit out the fill wait
            while len(batch) < self.batch_size:
                try:
                    batch.append(self._q.get_nowait()[2])
                except queue.Empty:
                    break
            return batch
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                neg, _, p = self._q.get(timeout=left)
            except queue.Empty:
                break
            batch.append(p)
            if -neg >= URGENT:           # urgent arrival ends the wait
                break
        return batch

    def _loop(self):
        jnp = self._jnp
        while not self._stop.is_set():
            try:
                batch = self._drain()
            except Exception:
                continue
            try:
                imgs = np.zeros((self.batch_size, *self.size, 3), np.float32)
                for i, p in enumerate(batch):
                    imgs[i] = p.image
                with self._det_lock:    # never mid-swap (reload_weights)
                    boxes, scores, classes, valid = self.det(
                        jnp.asarray(imgs), self.conf, self.nms,
                        self.max_det)
                boxes = np.asarray(boxes)
                scores = np.asarray(scores)
                classes = np.asarray(classes)
                valid = np.asarray(valid)
                labels = self.det.plan.labels
                # letterbox-inverse for the WHOLE batch on host: zero
                # extra device syncs (each costs a full tunnel RTT)
                shapes = np.asarray([p.shape for p in batch], np.float32)
                mapped_all = self._correct_np(
                    boxes[: len(batch)], self.size, shapes, True)
                for i, p in enumerate(batch):
                    m = valid[i]
                    xyxy = mapped_all[i][:, [1, 0, 3, 2]][m]
                    cls = classes[i][m].astype(int)
                    p.result = {
                        "boxes": [[float(v) for v in b] for b in xyxy],
                        "scores": [float(s) for s in scores[i][m]],
                        "classes": [int(c) for c in cls],
                        "labels": [labels[c] if 0 <= c < len(labels)
                                   else str(c) for c in cls],
                    }
            except Exception as e:      # a bad batch must not kill serving
                with self._stats_lock:
                    self._n_errors += 1
                for p in batch:
                    p.result = {"error": f"{type(e).__name__}: {e}"}
            finally:
                with self._stats_lock:
                    self._n_batches += 1
                    self._n_batched_reqs += len(batch)
                for p in batch:
                    p.event.set()

    def reload(self, path: Optional[str] = None) -> bool:
        """Hot-swap the detector's weights from its checkpoint (see
        Detector.reload_weights) without dropping queued requests: the
        swap is serialized against the worker's device call, so every
        batch runs on a consistent (params, batch_stats) pair and the
        next batch after a successful reload serves the new weights —
        no recompile, no downtime."""
        with self._det_lock:
            ok = bool(self.det.reload_weights(path))
        if ok:
            with self._stats_lock:
                self._n_reloads += 1
        return ok

    def _watch_checkpoint(self):
        """Poll the checkpoint's mtime; reload on change (the
        continuous-training -> serving loop)."""
        import os
        last = None
        while not self._stop.wait(self.reload_every):
            path = getattr(self.det.plan, "save_path", None)
            try:
                mtime = os.path.getmtime(path) if path else None
            except OSError:
                mtime = None
            if mtime is not None and mtime != last:
                if self.reload():
                    last = mtime

    def close(self):
        self._stop.set()


class _BodyReader:
    """Exact-read view of an HTTP request body.

    Supports both Content-Length bodies and ``Transfer-Encoding:
    chunked`` (stdlib BaseHTTPRequestHandler does not de-chunk), so the
    /detect/stream endpoint can consume a body the client produces
    incrementally (e.g. live video frames)."""

    def __init__(self, rfile, headers):
        self._rfile = rfile
        te = (headers.get("Transfer-Encoding") or "").lower()
        self._chunked = "chunked" in te
        self._left = (0 if self._chunked
                      else int(headers.get("Content-Length") or 0))
        self._chunk_left = 0
        self._eof = False

    def _read_exact(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            part = self._rfile.read(n - len(out))
            if not part:
                break
            out += part
        return out

    def read(self, n: int) -> bytes:
        """Read exactly ``n`` bytes; short result means end of body."""
        if self._eof or n <= 0:
            return b""
        if not self._chunked:
            n = min(n, self._left)
            out = self._read_exact(n)
            self._left -= len(out)
            if self._left <= 0 or len(out) < n:
                self._eof = True
            return out
        out = b""
        while len(out) < n:
            if self._chunk_left == 0:
                line = self._rfile.readline(130)
                if not line:
                    self._eof = True
                    break
                line = line.strip().split(b";")[0]
                if not line:                      # CRLF between chunks
                    continue
                try:
                    size = int(line, 16)
                except ValueError:
                    self._eof = True
                    break
                if size == 0:                     # last-chunk; trailers
                    while True:
                        t = self._rfile.readline(1024)
                        if t in (b"", b"\r\n", b"\n"):
                            break
                    self._eof = True
                    break
                self._chunk_left = size
            take = min(n - len(out), self._chunk_left)
            part = self._read_exact(take)
            out += part
            self._chunk_left -= len(part)
            if len(part) < take:
                self._eof = True
                break
        return out


def make_multi_server(models: dict, host: str = "127.0.0.1",
                      port: int = 8100, batch_size: int = 8,
                      max_wait_ms: float = 5.0, conf: float = 0.3,
                      nms: float = 0.45, submit_timeout: float = 60.0,
                      warmup: bool = True,
                      reload_every: float = 0.0) -> ThreadingHTTPServer:
    """Multi-model server: ``models`` maps name -> plan (or
    ``(plan, detector)`` to reuse a built Detector). Each model gets its
    own BatchingEngine (own compiled graph, queue, worker, stats);
    ``POST /detect/<name>`` routes to it, ``POST /detect`` to the first
    entry. Build only (caller runs serve_forever())."""
    from .detect_api import Detector

    engines, default_name = {}, None
    for name, entry in models.items():
        plan, det = entry if isinstance(entry, tuple) else (entry, None)
        det = det or Detector(plan)
        engines[name] = BatchingEngine(
            det, batch_size, max_wait_ms, conf, nms,
            submit_timeout=submit_timeout, warmup=warmup,
            reload_every=reload_every)
        default_name = default_name or name

    def _model_info(name):
        e = engines[name]
        return {"image_size": e.size[0], "batch": e.batch_size,
                "conf": e.conf, "nms": e.nms,
                "labels": list(e.det.plan.labels)}

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 so the stream endpoint can send a chunked response;
        # every non-stream response carries Content-Length.
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):     # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path == "/healthz":
                d = engines[default_name]
                self._json(200, {"ok": True, "batch": d.batch_size,
                                 "image_size": d.size[0],
                                 "models": {n: {"batch": e.batch_size,
                                                "image_size": e.size[0]}
                                            for n, e in engines.items()}})
            elif path == "/models":
                self._json(200, {n: _model_info(n) for n in engines})
            elif path == "/stats":
                self._json(200, {n: e.stats() for n, e in engines.items()})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urllib.parse.urlparse(self.path)
            parts = url.path.strip("/").split("/")
            if (parts[0] == "models" and len(parts) == 3
                    and parts[2] == "reload"):
                eng = engines.get(parts[1])
                if eng is None:
                    self._json(404, {"error": f"unknown model "
                                              f"{parts[1]!r}",
                                     "models": list(engines)})
                    return
                ok = eng.reload()
                self._json(200 if ok else 404,
                           {"reloaded": ok, "model": parts[1],
                            **({} if ok else
                               {"error": "no checkpoint at "
                                         f"{eng.det.plan.save_path!r}"})})
                return
            stream = parts[-1] == "stream" and len(parts) >= 2
            if stream:
                parts = parts[:-1]
            if parts[0] != "detect" or len(parts) > 2:
                self.close_connection = True     # body not consumed
                self._json(404, {"error": "not found"})
                return
            name = parts[1] if len(parts) == 2 else default_name
            engine = engines.get(name)
            if engine is None:
                self.close_connection = True
                self._json(404, {"error": f"unknown model {name!r}",
                                 "models": list(engines)})
                return
            if cv2 is None:
                self.close_connection = True
                self._json(503, {"error": "cv2 is not available: the "
                                          "server cannot decode image "
                                          "bytes on this host"})
                return
            q = urllib.parse.parse_qs(url.query)
            try:
                req_conf = float(q["conf"][0]) if "conf" in q else None
            except ValueError:
                self.close_connection = True
                self._json(400, {"error": "bad conf parameter"})
                return
            pri_s = q.get("priority", ["normal"])[0]
            try:
                priority = (PRIORITIES[pri_s] if pri_s in PRIORITIES
                            else int(pri_s))
            except ValueError:
                self.close_connection = True
                self._json(400, {"error": f"bad priority {pri_s!r} "
                                          f"(one of {list(PRIORITIES)} "
                                          "or an int)"})
                return
            if stream:
                self._stream(engine, req_conf, priority)
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            buf = np.frombuffer(raw, np.uint8)
            bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if bgr is None:
                self._json(400, {"error": "undecodable image"})
                return
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            res = engine.submit(rgb, conf=req_conf, priority=priority)
            if res is None:
                self._json(503, {"error": "timeout"})
                return
            self._json(500 if "error" in res else 200, res)

        def _stream(self, engine, req_conf, priority):
            """POST /detect[/<model>]/stream — frames in, NDJSON out.

            Request body: repeated [4-byte big-endian length][image
            bytes] records (Content-Length or chunked). Response: one
            JSON line per frame, in frame order, written as each result
            completes. Up to ``batch_size`` frames are in flight at
            once, so a single streaming client still fills device
            batches (the whole point of the batching engine)."""
            self.close_connection = True         # chunked one-shot
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(obj):
                data = (json.dumps(obj) + "\n").encode()
                self.wfile.write(b"%x\r\n" % len(data) + data + b"\r\n")
                self.wfile.flush()

            def flush_one(entry):
                i, fut = entry
                if fut is None:
                    emit({"frame": i, "error": "undecodable image"})
                    return
                res = fut.result()
                if res is None:
                    emit({"frame": i, "error": "timeout"})
                else:
                    emit({"frame": i, **res})

            reader = _BodyReader(self.rfile, self.headers)
            depth = max(2, engine.batch_size)
            pending = collections.deque()
            n_frames = 0
            try:
                with ThreadPoolExecutor(max_workers=depth) as ex:
                    while True:
                        hdr = reader.read(4)
                        if len(hdr) < 4:
                            break
                        n = int.from_bytes(hdr, "big")
                        if n == 0 or n > (64 << 20):
                            emit({"frame": n_frames,
                                  "error": f"bad frame length {n}"})
                            break
                        raw = reader.read(n)
                        if len(raw) < n:
                            emit({"frame": n_frames,
                                  "error": "truncated frame"})
                            break
                        buf = np.frombuffer(raw, np.uint8)
                        bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
                        if bgr is None:
                            pending.append((n_frames, None))
                        else:
                            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
                            pending.append((n_frames, ex.submit(
                                engine.submit, rgb, conf=req_conf,
                                priority=priority)))
                        n_frames += 1
                        while len(pending) >= depth:
                            flush_one(pending.popleft())
                    while pending:
                        flush_one(pending.popleft())
                emit({"done": True, "frames": n_frames})
                self.wfile.write(b"0\r\n\r\n")
                self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass                             # client went away

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.engines = engines
    srv.engine = engines[default_name]      # back-compat single-model attr
    return srv


def make_server(plan, host: str = "127.0.0.1", port: int = 8100,
                batch_size: int = 8, max_wait_ms: float = 5.0,
                conf: float = 0.3, nms: float = 0.45,
                detector=None, submit_timeout: float = 60.0,
                warmup: bool = True,
                reload_every: float = 0.0) -> ThreadingHTTPServer:
    """Single-model server (the multi-model server with one entry)."""
    return make_multi_server({"default": (plan, detector)}, host, port,
                             batch_size, max_wait_ms, conf, nms,
                             submit_timeout, warmup, reload_every)


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser(description="Batched detection server")
    ap.add_argument("cfg", help="default model's train-plan YAML")
    ap.add_argument("--model", action="append", default=[],
                    metavar="NAME=CFG",
                    help="serve an additional named model "
                         "(POST /detect/NAME); repeatable")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--nms", type=float, default=0.45)
    ap.add_argument("--submit-timeout", type=float, default=60.0,
                    help="seconds a request waits for its batch result")
    ap.add_argument("--reload-every", type=float, default=0.0,
                    metavar="SECONDS",
                    help="poll each model's checkpoint mtime this often "
                         "and hot-reload on change (continuous-training "
                         "serving); 0 disables")
    ap.add_argument("--device",
                    default=os.environ.get("JAX_PLATFORMS", "").strip())
    args = ap.parse_args()
    if args.device:
        from .utils.timing import select_device
        select_device(args.device)

    from .config.plan import TrainPlan, check_file
    models = {"default": TrainPlan(check_file(args.cfg))}
    for spec in args.model:
        name, _, cfg = spec.partition("=")
        if not cfg:
            ap.error(f"--model expects NAME=CFG, got {spec!r}")
        models[name] = TrainPlan(check_file(cfg))
    srv = make_multi_server(models, args.host, args.port, args.batch,
                            args.max_wait_ms, args.conf, args.nms,
                            submit_timeout=args.submit_timeout,
                            reload_every=args.reload_every)
    print(f"serving {list(models)} on {args.host}:{args.port} "
          f"(batch {args.batch})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
