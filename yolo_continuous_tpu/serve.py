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

Endpoints:
    POST /detect   body = JPEG/PNG bytes -> JSON {boxes, scores,
                   classes, labels} in original-image pixel coordinates
    GET  /healthz  -> {"ok": true, "batch": N}

Run: python -m yolo_continuous_tpu.serve cfg/chip_tiny.yaml --port 8100
"""
from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


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
                 submit_timeout: float = 60.0, warmup: bool = True):
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
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        if warmup:
            # compile the fixed-shape serving graph NOW: a lazy first
            # compile through the TPU tunnel can exceed any sane client
            # timeout and turn cold starts into spurious 503s.
            z = jnp.zeros((self.batch_size, *self.size, 3), jnp.float32)
            out = self.det(z, self.conf, self.nms, self.max_det)
            _ = np.asarray(out[3])
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- client side -----------------------------------------------------
    def submit(self, rgb: np.ndarray,
               timeout: Optional[float] = None) -> Optional[dict]:
        img, _, _ = self._letterbox(rgb, self.size, (114, 114, 114))
        p = _Pending(np.asarray(img, np.float32) / 255.0, rgb.shape[:2])
        self._q.put(p)
        if not p.event.wait(self.submit_timeout if timeout is None
                            else timeout):
            return None
        return p.result

    # -- device side -----------------------------------------------------
    def _drain(self) -> List[_Pending]:
        batch = [self._q.get()]          # block for the first request
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                batch.append(self._q.get(timeout=left))
            except queue.Empty:
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
                boxes, scores, classes, valid = self.det(
                    jnp.asarray(imgs), self.conf, self.nms, self.max_det)
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
                for p in batch:
                    p.result = {"error": f"{type(e).__name__}: {e}"}
            finally:
                for p in batch:
                    p.event.set()

    def close(self):
        self._stop.set()


def make_server(plan, host: str = "127.0.0.1", port: int = 8100,
                batch_size: int = 8, max_wait_ms: float = 5.0,
                conf: float = 0.3, nms: float = 0.45,
                detector=None, submit_timeout: float = 60.0,
                warmup: bool = True) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; caller runs serve_forever()."""
    from .detect_api import Detector

    det = detector or Detector(plan)
    engine = BatchingEngine(det, batch_size, max_wait_ms, conf, nms,
                            submit_timeout=submit_timeout, warmup=warmup)

    class Handler(BaseHTTPRequestHandler):
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
            if self.path == "/healthz":
                self._json(200, {"ok": True, "batch": engine.batch_size,
                                 "image_size": engine.size[0]})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/detect":
                self._json(404, {"error": "not found"})
                return
            if cv2 is None:
                self._json(503, {"error": "cv2 is not available: the "
                                          "server cannot decode image "
                                          "bytes on this host"})
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            buf = np.frombuffer(raw, np.uint8)
            bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if bgr is None:
                self._json(400, {"error": "undecodable image"})
                return
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            res = engine.submit(rgb)
            if res is None:
                self._json(503, {"error": "timeout"})
                return
            self._json(500 if "error" in res else 200, res)

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.engine = engine
    return srv


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser(description="Batched detection server")
    ap.add_argument("cfg")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--nms", type=float, default=0.45)
    ap.add_argument("--submit-timeout", type=float, default=60.0,
                    help="seconds a request waits for its batch result")
    ap.add_argument("--device",
                    default=os.environ.get("JAX_PLATFORMS", "").strip())
    args = ap.parse_args()
    if args.device:
        from .utils.timing import select_device
        select_device(args.device)

    from .config.plan import TrainPlan, check_file
    plan = TrainPlan(check_file(args.cfg))
    srv = make_server(plan, args.host, args.port, args.batch,
                      args.max_wait_ms, args.conf, args.nms,
                      submit_timeout=args.submit_timeout)
    print(f"serving {plan.save_path} on {args.host}:{args.port} "
          f"(batch {args.batch})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
