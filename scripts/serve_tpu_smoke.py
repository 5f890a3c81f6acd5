"""Serving smoke on the real TPU chip.

The serve layer's tests run on CPU; this script measures the real
serving surface end-to-end on hardware — HTTP in, micro-batched device
inference, HTTP out — and records the numbers the serving story is
judged on:

- urgent single-request latency (p50/p95 ms): the ?priority=urgent
  path that skips the batching fill-wait,
- concurrent-client throughput (img/s): many small callers coalesced
  into full device batches,
- streaming throughput (fps): one /detect/stream client pipelining
  length-prefixed frames through the same batcher.

Writes one JSON report (default reports/serve_tpu_smoke.json).
Weights are random (serving perf does not depend on weight values);
the model is the reference's chip-grab workload shape
(cfg/chip_tiny.yaml: yolov7-tiny @640, 1 class).

Run: python scripts/serve_tpu_smoke.py [--device tpu] [--out PATH]
"""
import argparse
import json
import os
import socket
import struct
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--cfg", default="cfg/chip_tiny.yaml")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="reports/serve_tpu_smoke.json")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--posts-per-client", type=int, default=16)
    ap.add_argument("--stream-frames", type=int, default=64)
    args = ap.parse_args()

    import cv2

    if args.device:
        from yolo_continuous_tpu.utils.timing import select_device
        select_device(args.device)
    import jax

    from yolo_continuous_tpu.config.plan import TrainPlan, check_file
    from yolo_continuous_tpu.serve import make_server

    plan = TrainPlan(check_file(args.cfg))
    plan.save_path = "/nonexistent/random_weights.msgpack"
    port = _free_port()
    t0 = time.monotonic()
    srv = make_server(plan, port=port, batch_size=args.batch,
                      max_wait_ms=5.0, conf=0.25, nms=0.45)
    warm_s = time.monotonic() - t0               # includes the compile
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    backend = jax.default_backend()
    print(f"server up on :{port} backend={backend} "
          f"warmup(compile)={warm_s:.1f}s")

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (480, 640, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    body = enc.tobytes()

    def post(path, data=body, timeout=120):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=data,
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    # 1) urgent single-request latency (fill-wait skipped by design)
    lat = []
    post("/detect?priority=urgent")              # settle
    for _ in range(30):
        t = time.monotonic()
        post("/detect?priority=urgent")
        lat.append((time.monotonic() - t) * 1e3)
    lat.sort()
    urgent_p50 = round(lat[len(lat) // 2], 2)
    urgent_p95 = round(lat[int(len(lat) * 0.95)], 2)
    print(f"urgent single-request p50={urgent_p50}ms p95={urgent_p95}ms")

    # 2) concurrent clients -> batched throughput
    n_req = args.clients * args.posts_per_client
    errs = []

    def client():
        for _ in range(args.posts_per_client):
            try:
                post("/detect")
            except Exception as e:    # noqa: BLE001 - record, keep going
                errs.append(str(e))

    t = time.monotonic()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    dt = time.monotonic() - t
    conc_img_s = round(n_req / dt, 1)
    print(f"concurrent: {n_req} reqs / {dt:.2f}s = {conc_img_s} img/s "
          f"({len(errs)} errors)")

    # 3) one streaming client pipelining frames through the batcher
    frames = b"".join(struct.pack(">I", len(body)) + body
                      for _ in range(args.stream_frames))
    import http.client
    t = time.monotonic()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/detect/stream", body=frames)
    resp = conn.getresponse()
    lines = [json.loads(x) for x in resp.read().decode().splitlines()]
    conn.close()
    dt = time.monotonic() - t
    assert lines[-1].get("done") and lines[-1]["frames"] == args.stream_frames
    in_order = [r["frame"] for r in lines[:-1]] == list(
        range(args.stream_frames))
    stream_fps = round(args.stream_frames / dt, 1)
    print(f"stream: {args.stream_frames} frames / {dt:.2f}s = "
          f"{stream_fps} fps (in_order={in_order})")

    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/stats", timeout=30).read())["default"]

    report = {
        "backend": backend,
        "cfg": args.cfg,
        "batch_size": args.batch,
        "warmup_compile_s": round(warm_s, 1),
        "urgent_p50_ms": urgent_p50,
        "urgent_p95_ms": urgent_p95,
        "concurrent_clients": args.clients,
        "concurrent_img_s": conc_img_s,
        "concurrent_errors": len(errs),
        "stream_fps": stream_fps,
        "stream_in_order": in_order,
        "mean_batch_fill": stats["mean_batch_fill"],
        "server_latency_ms": stats.get("latency_ms"),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    srv.shutdown()
    srv.engine.close()


if __name__ == "__main__":
    main()
