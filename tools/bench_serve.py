#!/usr/bin/env python
"""HTTP-level serving benchmark (VERDICT r3 #8): drive serve.py with
concurrent clients and report request latency percentiles and throughput,
micro-batched vs lock-serialized.

The tool owns the server lifecycle: it spawns `serve.py` as a subprocess
(the ONE process that touches the chip — this client side is pure stdlib
HTTP, so the one-TPU-process rule holds), waits for /healthz, fires a
warmup burst (first-request compiles: detector + model shapes), then runs
`--clients` threads POSTing the sample video back-to-back for
`--duration` seconds.

Usage:
  python tools/bench_serve.py [--video <mp4>] [--clients 8] [--duration 20]
      [--frames 15] [--net genconvit] [--face-backend fullframe]
      [--modes staged,8,0]  # staged = production pipeline; a number =
                            # micro-batch window ms; 0 = lock-serialized

Output: one JSON line per mode + a final summary line comparing them.
The serving contract measured here is the reference's per-video verdict
(ref model/pred_func.py:111-131) behind a resident jitted model.
"""

import argparse
import http.client
import json
import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_healthy(port: int, proc: subprocess.Popen, timeout: float) -> None:
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(f"server exited rc={proc.returncode}")
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            c.request("GET", "/healthz")
            if c.getresponse().status == 200:
                return
        except (ConnectionError, socket.timeout, OSError):
            time.sleep(1.0)
    raise TimeoutError(f"server not healthy after {timeout:.0f}s")


def post_video(port: int, body: bytes, timeout: float = 300.0) -> dict:
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request("POST", "/predict", body=body,
              headers={"Content-Type": "video/mp4"})
    r = c.getresponse()
    payload = json.loads(r.read())
    if r.status != 200:
        raise RuntimeError(f"HTTP {r.status}: {payload}")
    return payload


def run_mode(port: int, body: bytes, clients: int, duration: float,
             warmup: int) -> dict:
    for _ in range(warmup):  # compile + cache warm, not measured
        post_video(port, body)
    lat: list = []
    errors = [0]
    stop_at = time.perf_counter() + duration
    lock = threading.Lock()

    def worker():
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            try:
                post_video(port, body)
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
            except Exception:
                with lock:
                    errors[0] += 1

    threads = [threading.Thread(target=worker) for _ in range(clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    if not lat:
        return {"error": "no successful requests", "errors": errors[0]}
    a = np.asarray(sorted(lat))
    return {
        "requests": len(lat),
        "errors": errors[0],
        "req_per_sec": round(len(lat) / wall, 2),
        "p50_ms": round(float(np.percentile(a, 50)) * 1e3, 1),
        "p95_ms": round(float(np.percentile(a, 95)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(a, 99)) * 1e3, 1),
        "mean_ms": round(float(a.mean()) * 1e3, 1),
        "clients": clients,
        "wall_s": round(wall, 1),
    }


def main():
    ap = argparse.ArgumentParser("bench_serve")
    ap.add_argument("--video", default=os.path.join(
        "/root/reference/sample_prediction_data", "sample_2.mp4"))
    ap.add_argument("--port", type=int, default=8917)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--net", default="genconvit")
    ap.add_argument("--face-backend", default="fullframe",
                    help="serving preprocess backend (fullframe isolates "
                         "the chip path; hybrid adds detector cost)")
    ap.add_argument("--weights-dir", default="weight")
    ap.add_argument("--modes", default="staged,8,0",
                    help="comma list: 'staged' = production pipeline, a "
                         "number = micro-batch window ms, 0 = "
                         "lock-serialized baseline")
    ap.add_argument("--server-timeout", type=float, default=600.0)
    args = ap.parse_args()

    with open(args.video, "rb") as f:
        body = f.read()
    results = {}
    for mode in (m.strip() for m in args.modes.split(",")):
        cmd = [sys.executable, os.path.join(REPO, "serve.py"),
               "--port", str(args.port), "--net", args.net,
               "--f", str(args.frames), "--face-backend", args.face_backend,
               "--weights-dir", args.weights_dir]
        if mode == "staged":
            cmd += ["--batcher", "staged"]
        elif mode == "0":
            cmd += ["--batcher", "none"]
        else:
            cmd += ["--batcher", "micro", "--batch-window-ms", mode]
        print(f"[bench_serve] starting server (batch window {mode}ms)...",
              file=sys.stderr, flush=True)
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                                stderr=subprocess.STDOUT)
        try:
            wait_healthy(args.port, proc, args.server_timeout)
            r = run_mode(args.port, body, args.clients, args.duration,
                         args.warmup)
            try:  # device-side accounting (serve.py /statz)
                c = http.client.HTTPConnection("127.0.0.1", args.port,
                                               timeout=10)
                c.request("GET", "/statz")
                stats = json.loads(c.getresponse().read())
                if "device_launches" in stats:
                    r["device_launches"] = stats["device_launches"]
                    r["videos_scored"] = stats["videos_scored"]
                    if stats["device_launches"]:
                        r["videos_per_launch"] = round(
                            stats["videos_scored"]
                            / stats["device_launches"], 2)
            except Exception:
                pass
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
        if mode == "staged":
            key = "staged"
        elif mode == "0":
            key = "lock_serialized"
        else:
            key = f"window_{mode}ms"
            r["batch_window_ms"] = float(mode)
        results[key] = r
        print(json.dumps({key: r}), flush=True)

    summary = {"metric": "serve_http", "video": os.path.basename(args.video),
               "frames": args.frames, "net": args.net,
               "face_backend": args.face_backend, **results}
    batched = next((v for k, v in results.items() if k != "lock_serialized"
                    and "req_per_sec" in v), None)
    serial = results.get("lock_serialized")
    if batched and serial and "req_per_sec" in serial:
        summary["batching_speedup"] = round(
            batched["req_per_sec"] / max(serial["req_per_sec"], 1e-9), 2)
    staged = results.get("staged")
    if staged and serial and "req_per_sec" in staged \
            and "req_per_sec" in serial:
        summary["staged_speedup"] = round(
            staged["req_per_sec"] / max(serial["req_per_sec"], 1e-9), 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
