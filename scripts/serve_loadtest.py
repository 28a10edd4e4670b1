"""Load-test the coalescing sampler server (cli/serve.py) on real TPU.

Starts the server against $SERVE_RUN_DIR (default `serve_run` — create it
first with `python scripts/make_serve_run.py`; throughput/latency are
weight-independent, so random-init checkpoints give valid numbers, or point
it at any trained run dir), waits for
/healthz, then fires CONCURRENT small requests — the workload the round-2
verdict said serving was thin on — and reports client-side throughput plus
the server's own coalescing stats (dispatches vs requests).

Protocol: W worker threads each POST R requests of n samples
(mc_feng, gamma=0.5, npz format). With linger_ms=10 coalescing, W
concurrent n=16 requests should batch into shared device batches —
dispatches << requests in /healthz stats.

Writes docs/results_r3/serve_loadtest.json (run from repo root).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

PORT = 8811
RUN_DIR = os.environ.get("SERVE_RUN_DIR", "serve_run")
TRANSFORM = os.environ.get("SERVE_TRANSFORM", "rotate90")
WORKERS = int(os.environ.get("SERVE_WORKERS", "8"))
REQS_PER_WORKER = int(os.environ.get("SERVE_REQS", "4"))
N_PER_REQ = int(os.environ.get("SERVE_N_PER_REQ", "16"))
SERVER_BATCH = int(os.environ.get("SERVE_BATCH", "64"))
SOLVER = os.environ.get("SERVE_SOLVER", "euler")
NUM_STEPS = int(os.environ.get("SERVE_STEPS", "100"))
TIME_GRID = os.environ.get("SERVE_TIME_GRID", "uniform")
OUT_SUFFIX = os.environ.get("SERVE_OUT_SUFFIX", "")
WARM_REQS = 2


def post(path, obj, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def get(path, timeout=60):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{PORT}{path}", timeout=timeout) as r:
        return json.loads(r.read())


def main():
    repo = os.path.abspath(os.path.dirname(os.path.dirname(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"
    srv = subprocess.Popen(
        [sys.executable, "-m", "ratio_guided_multimodal_fm_tpu.cli.serve",
         "--experiment", "mnist_transform", "--transform_type", TRANSFORM,
         "--port", str(PORT), "--batch_size", str(SERVER_BATCH),
         "--num_steps", str(NUM_STEPS), "--solver", SOLVER,
         "--time_grid", TIME_GRID,
         "--mc_batch_size", "256", "--dtype", "bf16"],
        cwd=os.path.join(repo, RUN_DIR), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 1200   # first compiles are slow (CLAUDE.md)
        while True:
            try:
                h = get("/healthz")
                break
            except Exception:
                if time.time() > deadline:
                    raise RuntimeError("server never came up")
                if srv.poll() is not None:
                    raise RuntimeError(f"server exited rc={srv.returncode}")
                time.sleep(5)
        print("server up:", h, flush=True)

        for i in range(WARM_REQS):   # warm the mc_feng program + MC set
            post("/sample", {"num_samples": N_PER_REQ,
                             "guidance_method": "mc_feng",
                             "guidance_strength": 0.5, "seed": i})
        stats0 = get("/healthz")["stats"]

        lat = []
        lock = threading.Lock()

        def worker(wid):
            for r in range(REQS_PER_WORKER):
                t0 = time.perf_counter()
                out = post("/sample", {
                    "num_samples": N_PER_REQ,
                    "guidance_method": "mc_feng",
                    "guidance_strength": 0.5,
                    "seed": 1000 + wid * 100 + r})
                dt = time.perf_counter() - t0
                with lock:
                    lat.append((dt, out["num_samples"]))

        t0 = time.perf_counter()
        ts = [threading.Thread(target=worker, args=(w,))
              for w in range(WORKERS)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        stats1 = get("/healthz")["stats"]

        total = sum(n for _, n in lat)
        lats = sorted(d for d, _ in lat)
        out = {
            "workload": {"workers": WORKERS,
                         "requests_per_worker": REQS_PER_WORKER,
                         "samples_per_request": N_PER_REQ,
                         "method": f"mc_feng gamma=0.5, {SOLVER}-{NUM_STEPS}"
                                   f" ({TIME_GRID} grid), warm MC set",
                         "experiment": f"mnist_transform/{TRANSFORM}",
                         "server_batch": SERVER_BATCH, "linger_ms": 10},
            "wall_sec": round(wall, 3),
            "client_samples_per_sec": round(total / wall, 1),
            "request_latency_sec": {
                "p50": round(lats[len(lats) // 2], 3),
                "p95": round(lats[int(len(lats) * 0.95)], 3),
                "max": round(lats[-1], 3)},
            "coalescing": {
                "requests": stats1["requests"] - stats0["requests"],
                "device_dispatches": stats1["dispatches"] - stats0["dispatches"],
                "coalesced_max": stats1["coalesced_max"],
            },
        }
        os.makedirs(os.path.join(repo, "docs/results_r3"), exist_ok=True)
        with open(os.path.join(
                repo, f"docs/results_r3/serve_loadtest{OUT_SUFFIX}.json"),
                  "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out), flush=True)
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()


if __name__ == "__main__":
    main()
