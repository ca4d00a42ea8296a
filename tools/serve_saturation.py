"""Open-loop serving saturation sweep (VERDICT r3 #4).

The closed-loop load harness (tools/http_load.py default mode) can never
exceed the server's capacity — each connection waits for its response —
so the BASELINE.md wave-ceiling result ("micro-wait can't raise req/wave")
was correct but said nothing about production (open-loop) traffic. This
tool sweeps a CONSTANT-ARRIVAL-RATE generator past saturation:

  for each offered rate R: requests fire at exactly R/s whatever the
  server does; latency is measured from the scheduled send time, so
  queueing delay is charged to the server (no coordinated omission).

The knee — where achieved rps stops tracking offered and p99 departs —
is the server's true capacity. Sweeps the emb cosine path and the
full-feature model path, the latter at model_batch {8, 16, 32} to answer
whether bigger compiled waves move the knee under open-loop load (the
closed-loop sweep showed they cannot; BASELINE.md rank-load section).

    python tools/serve_saturation.py --backend cpu \
        --paths emb,deepfm --rates 200,400,800,1200,1600
    python tools/serve_saturation.py --backend tpu \
        --paths deepfm --rates 20,40,80,160 --model-batches 8,16,32

Writes rows to saturation.json and prints one JSON line per point.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.http_load import run_open_loop  # noqa: E402


def start_server(backend: str, rank_model=None, model_batch: int = 0,
                 max_inflight: int = -1):
    env = dict(os.environ, PORT="0")
    cmd = [
        sys.executable, "-m", "sparrowrecsys_tpu.serving.server",
        "--data-root", os.path.join(REPO, "data"),
    ]
    if rank_model:
        cmd += ["--rank-model", rank_model, "--rank-model-dir",
                os.path.join(REPO, "data", "modeldata", rank_model)]
    if model_batch:
        cmd += ["--model-batch", str(model_batch)]
    if max_inflight >= 0:
        # -1 = use the server's own (bounded) default; 0 = explicit
        # unbounded opt-out for like-for-like collapse curves.
        cmd += ["--max-inflight", str(max_inflight)]
    if backend == "cpu":
        cmd.append("--cpu")
    proc = subprocess.Popen(
        cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.time() + 1800  # first TPU compile: many minutes (tunnel)
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError(f"server died rc={proc.poll()}")
        if "serving on" in line:
            return proc, int(line.rsplit(":", 1)[1].strip().rstrip("/"))
    proc.kill()
    raise RuntimeError("server never became ready")


def catalog_user_ids(limit: int = 64) -> list:
    uids, seen = [], set()
    with open(os.path.join(REPO, "data", "ratings.csv")) as f:
        next(f)
        for line in f:
            u = int(line.split(",", 1)[0])
            if u not in seen:
                seen.add(u)
                uids.append(u)
            if len(uids) >= limit:
                break
    return uids


def sweep(path: str, backend: str, rates, seconds: float, procs: int,
          model_batch: int = 0, max_inflight: int = -1) -> list:
    import urllib.request

    rank_model = None if path == "emb" else path
    proc, port = start_server(backend, rank_model, model_batch, max_inflight)
    rows = []
    try:
        base = f"http://127.0.0.1:{port}"
        uids = catalog_user_ids()
        for uid in uids[:3]:  # warm every compiled shape
            urllib.request.urlopen(
                f"{base}/getrecforyou?id={uid}&size=32&model={path}",
                timeout=1800,
            ).read()
        for rate in rates:
            res = run_open_loop(
                f"{base}/getrecforyou?id={{id}}&size=32&model={path}",
                rate=rate, seconds=seconds, procs=procs, ids=uids,
            )
            row = {"path": path, "backend": backend, **res}
            if model_batch:
                row["model_batch"] = model_batch
            if max_inflight != 0:
                row["max_inflight"] = (
                    "default" if max_inflight < 0 else max_inflight
                )
            rows.append(row)
            print(json.dumps(row), flush=True)
            time.sleep(1.0)  # let queues fully drain between points
    finally:
        proc.kill()
        proc.wait()
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--paths", default="emb,deepfm")
    ap.add_argument("--rates", default="200,400,800,1200,1600,2000")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--model-batches", default="0",
                    help="model-path wave sizes to sweep (0 = config default)")
    ap.add_argument("--max-inflight", type=int, default=-1,
                    help="admission-control bound (503 shedding); -1 = the "
                    "server's default (ServingConfig.max_inflight=32), "
                    "0 = explicit unbounded opt-out")
    ap.add_argument("--out", default=os.path.join(REPO, "saturation.json"))
    args = ap.parse_args()

    rates = [float(r) for r in args.rates.split(",")]
    all_rows = []
    for path in args.paths.split(","):
        batches = (
            [int(b) for b in args.model_batches.split(",")]
            if path != "emb" else [0]
        )
        for mb in batches:
            all_rows.extend(
                sweep(path, args.backend, rates, args.seconds, args.procs,
                      mb, args.max_inflight)
            )

    existing = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f).get("rows", [])
    with open(args.out, "w") as f:
        json.dump({"rows": existing + all_rows}, f, indent=1)
    print(f"wrote {len(all_rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
