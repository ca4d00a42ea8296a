"""TPU serving wave-ceiling sweep (VERDICT r2 #8).

On the remote-attached TPU every micro-batch wave costs one tunnel
dispatch round-trip (~10-100 ms), so TPU-backend req/s is
    rps ~= requests_per_wave / dispatch_round_trip.
This quantifies both factors under real HTTP load: for each
batch_wait_ms in the sweep it starts the server (current backend),
drives out-of-process keep-alive load, and reads the MicroBatcher's
lifetime counters (requests, waves -> requests/wave). If 0 ms already
saturates requests/wave near the offered concurrency, the dispatch
floor is reached and a bounded wait can only add latency — that
negative is the recorded result.

    python tools/serve_wave.py [--waits 0,1,2,4] [--seconds 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--waits", default="0,1,2,4")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--conns", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-out", default="/tmp/serve_wave.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sparrowrecsys_tpu.config import ServingConfig
    from sparrowrecsys_tpu.serving.catalog import DataManager
    from sparrowrecsys_tpu.serving.server import RecSysServer
    from tools.http_load import run_load

    dm = DataManager().load_data(
        "data/movies.csv", "data/links.csv", "data/ratings.csv",
        "data/modeldata/item2vecEmb.csv", "data/modeldata/userEmb.csv",
    )
    print("backend:", jax.devices()[0].platform, flush=True)
    os.environ["PORT"] = "0"
    uids = [int(u) for u in dm.user_emb_ids[:64]]
    rows = []
    for wait in (float(w) for w in args.waits.split(",")):
        server = RecSysServer(dm, ServingConfig(port=0, batch_wait_ms=wait))
        server.start()
        base = f"http://127.0.0.1:{server.port}"
        for uid in uids[:3]:  # warm (first hit may remote-compile: minutes)
            urllib.request.urlopen(
                f"{base}/getrecforyou?id={uid}&size=32&model=emb",
                timeout=1800,
            ).read()
        b = server.rec_for_you._batcher
        req0, wave0 = b.n_requests, b.n_waves
        res = run_load(
            f"{base}/getrecforyou?id={{id}}&size=32&model=emb",
            procs=args.procs, conns=args.conns, seconds=args.seconds,
            ids=uids,
        )
        dreq, dwave = b.n_requests - req0, b.n_waves - wave0
        server.stop()
        row = {
            "batch_wait_ms": wait, "rps": res["rps"],
            "errors": res["errors"], "p50_ms": res.get("p50_ms"),
            "p99_ms": res.get("p99_ms"),
            "requests_per_wave": round(dreq / max(dwave, 1), 2),
            "waves_per_sec": round(dwave / res["seconds"], 1),
            "batched_requests": dreq, "waves": dwave,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.json_out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
