"""Full-feature online model-ranking load benchmark (VERDICT r2 #4).

The genuinely-new serving capability beyond the reference — 27-feature
online assembly (`serving/assembler.py`) + any zoo model ranking the
top-800 candidates per request (`?model=deepfm`, `?model=din`) — was
correctness-tested but never load-tested. This measures it the same way
as the emb-path rows in BASELINE.md: the real HTTP server in its own
process, out-of-process keep-alive load (tools/http_load.py), plus an
in-process microprofile splitting per-request cost into feature assembly
vs model dispatch. Reference analogue: `RecForYouProcess.java:120-147`
(the `nerualcf` TF-Serving hop, which ships only ids — the 27-feature
schema at `HttpClient.java:127-148` is documented there but never wired).

    python tools/rank_load.py [--models deepfm,din] [--backend cpu|tpu]
        [--seconds 5] [--train-if-missing]
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


def ensure_checkpoint(model_name: str, epochs: int, batch: int) -> str:
    """Train on the 27-column trainingSamples and export a versioned
    checkpoint if data/modeldata/<model>/ has none. CPU backend (the
    checkpoint just needs to be loadable + sane; parity bands live in
    PARITY.md)."""
    model_dir = os.path.join(REPO, "data", "modeldata", model_name)
    if os.path.isdir(model_dir) and any(
        v.isdigit() for v in os.listdir(model_dir)
    ):
        return model_dir
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import encode_samples, load_samples
from sparrowrecsys_tpu.data.negatives import add_dien_negatives
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.training.checkpoint import save
from sparrowrecsys_tpu.training.loop import Trainer

train = encode_samples(load_samples({os.path.join(REPO, 'data', 'trainingSamples.csv')!r}))
loss_fn = None
if {model_name!r} == "dien":
    train = add_dien_negatives(train, seed=2020)
    loss_fn = dien_loss_fn()
tr = Trainer(build_model({model_name!r}),
             TrainConfig(batch_size={batch}, epochs={epochs}, seed=0),
             loss_fn=loss_fn)
res = tr.fit(train, verbose=False)
print("exported", save(res.params, {model_dir!r},
                       meta={{"model": {model_name!r}, "tool": "rank_load"}}))
"""
    print(f"training {model_name} checkpoint (cpu)...", flush=True)
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)
    return model_dir


def start_server(model_name: str, model_dir: str, backend: str,
                 model_batch: int = 0):
    env = dict(os.environ, PORT="0")
    cmd = [
        sys.executable, "-m", "sparrowrecsys_tpu.serving.server",
        "--data-root", os.path.join(REPO, "data"),
        "--rank-model", model_name, "--rank-model-dir", model_dir,
    ]
    if model_batch:
        cmd += ["--model-batch", str(model_batch)]
    if backend == "cpu":
        cmd.append("--cpu")
    proc = subprocess.Popen(
        cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    port = None
    deadline = time.time() + 1800  # first TPU compile can take many minutes
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError(f"server died rc={proc.poll()}")
        if "serving on" in line:
            port = int(line.rsplit(":", 1)[1].strip().rstrip("/"))
            break
    if port is None:
        proc.kill()
        raise RuntimeError("server never became ready")
    return proc, port


def microprofile(model_name: str, model_dir: str, reps: int = 30) -> dict:
    """Per-request cost split: 800-candidate feature assembly (host
    python) vs the jitted scorer dispatch. CPU backend, in-process."""
    code = f"""
import json, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sparrowrecsys_tpu.config import DataConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.serving.assembler import FeatureAssembler
from sparrowrecsys_tpu.serving.catalog import DataManager
from sparrowrecsys_tpu.serving.feature_store import FeatureStore
from sparrowrecsys_tpu.serving.rankers import ModelScorer

data = DataConfig(data_root={os.path.join(REPO, 'data')!r})
dm = DataManager().load_data(
    data.path("movies.csv"), data.path("links.csv"), data.path("ratings.csv"),
    data.path("modeldata/item2vecEmb.csv"), data.path("modeldata/userEmb.csv"))
store_path = data.path("feature_store.json")
import os as _os
store = FeatureStore.load(store_path) if _os.path.exists(store_path) else FeatureStore()
assembler = FeatureAssembler(store, dm)
extra = ()
if {model_name!r} == "dien":
    from sparrowrecsys_tpu.models.dien import NEGATIVE_COLS
    extra = tuple(NEGATIVE_COLS)
scorer = ModelScorer.from_checkpoint(
    build_model({model_name!r}), {model_dir!r},
    assembler=assembler, extra_int_cols=extra)
cands = [m.movie_id for m in dm.get_movies(800, "rating")]
with open(data.path("ratings.csv")) as f:
    next(f)
    uid = int(f.readline().split(",", 1)[0])
assert dm.get_user_by_id(uid) is not None
scorer.score(uid, cands)  # warm/compile
# assembly-only timing: the feature dict build
t_asm = []
for _ in range({reps}):
    t0 = time.perf_counter()
    feats = assembler.features(uid, cands, extra)
    t_asm.append(time.perf_counter() - t0)
# full score timing
t_full = []
for _ in range({reps}):
    t0 = time.perf_counter()
    scorer.score(uid, cands)
    t_full.append(time.perf_counter() - t0)
asm = min(t_asm) * 1e3; full = min(t_full) * 1e3
print("PROFILE " + json.dumps({{
    "assembly_ms": round(asm, 3), "full_ms": round(full, 3),
    "dispatch_ms": round(full - asm, 3)}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("PROFILE "):
            return json.loads(line[len("PROFILE "):])
    raise RuntimeError(f"microprofile failed:\n{out.stdout}\n{out.stderr}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="deepfm,din")
    ap.add_argument("--backend", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--conns", type=int, default=8)
    ap.add_argument("--train-if-missing", action="store_true")
    ap.add_argument("--train-epochs", type=int, default=3)
    ap.add_argument("--train-batch", type=int, default=512)
    ap.add_argument("--skip-profile", action="store_true")
    ap.add_argument("--model-batch", type=int, default=0,
                    help="override the model-path wave size")
    args = ap.parse_args()

    import urllib.request

    from tools.http_load import run_load

    # user ids that exist in the catalog (ratings.csv)
    uids = []
    with open(os.path.join(REPO, "data", "ratings.csv")) as f:
        next(f)
        seen = set()
        for line in f:
            u = int(line.split(",", 1)[0])
            if u not in seen:
                seen.add(u)
                uids.append(u)
            if len(uids) >= 64:
                break

    rows = []
    for model_name in args.models.split(","):
        model_dir = os.path.join(REPO, "data", "modeldata", model_name)
        if args.train_if_missing:
            model_dir = ensure_checkpoint(
                model_name, args.train_epochs, args.train_batch
            )
        proc, port = start_server(
            model_name, model_dir, args.backend, args.model_batch
        )
        try:
            base = f"http://127.0.0.1:{port}"
            for uid in uids[:3]:  # warm every compiled shape
                urllib.request.urlopen(
                    f"{base}/getrecforyou?id={uid}&size=32&model={model_name}",
                    timeout=1800,
                ).read()
            res = run_load(
                f"{base}/getrecforyou?id={{id}}&size=32&model={model_name}",
                procs=args.procs, conns=args.conns, seconds=args.seconds,
                ids=uids,
            )
        finally:
            proc.kill()
            proc.wait()
        row = {
            "metric": f"serving_recforyou_{model_name}_requests_per_sec",
            "backend": args.backend, **res,
        }
        if args.model_batch:
            row["model_batch"] = args.model_batch
        if not args.skip_profile and args.backend == "cpu":
            row["profile"] = microprofile(model_name, model_dir)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
