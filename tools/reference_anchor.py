"""Run the REFERENCE TF/Keras model scripts, unmodified, on this repo's
generated samples — the parity anchor VERDICT r1 asked for (task 4).

The reference scripts (`/root/reference/TFRecModel/.../tensorflow/*.py`)
load data via `tf.keras.utils.get_file(name, file://<author's mac path>)`;
get_file returns the cached `~/.keras/datasets/<name>` when it exists, so
seeding the cache with `data/trainingSamples.csv` + `data/testSamples.csv`
makes the scripts run verbatim with zero modification (no copying — the
code executes from the read-only mount). TF 2.21 ships Keras 3, which
dropped `DenseFeatures`; `TF_USE_LEGACY_KERAS=1` routes tf.keras to the
baked-in tf_keras (Keras 2) where the reference API surface exists.

    python tools/reference_anchor.py [--runs 3] [--models EmbeddingMLP,...]

Writes tools/reference_anchor.json; PARITY.md's "reference-run anchor"
section is derived from it.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/TFRecModel/src/com/sparrowrecsys/offline/tensorflow"
MODELS = ["EmbeddingMLP", "WideNDeep", "NeuralCF", "DeepFM", "DeepFM_v2", "DIN", "DIEN"]

NUM = r"([-+\d.enaif]+)"  # float incl. negative/scientific/nan/inf
FOUR = re.compile(
    rf"Test Loss {NUM}, Test Accuracy {NUM}, "
    rf"Test ROC AUC {NUM}, Test PR AUC {NUM}"
)
TWO = re.compile(rf"Test Loss {NUM},\s+Test ROC AUC {NUM}")


def seed_cache():
    cache = os.path.expanduser("~/.keras/datasets")
    os.makedirs(cache, exist_ok=True)
    for name in ("trainingSamples.csv", "testSamples.csv"):
        src = os.path.join(REPO, "data", name)
        dst = os.path.join(cache, name)
        shutil.copyfile(src, dst)
    return cache


def run_once(model: str, timeout: int = 3600):
    env = dict(os.environ)
    env["TF_USE_LEGACY_KERAS"] = "1"
    env["TF_CPP_MIN_LOG_LEVEL"] = "2"
    env["CUDA_VISIBLE_DEVICES"] = ""
    t0 = time.time()
    script = os.path.join(REF_DIR, f"{model}.py")
    if model == "DIEN":
        # pandas-3 shim (see tools/_run_dien_ref.py) — script unmodified
        cmd = [sys.executable, os.path.join(REPO, "tools", "_run_dien_ref.py"), script]
    else:
        cmd = [sys.executable, script]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, env=env,
        cwd="/tmp",
    )
    out = proc.stdout + proc.stderr
    m = FOUR.search(out)
    rec = {"wall_s": round(time.time() - t0, 1), "exit": proc.returncode}
    if m:
        rec.update(
            loss=float(m.group(1)), accuracy=float(m.group(2)),
            roc_auc=float(m.group(3)), pr_auc=float(m.group(4)),
        )
    else:
        m2 = TWO.search(out)
        if m2:
            rec.update(loss=float(m2.group(1)), roc_auc=float(m2.group(2)))
        else:
            rec["error_tail"] = out[-2000:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--models", default=",".join(MODELS))
    args = ap.parse_args()

    seed_cache()
    results = {}
    out_path = os.path.join(REPO, "tools", "reference_anchor.json")
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for model in args.models.split(","):
        runs = results.setdefault(model, [])
        for i in range(len(runs), args.runs):
            rec = run_once(model)
            runs.append(rec)
            status = (
                f"roc_auc={rec.get('roc_auc')}" if "roc_auc" in rec
                else f"FAILED exit={rec['exit']}"
            )
            print(f"{model} run {i + 1}: {status} ({rec['wall_s']}s)", flush=True)
            json.dump(results, open(out_path, "w"), indent=1)
    # summary
    print("\nmodel          n  roc_auc mean±std        pr_auc mean±std")
    import statistics as st

    for model, runs in results.items():
        rocs = [r["roc_auc"] for r in runs if "roc_auc" in r]
        prs = [r["pr_auc"] for r in runs if "pr_auc" in r]
        if rocs:
            rs = f"{st.mean(rocs):.4f}±{(st.stdev(rocs) if len(rocs) > 1 else 0):.4f}"
            ps = (
                f"{st.mean(prs):.4f}±{(st.stdev(prs) if len(prs) > 1 else 0):.4f}"
                if prs else "—"
            )
            print(f"{model:<14} {len(rocs)}  {rs:<20} {ps}")
        else:
            print(f"{model:<14} 0  all runs failed")


if __name__ == "__main__":
    main()
