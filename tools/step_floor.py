"""DeepFM single-chip floor: op-count budget + epoch-scan unroll A/B (VERDICT r2 #9).

BASELINE.md's roofline says the step is bound by per-op overhead inside
the scanned step, not HBM or MXU. This tool makes that budget concrete:

1. compiles the bench-protocol epoch (batch 65536) for deepfm and dien
   and counts compiled HLO instructions / fusions inside the while-loop
   body — the op budget round 4 should argue against;
2. A/Bs `TrainConfig.epoch_unroll` in {1, 2, 4}: unrolling replicates
   the step body inside the compiled loop, amortizing per-iteration
   while-loop overhead with identical numerics. Interleaved best-of-N,
   forced sync.

    python tools/step_floor.py [--budget-only] [model ...]

--budget-only (VERDICT r3 #8) skips the unroll A/B (measured a wash on
deepfm + dien) and prints just the compiled-HLO op budget — run it over
all 8 zoo models for the complete single-chip floor ledger.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def hlo_budget(trainer, data, labels, n) -> dict:
    """Compiled-HLO instruction counts for the epoch executable."""
    params = trainer.init_params(
        {k: np.zeros((2,), np.int32 if "int" in str(v.dtype) else np.float32)
         for k, v in data.items()}
    )
    lowered = trainer._train_epoch.lower(
        params, trainer.tx.init(params), M.init_metrics(), data, labels,
        jax.random.PRNGKey(0), n=n, batch_size=BATCH, shuffle=True,
    )
    txt = lowered.compile().as_text()
    counts = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = \S+ (\w+)\(", line)
        if m:
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: -kv[1])[:12]
    return {"total_hlo_instructions": total,
            "fusions": counts.get("fusion", 0),
            "while": counts.get("while", 0),
            "top": top}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--budget-only"]
    budget_only = "--budget-only" in sys.argv[1:]
    models = args or ["deepfm"]
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    for name in models:
        data, labels_d = gen_epoch_fn(n, dien=(name == "dien"))(
            jax.random.PRNGKey(0)
        )
        sample_host = {
            k: np.zeros((2,), np.int32 if v.dtype == np.int32 else np.float32)
            for k, v in data.items()
        }
        loss_fn = dien_loss_fn() if name == "dien" else None

        if budget_only:
            tr = Trainer(
                build_model(name), TrainConfig(batch_size=BATCH, epochs=1),
                loss_fn=loss_fn,
            )
            tr._build_steps()
            b = hlo_budget(tr, data, labels_d, n)
            print(f"{name} HLO budget: {b['total_hlo_instructions']} "
                  f"instructions, {b['fusions']} fusions, "
                  f"{b['while']} while; top: {b['top']}", flush=True)
            continue

        runs = {}
        for unroll in (1, 2, 4):
            tr = Trainer(
                build_model(name),
                TrainConfig(batch_size=BATCH, epochs=1, epoch_unroll=unroll),
                loss_fn=loss_fn,
            )
            tr._build_steps()
            if unroll == 1:
                b = hlo_budget(tr, data, labels_d, n)
                print(f"{name} HLO budget: {b['total_hlo_instructions']} "
                      f"instructions, {b['fusions']} fusions, "
                      f"{b['while']} while; top: {b['top']}", flush=True)
            params = tr.init_params(sample_host)
            carry = tr._train_epoch(
                params, tr.tx.init(params), M.init_metrics(),
                data, labels_d, jax.random.PRNGKey(0),
                n=n, batch_size=BATCH, shuffle=True,
            )
            hard_sync(carry[0])
            runs[unroll] = (tr, carry)

        best = {u: float("inf") for u in runs}
        for i in range(4):
            for u in runs:
                tr, carry = runs[u]
                t0 = time.perf_counter()
                carry = tr._train_epoch(
                    *carry, data, labels_d, jax.random.PRNGKey(i + 1),
                    n=n, batch_size=BATCH, shuffle=True,
                )
                hard_sync(carry[0])
                best[u] = min(best[u], time.perf_counter() - t0)
                runs[u] = (tr, carry)
        for u, b in best.items():
            print(f"{name} unroll={u}: {b/STEPS*1e3:7.3f} ms/step "
                  f"{n/b/1e6:7.2f}M ex/s", flush=True)


if __name__ == "__main__":
    main()
