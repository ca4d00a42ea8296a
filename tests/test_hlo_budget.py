"""Compiled-HLO instruction-count regression gate (VERDICT r4 #6).

BASELINE.md's single-chip floor ledger showed instruction count tracks
zoo throughput almost perfectly (the step is per-op dispatch-bound at
reference shapes), but the ledger was documentation — a 20% instruction
regression in any model would have passed the whole suite. This test
compiles every zoo model's device-resident epoch executable on the CPU
backend at a fixed tiny protocol and asserts the instruction count stays
within a band of the recorded table (tests/hlo_budget.json).

The band is +/-10% by default: HLO pass pipelines are deterministic for
fixed code + jax version, so any drift inside the band is benign fusion
jitter from a legitimate model/trainer change; past it, either fix the
regression or consciously re-record (python tests/test_hlo_budget.py).

CPU counts differ from the TPU ledger in BASELINE.md (different backend
passes) — this gate tracks RELATIVE drift, the TPU ledger documents the
absolute floor story.
"""

import json
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BUDGET_PATH = os.path.join(os.path.dirname(__file__), "hlo_budget.json")
#: Gate protocol: tiny shapes so the 8 compiles stay cheap. Instruction
#: count is shape-independent structure (while-loop body), so small is
#: representative.
BATCH = 512
STEPS = 2
BAND = 0.10


def _zoo():
    from sparrowrecsys_tpu.models import MODEL_REGISTRY

    return sorted(MODEL_REGISTRY)


def compiled_instruction_count(name: str) -> dict:
    import jax

    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.models.dien import dien_loss_fn
    from sparrowrecsys_tpu.ops import metrics as M
    from sparrowrecsys_tpu.training.loop import Trainer
    from tools.zoo_bench import gen_epoch_fn

    n = BATCH * STEPS
    data, labels = gen_epoch_fn(n, dien=(name == "dien"))(jax.random.PRNGKey(0))
    sample = {
        k: np.zeros((2,), np.int32 if "int" in str(v.dtype) else np.float32)
        for k, v in data.items()
    }
    loss_fn = dien_loss_fn() if name == "dien" else None
    tr = Trainer(build_model(name), TrainConfig(batch_size=BATCH, epochs=1),
                 loss_fn=loss_fn)
    tr._build_steps()
    params = tr.init_params(sample)
    txt = tr._train_epoch.lower(
        params, tr.tx.init(params), M.init_metrics(), data, labels,
        jax.random.PRNGKey(0), n=n, batch_size=BATCH, shuffle=True,
    ).compile().as_text()
    counts = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = \S+ (\w+)\(", line)
        if m:
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return {"total": sum(counts.values()),
            "fusions": counts.get("fusion", 0)}


@pytest.mark.parametrize("name", _zoo())
def test_hlo_budget_within_band(name):
    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    assert name in budget["models"], (
        f"{name} has no recorded HLO budget — run "
        f"`python tests/test_hlo_budget.py` to record it"
    )
    rec = budget["models"][name]["total"]
    got = compiled_instruction_count(name)["total"]
    lo, hi = rec * (1 - BAND), rec * (1 + BAND)
    assert lo <= got <= hi, (
        f"{name}: compiled epoch has {got} HLO instructions, recorded "
        f"budget {rec} (band +/-{BAND:.0%}: [{lo:.0f}, {hi:.0f}]). A real "
        f"regression should be fixed; an intentional change re-records "
        f"via `python tests/test_hlo_budget.py`."
    )


def _record() -> None:
    models = {}
    for name in _zoo():
        row = compiled_instruction_count(name)
        models[name] = row
        print(f"{name}: {row['total']} instructions, {row['fusions']} fusions",
              flush=True)
    with open(BUDGET_PATH, "w") as f:
        json.dump(
            {"protocol": {"backend": "cpu", "batch": BATCH, "steps": STEPS,
                          "band": BAND},
             "models": models},
            f, indent=1,
        )
    print(f"wrote {BUDGET_PATH}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    _record()
