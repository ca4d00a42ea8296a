"""Properties of the sequence-signal synthetic generator (VERDICT r2 #3).

The generator's contract is what makes tools/seq_signal.py meaningful:
the planted signal must be (a) strong (oracle AUC well above chance),
(b) purely *sequential* — invisible to any model without a history ->
candidate interaction channel — and (c) order-sensitive, so DIEN's
order-aware recurrence has something DIN's permutation-invariant pooling
cannot see. Full training runs live in tools/seq_signal.py (TPU);
these tests pin the generator itself on CPU.
"""

from __future__ import annotations

import numpy as np

from sparrowrecsys_tpu.data.synthetic import (
    sequence_ctr_with_oracle,
    synthetic_sequence_ctr_dataset,
)

N = 60_000


def test_schema_matches_zoo_contract():
    ds = synthetic_sequence_ctr_dataset(512, seed=1)
    assert len(ds) == 512
    ids = {"movieId", "userId"} | {f"userRatedMovie{k}" for k in range(1, 6)}
    for c in ids:
        assert ds.features[c].dtype == np.int32
        assert ds.features[c].min() >= 1  # 0 is the mask id for history
    assert ds.features["releaseYear"].dtype == np.float32
    assert set(ds.labels) <= {0.0, 1.0}


def test_deterministic_per_seed():
    a = synthetic_sequence_ctr_dataset(256, seed=3)
    b = synthetic_sequence_ctr_dataset(256, seed=3)
    c = synthetic_sequence_ctr_dataset(256, seed=4)
    np.testing.assert_array_equal(a.features["userRatedMovie1"],
                                  b.features["userRatedMovie1"])
    np.testing.assert_array_equal(a.labels, b.labels)
    assert (a.labels != c.labels).any()


def test_oracle_auc_is_strong():
    from sparrowrecsys_tpu.ops.metrics import exact_auc

    ds, logit = sequence_ctr_with_oracle(N, seed=7)
    auc = exact_auc(1 / (1 + np.exp(-logit)), ds.labels)["roc_auc"]
    assert auc > 0.80, auc


def test_candidate_marginal_carries_no_signal():
    """Per-candidate label rates estimated on one half predict ~nothing on
    the other half: popularity memorization can't beat ~0.5 AUC."""
    from sparrowrecsys_tpu.ops.metrics import exact_auc

    ds, _ = sequence_ctr_with_oracle(N, seed=7)
    cand, y = ds.features["movieId"], ds.labels
    half = N // 2
    rate = np.full(1001, y[:half].mean(), np.float64)
    np.add.at(cnt := np.zeros(1001), cand[:half], 1)
    np.add.at(tot := np.zeros(1001), cand[:half], y[:half])
    seen = cnt > 0
    rate[seen] = tot[seen] / cnt[seen]
    auc = exact_auc(rate[cand[half:]], y[half:])["roc_auc"]
    assert abs(auc - 0.5) < 0.03, auc


def test_history_order_matters():
    """Reversing the history changes the planted logit for almost every
    row — the recency decay makes the signal genuinely sequential."""
    ds, logit = sequence_ctr_with_oracle(4096, seed=7, recency=0.6)
    hist = np.stack(
        [ds.features[f"userRatedMovie{k}"] for k in range(1, 6)], axis=1
    )
    # Rebuild the planted matrices exactly as the generator does.
    rng = np.random.default_rng(7)
    a = rng.normal(size=(1001, 8)).astype(np.float32)
    b = rng.normal(size=(1001, 8)).astype(np.float32)
    w = (0.6 ** np.arange(5)).astype(np.float32)
    compat = np.einsum(
        "ntd,nd->nt", a[hist], b[ds.features["movieId"]]
    ) / np.sqrt(8)
    np.testing.assert_allclose(
        3.0 * (compat @ w) / np.linalg.norm(w), logit, rtol=1e-4
    )
    rev = 3.0 * (compat[:, ::-1] @ w) / np.linalg.norm(w)
    assert (np.abs(rev - logit) > 0.1).mean() > 0.9


def test_drift_generator_contract():
    """drift_ctr_with_oracle (VERDICT r4 #3b): schema parity, determinism,
    a strong oracle, and histories that actually reflect the drifting
    taste (newest item much more informative about the label-taste than
    the oldest — the filtering problem the aux loss supervises)."""
    from sparrowrecsys_tpu.data.synthetic import drift_ctr_with_oracle

    from sparrowrecsys_tpu.ops.metrics import exact_auc

    N, T = 20000, 8
    ds, logit = drift_ctr_with_oracle(N, seed=3, t=T, drift_rho=0.8)
    assert set(f"userRatedMovie{k}" for k in range(1, T + 1)) <= set(
        ds.features
    )
    assert ds.labels.shape == (N,) and logit.shape == (N,)
    ds2, logit2 = drift_ctr_with_oracle(N, seed=3, t=T, drift_rho=0.8)
    np.testing.assert_array_equal(logit, logit2)

    o = exact_auc(1 / (1 + np.exp(-logit)), ds.labels)["roc_auc"]
    assert o > 0.75, o

    # Newest history item correlates with the terminal taste far more
    # than the oldest: score candidates by item-embedding compatibility
    # with each observed item under the generator's planted matrices.
    rng = np.random.default_rng(3)
    e = rng.normal(size=(1001, 8)).astype(np.float32)
    b = rng.normal(size=(1001, 8)).astype(np.float32)
    cand = ds.features["movieId"]
    newest = ds.features["userRatedMovie1"]
    oldest = ds.features[f"userRatedMovie{T}"]
    s_new = np.einsum("nd,nd->n", e[newest], b[cand])
    s_old = np.einsum("nd,nd->n", e[oldest], b[cand])
    auc_new = exact_auc(s_new, ds.labels)["roc_auc"]
    auc_old = exact_auc(s_old, ds.labels)["roc_auc"]
    assert auc_new > auc_old + 0.02, (auc_new, auc_old)
    assert auc_new > 0.55, auc_new
