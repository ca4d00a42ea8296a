"""Headline benchmark: DeepFM training throughput (examples/sec/chip).

BASELINE.json metric: "CTR examples/sec/chip (DeepFM); AUC parity;
retrieval recall@10 + queries/sec". The reference publishes no numbers
(BASELINE.md), so `vs_baseline` is measured against the reference-
equivalent configuration of THIS framework pinned in `BASELINE_LOCAL`
below (first TPU run's number; kept fixed so later rounds show speedup).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync

#: First HONESTLY-recorded TPU v5e single-chip number (round 1, forced
#: device->host sync — jax.block_until_ready returns early on this
#: backend and earlier recordings measured dispatch, not compute).
#: Update only with a note in BASELINE.md.
BASELINE_LOCAL = 4_161_731.1  # TPU v5e 1-chip, scan-epoch schedule (pre one-hot-VJP)

#: Throughput batch. 8192 was the r1 protocol; post packed-gather the
#: step is op-bound and batch 65536 amortizes it (measured sweep,
#: tools/step_exp4.py: 8192->7.8M, 16384->8.9M, 32768->10.0M,
#: 65536->10.3M ex/s). Production CTR training runs 16-64k batches; the
#: unit string records the batch so the protocol change is explicit.
BATCH = 65536
STEPS = 16
WARMUP = 5


def bench_retrieval(n_items: int = 100_000, n_queries: int = 256, k: int = 10) -> dict:
    """Retrieval queries/sec: cosine top-k over the item matrix via the
    measured auto-dispatch (`ops/topk.py::cosine_topk_auto` — exact
    `lax.top_k` below 100k items, TPU-native `lax.approx_max_k` at/above;
    KERNELS.md: 1.61x at 100k / 6.04x at 1M, realized recall@10 >= 0.994
    vs exact). BASELINE.json's 'retrieval recall@10 + queries/sec'."""
    import jax.numpy as jnp

    from sparrowrecsys_tpu.ops.topk import (
        RESIDENT_BF16_MIN_ITEMS,
        cosine_topk,
        cosine_topk_auto,
        cosine_topk_prepared,
        prepare_catalog,
        topk_dispatch,
    )

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(n_items, 64)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(n_queries, 64)).astype(np.float32))
    # At resident scale a serving deployment prepares the catalog once
    # (row-normalize + bf16; measured 1.72x at 10M items, KERNELS.md);
    # below the threshold keep the unprepared protocol so the number
    # stays comparable with the r1/r2 100k-item rows.
    resident = n_items >= RESIDENT_BF16_MIN_ITEMS
    if resident:
        catalog = prepare_catalog(items)
        search = lambda: cosine_topk_prepared(queries, catalog, k)  # noqa: E731
    else:
        search = lambda: cosine_topk_auto(queries, items, k)  # noqa: E731
    s, i = search()  # compile
    hard_sync(s)
    iters = 50
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, i = search()
        hard_sync(s)
        best_dt = min(best_dt, time.perf_counter() - t0)
    # Realized search recall of the dispatched kernel vs exact on the
    # same data (1.0 when the dispatcher picked exact).
    _, i_exact = cosine_topk(queries, items, k)
    ia, ie = np.asarray(i), np.asarray(i_exact)
    search_recall = float(
        np.mean([len(set(a) & set(e)) / k for a, e in zip(ia, ie)])
    )
    mode = topk_dispatch(n_items)  # same rule the searcher applied
    if resident:
        mode += f" on a prepared {catalog.dtype} catalog"
    out = {
        "metric": "retrieval_topk_queries_per_sec",
        "value": round(n_queries * iters / best_dt, 1),
        "unit": f"queries/s (k={k}, {n_items} items; {mode} search, "
        f"recall@{k}={search_recall:.4f} vs exact)",
        "vs_baseline": 1.0,
    }
    # Carry the honest LEARNED-retrieval quality next to the q/s so the
    # bench doesn't imply search recall means quality (VERDICT r1 weak-#7):
    # brute-force search recall is ~1.0 by construction; the learned two-tower
    # number comes from recall.json (tools/recall_eval.py, leave-one-out).
    try:
        with open("recall.json") as f:
            rj = json.load(f)
        out["learned_recall_at_k"] = {
            "two_tower_retrieval": round(rj["two_tower_retrieval"], 4),
            "popularity_floor": round(rj["popularity"], 4),
            "protocol": rj.get("protocol", ""),
        }
    except Exception:
        pass
    return out


def bench_serving() -> dict:
    """End-to-end HTTP serving throughput on /getrecforyou?model=emb —
    the reference's hot path (800-candidate ranking per request,
    RecForYouProcess.java:30-99) through the asyncio keep-alive server,
    micro-batched cosine ranking, load driven OUT-OF-PROCESS
    (tools/http_load.py) so the generator doesn't share the server GIL."""
    import os
    import urllib.request

    from sparrowrecsys_tpu.config import ServingConfig
    from sparrowrecsys_tpu.serving.catalog import DataManager
    from sparrowrecsys_tpu.serving.server import RecSysServer
    from tools.http_load import run_load

    dm = DataManager().load_data(
        "data/movies.csv", "data/links.csv", "data/ratings.csv",
        "data/modeldata/item2vecEmb.csv", "data/modeldata/userEmb.csv",
    )
    os.environ["PORT"] = "0"
    server = RecSysServer(dm, ServingConfig(port=0))
    server.start()
    uids = [int(u) for u in dm.user_emb_ids[:64]]
    base = f"http://127.0.0.1:{server.port}"
    # Warm (compile the cosine scorer). On the TPU backend the first
    # request triggers a remote compile that can take minutes through the
    # axon tunnel (CLAUDE.md), so the warmup timeout must be generous and
    # a socket timeout here means "still compiling", not "dead" — retry.
    for uid in uids[:3]:
        for attempt in range(3):
            try:
                urllib.request.urlopen(
                    f"{base}/getrecforyou?id={uid}&size=32&model=emb",
                    timeout=600,
                ).read()
                break
            except TimeoutError:
                if attempt == 2:
                    raise
    res = run_load(
        f"{base}/getrecforyou?id={{id}}&size=32&model=emb",
        procs=4, conns=8, seconds=5.0, ids=uids,
    )
    server.stop()
    return {
        "metric": "serving_recforyou_requests_per_sec",
        "value": res["rps"],
        "unit": "req/s (800-candidate emb ranking, keep-alive HTTP)",
        "vs_baseline": round(res["rps"] / 73.0, 2),
        "errors": res["errors"],
        "p50_ms": res.get("p50_ms"),
        "p99_ms": res.get("p99_ms"),
    }


def bench_mfu(dim: int = 128, hidden: int = 1024, batch: int = 262144,
              user_vocab: int = 1 << 20, movie_vocab: int = 1 << 17) -> dict:
    """Production-shape MFU row (VERDICT r4 #5): the tools/mfu_demo.py
    protocol — EmbeddingMLP at dim 128 / 1024-wide bf16 towers / 2^20-row
    user table / block shuffle — through the REAL resident-epoch path, so
    the driver artifact records the MXU-bound headline (TFLOP/s, % of
    v5e bf16 peak) alongside the dispatch-floor ex/s rows."""
    from tools.mfu_demo import (
        STEPS as MSTEPS,
        V5E_BF16_PEAK,
        gen_epoch,
        measure_epoch,
        train_flops_per_example,
    )

    n = batch * MSTEPS
    data, labels = gen_epoch(n, user_vocab, movie_vocab)(jax.random.PRNGKey(0))
    model = build_model(
        "embedding_mlp", dim=dim, hidden=hidden, compute_dtype="bfloat16",
        user_buckets=user_vocab, movie_buckets=movie_vocab,
        # bf16 cast-before-gather: quality-neutral (A/B at 3 Zipf seeds,
        # BASELINE.md bf16-lookup section), −1.3 ms at this shape.
        lookup_dtype="bfloat16",
    )
    trainer = Trainer(
        model,
        TrainConfig(batch_size=batch, epochs=1, shuffle_mode="blocks"),
    )
    trainer._build_steps()
    secs = measure_epoch(trainer, data, labels, n, batch)
    flops_ex = train_flops_per_example(dim, hidden)
    tflops = flops_ex * n / secs / 1e12
    return {
        "ms_per_step": round(secs / MSTEPS * 1e3, 2),
        "ex_per_sec_M": round(n / secs / 1e6, 2),
        "tflops": round(tflops, 1),
        "mfu_pct_v5e_bf16_peak": round(tflops / (V5E_BF16_PEAK / 1e12) * 100, 1),
        "config": f"embedding_mlp dim{dim} hidden{hidden} batch{batch} "
        f"bf16 {user_vocab}-row user table, blocks shuffle, bf16 lookup "
        "(tools/mfu_demo.py protocol)",
    }


def bench_scaling() -> dict:
    from sparrowrecsys_tpu.parallel.scaling import measure_scaling

    n = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8) if c <= n]
    points = measure_scaling(counts, per_device_batch=4096, steps=30)
    last = points[-1]
    dev0 = jax.devices()[0].platform
    note = (
        "virtual CPU devices timeshare physical cores: aggregate is capped "
        "at the n=1 value and 1/n per-device efficiency is the expected "
        "ceiling (see BASELINE.md scaling section)"
        if dev0 == "cpu"
        else ""
    )
    return {
        "metric": "deepfm_scaling_efficiency",
        "value": round(last.efficiency, 3),
        "unit": f"fraction at {last.n_devices} {dev0} devices",
        "vs_baseline": 1.0,
        "points": [
            {"n": p.n_devices, "eps": round(p.examples_per_sec, 1)} for p in points
        ],
        "note": note,
    }


def main() -> None:
    import sys

    if "--retrieval" in sys.argv:
        # optional catalog size: bench.py --retrieval 10000000
        # (only the IMMEDIATELY following token counts — ADVICE r2 #2)
        idx = sys.argv.index("--retrieval")
        nxt = sys.argv[idx + 1] if idx + 1 < len(sys.argv) else ""
        n_items = int(nxt) if nxt.isdigit() else 100_000
        print(json.dumps(bench_retrieval(n_items=n_items)))
        return
    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
        return
    if "--serving" in sys.argv:
        print(json.dumps(bench_serving()))
        return
    if "--mfu" in sys.argv:
        # standalone MFU row; optional "dim,hidden,batch" override for
        # smoke tests: bench.py --mfu 16,64,1024
        idx = sys.argv.index("--mfu")
        nxt = sys.argv[idx + 1] if idx + 1 < len(sys.argv) else ""
        kw = {}
        if "," in nxt:
            d, h, b = (int(x) for x in nxt.split(","))
            kw = dict(dim=d, hidden=h, batch=b,
                      user_vocab=1 << 16, movie_vocab=1 << 12)
        print(json.dumps(bench_mfu(**kw)))
        return
    import jax.numpy as jnp

    from sparrowrecsys_tpu.ops import metrics as M

    n_chips = max(1, len(jax.devices()))

    # Generate the synthetic epoch ON DEVICE: uploading host-generated
    # columns is ~110 MB at this n — minutes over the remote tunnel —
    # while a PRNG key is bytes. (Same shapes/distributions as
    # __graft_entry__._example_features.)
    def make_gen_epoch(n):
        @jax.jit
        def gen_epoch(key):
            ks = jax.random.split(key, 4)
            f = {
                "movieId": jax.random.randint(ks[0], (n,), 1, 1001, dtype=jnp.int32),
                "userId": jax.random.randint(ks[1], (n,), 1, 30001, dtype=jnp.int32),
            }
            hk = jax.random.split(ks[2], 13)
            for i, c in enumerate(
                ("userRatedMovie1", "userRatedMovie2", "userRatedMovie3",
                 "userRatedMovie4", "userRatedMovie5")
            ):
                f[c] = jax.random.randint(hk[i], (n,), 0, 1001, dtype=jnp.int32)
            for i, c in enumerate(
                ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
                 "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3")
            ):
                f[c] = jax.random.randint(hk[5 + i], (n,), -1, 19, dtype=jnp.int32)
            nk = jax.random.split(ks[3], 8)
            for i, c in enumerate(
                ("releaseYear", "movieRatingCount", "movieAvgRating",
                 "movieRatingStddev", "userRatingCount", "userAvgRating",
                 "userRatingStddev")
            ):
                f[c] = jax.random.normal(nk[i], (n,), jnp.float32)
            labels = (jax.random.uniform(nk[7], (n,)) > 0.5).astype(jnp.float32)
            return f, labels

        return gen_epoch

    def measure(batch: int, steps: int) -> float:
        """Best-of-8 forced-sync epochs at the given batch; ex/s/chip."""
        n = batch * steps  # examples per epoch (one scan dispatch)
        data, labels_d = make_gen_epoch(n)(jax.random.PRNGKey(0))
        # Init sample built host-side: the shapes/dtypes are statically
        # known, and 22 eager v[:2] slices + transfers would cost ~10 s of
        # tunnel round-trips (~0.4 s per eager primitive on this backend).
        sample_host = {
            k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
            for k, v in data.items()
        }
        trainer = Trainer(
            build_model("deepfm"), TrainConfig(batch_size=batch, epochs=1)
        )
        trainer._build_steps()
        params = trainer.init_params(sample_host)
        opt_state = trainer.tx.init(params)
        mstate = M.init_metrics()

        # Production schedule: the whole epoch is ONE scan dispatch with
        # device-resident data (training.loop's fit path). Epoch 0 pays
        # compile; best-of-8 steady epochs is the recorded number.
        params, opt_state, mstate = trainer._train_epoch(
            params, opt_state, mstate, data, labels_d,
            jax.random.PRNGKey(0), n=n, batch_size=batch, shuffle=True,
        )
        hard_sync(params)  # block_until_ready returns early on this backend
        # Best-of-8 spread over ~30 s: the axon tunnel has multi-minute
        # slow phases (up to ~4x, CLAUDE.md) — back-to-back repeats all
        # land in the same phase, so space the samples to give the best-of
        # a chance to catch a clean window. Each epoch is <1 s of device
        # time; the sleeps dominate the added wall cost.
        best_dt = float("inf")
        for it in range(8):
            t0 = time.perf_counter()
            params, opt_state, mstate = trainer._train_epoch(
                params, opt_state, mstate, data, labels_d,
                jax.random.PRNGKey(10 + it), n=n, batch_size=batch,
                shuffle=True,
            )
            hard_sync(params)
            best_dt = min(best_dt, time.perf_counter() - t0)
            if it < 7:
                time.sleep(4.0)
        return n / best_dt / n_chips

    # Both protocol rows (VERDICT r2 #6): batch 8192 is the r1 protocol —
    # vs_baseline is computed LIKE-FOR-LIKE against the pinned r1 number at
    # the same batch; batch 65536 is the production headline config.
    eps_8192 = measure(8192, 64)
    eps_65536 = measure(BATCH, STEPS)
    row = {
        "metric": "deepfm_train_examples_per_sec_per_chip",
        "value": round(eps_65536, 1),
        "unit": f"examples/s/chip (batch {BATCH}; vs_baseline is "
        "like-for-like batch 8192 vs the pinned r1 number)",
        "vs_baseline": round(eps_8192 / BASELINE_LOCAL, 3),
        "batch_8192": round(eps_8192, 1),
        "batch_65536": round(eps_65536, 1),
        "vs_baseline_batch_65536": round(eps_65536 / BASELINE_LOCAL, 3),
    }
    # MFU headline rides the same (single) JSON line so the driver's
    # parse stays intact while BENCH_rNN.json captures both the
    # dispatch-floor ex/s AND the MXU-bound TFLOP/s (VERDICT r4 #5).
    try:
        row["mfu"] = bench_mfu()
    except Exception as e:  # never lose the legacy row to an MFU failure
        row["mfu_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(row))


if __name__ == "__main__":
    main()
