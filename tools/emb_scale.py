"""Embedding pretraining (item2vec + DeepWalk) at 20M-event scale (VERDICT r2 #5).

The `tools/als_scale.py` treatment for the embedding plane: run the
whole `Embedding.scala` path — sequence building (Embedding.scala:34-63),
skip-gram pair extraction, SGNS training (:128-167), transition graph +
random walks + graph embedding (:225-311) — on the planted low-rank
synthetic at MovieLens-20M shape (138k users / 27k movies / 20M events),
and record every stage's wall time + the device pairs/s.

Quality sanity: the generator's item latent factors are reconstructable
(same seed), so "are the learned neighborhoods real?" is measured as the
mean planted-latent cosine of each item's top-10 SGNS neighbors vs a
random-pair baseline — the scalable analogue of the findSynonyms("158")
eyeball check (Embedding.scala:139-142).

    python tools/emb_scale.py [--events 20000000] [--epochs 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def planted_item_latents(spec) -> np.ndarray:
    """Replay synthetic_ratings' RNG stream far enough to recover vf."""
    rng = np.random.default_rng(spec.seed)
    rng.normal(size=(spec.n_users, spec.latent_dim))  # uf (discard)
    return rng.normal(size=(spec.n_movies, spec.latent_dim)).astype(np.float32)


def neighbor_quality(
    vocab_ids: np.ndarray, emb: np.ndarray, vf: np.ndarray,
    n_queries: int = 256, k: int = 10, seed: int = 0,
) -> dict:
    """Mean planted cosine(query, neighbor) over learned top-k neighbors,
    vs the random-pair baseline. vocab_ids are 1-based movie ids."""
    from sparrowrecsys_tpu.ops.topk import cosine_topk

    rng = np.random.default_rng(seed)
    q = rng.choice(len(vocab_ids), size=min(n_queries, len(vocab_ids)),
                   replace=False)
    _, idx = cosine_topk(emb[q], emb, k + 1)
    idx = np.asarray(idx)
    vfn = vf / np.maximum(np.linalg.norm(vf, axis=1, keepdims=True), 1e-9)
    lat = vfn[vocab_ids - 1]  # planted latent per vocab row
    sims = []
    for row, qi in zip(idx, q):
        nbrs = [i for i in row if i != qi][:k]
        sims.append(float(np.mean(lat[nbrs] @ lat[qi])))
    rand = lat[rng.choice(len(lat), 4096)] * lat[rng.choice(len(lat), 4096)]
    return {
        "neighbor_planted_cos": round(float(np.mean(sims)), 4),
        "random_pair_cos": round(float(rand.sum(axis=1).mean()), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--users", type=int, default=138_000)
    ap.add_argument("--movies", type=int, default=27_000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=65536)
    ap.add_argument("--skip-deepwalk", action="store_true")
    ap.add_argument("--skip-item2vec", action="store_true")
    ap.add_argument(
        "--walks", type=int, default=20000,
        help="DeepWalk sample_count. 20000 is reference parity "
        "(Embedding.scala:305) but statistically underpowered at a "
        "27k-item catalog (~7 walk tokens per item); scale it to show "
        "the on-device walker's throughput and quality at coverage.",
    )
    ap.add_argument("--json-out", default="/tmp/emb_scale.json")
    args = ap.parse_args()

    import jax

    from sparrowrecsys_tpu.data.synthetic import SyntheticSpec, synthetic_ratings
    from sparrowrecsys_tpu.embedding.deepwalk import (
        DeepWalkConfig, random_walks_csr, transition_csr,
    )
    from sparrowrecsys_tpu.embedding.item2vec import (
        Item2VecConfig, build_item_sequences, skipgram_pairs, train_sgns,
    )
    from sparrowrecsys_tpu.training.loop import hard_sync

    spec = SyntheticSpec(args.users, args.movies, args.events)
    out = {"events": args.events, "backend": jax.devices()[0].platform,
           "epochs": args.epochs, "batch_size": args.batch_size}
    t0 = time.perf_counter()
    ratings = synthetic_ratings(spec)
    out["gen_s"] = round(time.perf_counter() - t0, 1)
    print(f"generated {len(ratings)} events in {out['gen_s']}s", flush=True)

    # ---- item2vec ------------------------------------------------------
    t0 = time.perf_counter()
    seqs = build_item_sequences(ratings)
    out["seq_s"] = round(time.perf_counter() - t0, 1)
    out["n_sequences"] = len(seqs)
    out["n_positive_events"] = int(sum(len(s) for s in seqs))
    print(f"sequences: {len(seqs)} users / {out['n_positive_events']} "
          f"positives in {out['seq_s']}s", flush=True)

    cfg = Item2VecConfig(epochs=args.epochs, batch_size=args.batch_size)
    vf = planted_item_latents(spec)
    if not args.skip_item2vec:
        t0 = time.perf_counter()
        centers, contexts, vocab_ids, counts = skipgram_pairs(seqs, cfg.window)
        out["pairs_s"] = round(time.perf_counter() - t0, 1)
        out["n_pairs"] = int(len(centers))
        out["vocab"] = int(len(vocab_ids))
        print(f"pairs: {out['n_pairs']} over vocab {out['vocab']} in "
              f"{out['pairs_s']}s", flush=True)

        t0 = time.perf_counter()
        emb = train_sgns(centers, contexts, len(vocab_ids), counts, cfg,
                         verbose=True)
        hard_sync(emb)
        out["sgns_s"] = round(time.perf_counter() - t0, 1)
        out["sgns_pairs_per_sec"] = round(
            args.epochs * out["n_pairs"] / out["sgns_s"], 0
        )
        print(f"SGNS: {args.epochs} epochs in {out['sgns_s']}s = "
              f"{out['sgns_pairs_per_sec']/1e6:.2f}M pairs/s", flush=True)

        out["item2vec_quality"] = neighbor_quality(vocab_ids, emb, vf)
        out["item2vec_total_s"] = round(
            out["seq_s"] + out["pairs_s"] + out["sgns_s"], 1
        )
        print("item2vec quality:", out["item2vec_quality"], flush=True)

    # ---- DeepWalk ------------------------------------------------------
    if not args.skip_deepwalk:
        t0 = time.perf_counter()
        csr = transition_csr(seqs)
        out["csr_s"] = round(time.perf_counter() - t0, 1)
        out["n_edges"] = int(len(csr.dst))
        out["walks"] = args.walks
        dw = DeepWalkConfig(sample_count=args.walks, item2vec=cfg)
        t0 = time.perf_counter()
        walks = random_walks_csr(csr, dw)
        out["walks_s"] = round(time.perf_counter() - t0, 1)
        print(f"graph: {out['n_edges']} edges ({out['csr_s']}s); "
              f"{len(walks)} walks in {out['walks_s']}s", flush=True)
        t0 = time.perf_counter()
        wc, wx, w_vocab, w_counts = skipgram_pairs(walks, cfg.window)
        w_emb = train_sgns(wc, wx, len(w_vocab), w_counts, cfg)
        hard_sync(w_emb)
        out["walk_sgns_s"] = round(time.perf_counter() - t0, 1)
        out["deepwalk_quality"] = neighbor_quality(w_vocab, w_emb, vf)
        print("deepwalk quality:", out["deepwalk_quality"], flush=True)

    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
