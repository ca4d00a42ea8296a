"""CLI: embedding pretraining job — the `Embedding.main` equivalent
(`offline/spark/embedding/Embedding.scala:313-334`).

    python -m sparrowrecsys_tpu.embedding.run [--graph-emb] [--user-emb]

Trains item2vec over watch sequences, writes `item2vecEmb.csv` in the
reference `id:vec` format, prints the findSynonyms("158", 20) demo and the
LSH bucket demo; optional DeepWalk (`itemGraphEmb.csv`) and user embeddings
(`userEmb.csv`). The Scala main leaves graphEmb/userEmb commented out while
the PySpark mirror runs them — both are flags here.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--ratings", default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--graph-emb", action="store_true")
    ap.add_argument("--user-emb", action="store_true")
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args()

    from sparrowrecsys_tpu.config import DataConfig
    from sparrowrecsys_tpu.data.movielens import load_ratings
    from sparrowrecsys_tpu.embedding.artifacts import write_embeddings_csv
    from sparrowrecsys_tpu.embedding.deepwalk import DeepWalkConfig, train_deepwalk
    from sparrowrecsys_tpu.embedding.item2vec import (
        Item2VecConfig,
        find_synonyms,
        train_item2vec,
    )
    from sparrowrecsys_tpu.embedding.lsh import LSHIndex
    from sparrowrecsys_tpu.embedding.user_emb import generate_user_emb

    data = DataConfig() if args.data_root is None else DataConfig(data_root=args.data_root)
    ratings_path = args.ratings or data.path(data.ratings_csv)
    out_dir = args.out_dir or os.path.join(data.data_root, "modeldata")
    ratings = load_ratings(ratings_path)
    print(f"ratings: {len(ratings)} events")

    cfg = Item2VecConfig(epochs=args.epochs)
    vocab, emb = train_item2vec(ratings, cfg)
    print(f"item2vec: {len(vocab)} items x {emb.shape[1]}d")
    write_embeddings_csv(os.path.join(out_dir, "item2vecEmb.csv"), vocab, emb)

    # findSynonyms demo (Embedding.scala:139-142).
    demo_id = 158 if 158 in set(vocab.tolist()) else int(vocab[0])
    for mid, score in find_synonyms(vocab, emb, demo_id, 20):
        print(f"{mid} {score:.4f}")

    # LSH demo (Embedding.scala:274-296).
    index = LSHIndex(emb, vocab)
    print("sampleEmb bucket ids:", index.buckets[0].tolist())
    print("approx NN of", demo_id, index.query(emb[vocab == demo_id][0], k=5))

    if args.graph_emb:
        gv, gemb = train_deepwalk(ratings, DeepWalkConfig())
        write_embeddings_csv(os.path.join(out_dir, "itemGraphEmb.csv"), gv, gemb)
        print(f"deepwalk: {len(gv)} items")

    if args.user_emb:
        uids, uemb = generate_user_emb(ratings, vocab, emb)
        write_embeddings_csv(os.path.join(out_dir, "userEmb.csv"), uids, uemb)
        print(f"userEmb: {len(uids)} users")


if __name__ == "__main__":
    main()
