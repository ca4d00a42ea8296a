"""Tests for the embedding pretraining plane."""

import numpy as np
import pytest

from sparrowrecsys_tpu.data.movielens import Ratings
from sparrowrecsys_tpu.embedding.artifacts import (
    load_embeddings_csv,
    write_embeddings_csv,
)
from sparrowrecsys_tpu.embedding.deepwalk import (
    DeepWalkConfig,
    random_walks,
    transition_matrix,
)
from sparrowrecsys_tpu.embedding.item2vec import (
    Item2VecConfig,
    build_item_sequences,
    find_synonyms,
    skipgram_pairs,
    train_item2vec,
)
from sparrowrecsys_tpu.embedding.lsh import LSHIndex
from sparrowrecsys_tpu.embedding.user_emb import generate_user_emb


def make_ratings(events):
    u, m, r, t = zip(*events)
    return Ratings(
        np.array(u, np.int32), np.array(m, np.int32),
        np.array(r, np.float32), np.array(t, np.int64),
    )


def clustered_ratings(n_users=200, seed=0):
    """Two disjoint item clusters; users watch within one cluster.
    Item2vec must place same-cluster items closer than cross-cluster."""
    rng = np.random.default_rng(seed)
    events = []
    for u in range(1, n_users + 1):
        cluster = u % 2
        items = rng.choice(np.arange(10) + 1 + cluster * 10, size=6, replace=False)
        for i, it in enumerate(items):
            events.append((u, int(it), 5.0, 1000 + i))
    return make_ratings(events)


class TestSequences:
    def test_build_sequences_filters_and_sorts(self):
        r = make_ratings([
            (1, 10, 5.0, 3), (1, 11, 2.0, 1), (1, 12, 4.0, 2), (1, 13, 3.5, 1),
            (2, 20, 5.0, 1),  # singleton -> dropped
        ])
        seqs = build_item_sequences(r)
        assert len(seqs) == 1
        assert seqs[0].tolist() == [13, 12, 10]  # rating>=3.5, by timestamp

    def test_skipgram_pairs_window(self):
        seqs = [np.array([1, 2, 3])]
        c, x, vocab, counts = skipgram_pairs(seqs, window=1)
        pairs = set(zip(vocab[c].tolist(), vocab[x].tolist()))
        assert pairs == {(1, 2), (2, 1), (2, 3), (3, 2)}
        assert counts.sum() == 3


class TestItem2Vec:
    def test_cluster_structure_learned(self):
        ratings = clustered_ratings()
        cfg = Item2VecConfig(
            epochs=10, batch_size=1024, learning_rate=0.05, seed=1
        )
        vocab, emb = train_item2vec(ratings, cfg)
        assert emb.shape == (20, 10)
        # For every item, the 5 nearest neighbours should be same-cluster.
        ok = 0
        for v in vocab[:10]:
            syn = find_synonyms(vocab, emb, int(v), 5)
            ok += sum(1 for mid, _ in syn if (mid - 1) // 10 == (int(v) - 1) // 10)
        assert ok >= 45, ok

    def test_alias_table_distribution_exact(self):
        from sparrowrecsys_tpu.embedding.item2vec import (
            _alias_draw, build_alias_table,
        )

        rng = np.random.default_rng(0)
        p = (rng.random(37) + 0.05) ** 0.75
        prob, alias = build_alias_table(p)
        # Exact reconstruction: each cell contributes prob[i] to i and
        # (1 - prob[i]) to alias[i]; the mixture must equal p/p.sum().
        recon = np.zeros(37)
        for i in range(37):
            recon[i] += prob[i]
            recon[alias[i]] += 1.0 - prob[i]
        np.testing.assert_allclose(recon / 37, p / p.sum(), atol=1e-6)

        import jax

        from sparrowrecsys_tpu.embedding.item2vec import pack_alias

        draws = np.asarray(
            _alias_draw(pack_alias(prob, alias),
                        jax.random.PRNGKey(0), (200_000,))
        )
        emp = np.bincount(draws, minlength=37) / len(draws)
        np.testing.assert_allclose(emp, p / p.sum(), atol=5e-3)



class TestDeepWalk:
    def test_transition_matrix_probs(self):
        seqs = [np.array([1, 2, 1, 3])]
        vocab, trans, dist = transition_matrix(seqs)
        assert vocab.tolist() == [1, 2, 3]
        np.testing.assert_allclose(trans[0], [0, 0.5, 0.5])  # 1->2, 1->3
        np.testing.assert_allclose(trans[1], [1, 0, 0])      # 2->1
        assert dist[2] == 0  # 3 has no outgoing edges

    def test_walks_respect_graph(self):
        seqs = [np.array([1, 2]), np.array([2, 3]), np.array([3, 1])]
        cfg = DeepWalkConfig(sample_count=64, sample_length=5, seed=0)
        vocab, walks = random_walks(seqs, cfg)
        allowed = {(1, 2), (2, 3), (3, 1)}
        for w in walks:
            for a, b in zip(w[:-1], w[1:]):
                assert (int(a), int(b)) in allowed

    def test_dead_end_truncates(self):
        seqs = [np.array([1, 2])]  # 2 is a dead end
        cfg = DeepWalkConfig(sample_count=16, sample_length=6, seed=0)
        _, walks = random_walks(seqs, cfg)
        for w in walks:
            assert len(w) <= 2

    def test_csr_matches_dense_probabilities(self):
        from sparrowrecsys_tpu.embedding.deepwalk import (
            transition_csr, transition_matrix,
        )

        rng = np.random.default_rng(3)
        seqs = [rng.integers(1, 12, rng.integers(2, 9)) for _ in range(40)]
        vocab, trans, dist = transition_matrix(seqs)
        csr = transition_csr(seqs)
        np.testing.assert_array_equal(csr.vocab_ids, vocab)
        np.testing.assert_allclose(csr.item_dist, dist, atol=1e-6)
        v = len(vocab)
        dense_from_csr = np.zeros((v, v), np.float64)
        for i in range(v):
            lo, hi = csr.rowptr[i], csr.rowptr[i + 1]
            prev = 0.0
            for e in range(lo, hi):
                dense_from_csr[i, csr.dst[e]] = csr.cum[e] - prev
                prev = csr.cum[e]
        live = dist > 0  # dense path puts a self-loop on dead rows
        np.testing.assert_allclose(
            dense_from_csr[live], trans[live], atol=1e-5
        )

    def test_csr_walker_respects_graph_and_frequencies(self):
        from sparrowrecsys_tpu.embedding.deepwalk import (
            random_walks_csr, transition_csr,
        )

        # 1 -> 2 three times, 1 -> 3 once; 2/3 -> 1 to keep walks alive.
        seqs = [np.array([1, 2, 1, 2, 1, 2]), np.array([1, 3]),
                np.array([2, 1]), np.array([3, 1])]
        csr = transition_csr(seqs)
        cfg = DeepWalkConfig(sample_count=2000, sample_length=6, seed=0)
        walks = random_walks_csr(csr, cfg)
        allowed = {(1, 2), (1, 3), (2, 1), (3, 1)}
        taken = {2: 0, 3: 0}
        for w in walks:
            for a, b in zip(w[:-1], w[1:]):
                assert (int(a), int(b)) in allowed
                if a == 1:
                    taken[int(b)] += 1
        frac = taken[2] / (taken[2] + taken[3])
        # row 1 has 4 outgoing edges: 1->2 three times, 1->3 once
        assert abs(frac - 0.75) < 0.05, frac

    def test_csr_walker_dead_end_truncates(self):
        from sparrowrecsys_tpu.embedding.deepwalk import (
            random_walks_csr, transition_csr,
        )

        csr = transition_csr([np.array([1, 2])])
        cfg = DeepWalkConfig(sample_count=32, sample_length=6, seed=0)
        for w in random_walks_csr(csr, cfg):
            assert len(w) <= 2

    def test_random_walks_auto_dispatches_to_csr(self, monkeypatch):
        import sparrowrecsys_tpu.embedding.deepwalk as dw

        monkeypatch.setattr(dw, "DENSE_WALK_MAX_VOCAB", 2)
        seqs = [np.array([1, 2]), np.array([2, 3]), np.array([3, 1])]
        cfg = DeepWalkConfig(sample_count=64, sample_length=5, seed=0)
        vocab, walks = dw.random_walks(seqs, cfg)
        allowed = {(1, 2), (2, 3), (3, 1)}
        for w in walks:
            for a, b in zip(w[:-1], w[1:]):
                assert (int(a), int(b)) in allowed



class TestUserEmb:
    def test_mean_aggregation(self):
        r = make_ratings([(1, 10, 5.0, 1), (1, 11, 1.0, 2), (2, 10, 3.0, 1)])
        vocab = np.array([10, 11])
        emb = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
        uids, uemb = generate_user_emb(r, vocab, emb)
        assert uids.tolist() == [1, 2]
        np.testing.assert_allclose(uemb[0], [0.5, 0.5])
        np.testing.assert_allclose(uemb[1], [1.0, 0.0])

    def test_sum_mode_and_missing_items(self):
        r = make_ratings([(1, 10, 5.0, 1), (1, 99, 5.0, 2)])  # 99 unknown
        vocab = np.array([10])
        emb = np.array([[2.0, 2.0]], np.float32)
        uids, uemb = generate_user_emb(r, vocab, emb, mode="sum")
        np.testing.assert_allclose(uemb[0], [2.0, 2.0])


class TestLSH:
    def test_self_is_nearest(self):
        rng = np.random.default_rng(0)
        vecs = rng.normal(size=(50, 10)).astype(np.float32)
        ids = np.arange(100, 150)
        index = LSHIndex(vecs, ids)
        out = index.query(vecs[7], k=3)
        assert out and out[0][0] == 107 and out[0][1] == pytest.approx(0.0)


class TestArtifacts:
    def test_round_trip(self, tmp_path):
        path = str(tmp_path / "emb.csv")
        vecs = np.array([[1.5, -2.0], [0.0, 3.25]], np.float32)
        write_embeddings_csv(path, [7, 9], vecs)
        loaded = load_embeddings_csv(path)
        np.testing.assert_allclose(loaded[7], vecs[0])
        np.testing.assert_allclose(loaded[9], vecs[1])


class TestTopK:
    def test_cosine_topk_exact(self):
        from sparrowrecsys_tpu.ops.topk import cosine_topk

        items = np.eye(4, dtype=np.float32)
        q = np.array([[1.0, 0.1, 0.0, 0.0]], np.float32)
        scores, idx = cosine_topk(q, items, 2)
        assert np.asarray(idx)[0, 0] == 0 and np.asarray(idx)[0, 1] == 1

    def test_approx_topk_recall_and_auto_dispatch(self):
        """cosine_topk_approx must agree with exact top-k at high recall
        (on CPU approx_max_k reduces to exact; the TPU realized-recall
        measurement lives in tools/topk_bench.py -> KERNELS.md), and the
        auto dispatcher stays exact below APPROX_TOPK_MIN_ITEMS."""
        from sparrowrecsys_tpu.ops.topk import (
            cosine_topk,
            cosine_topk_approx,
            cosine_topk_auto,
        )

        rng = np.random.default_rng(1)
        items = rng.normal(size=(4096, 16)).astype(np.float32)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        s_e, i_e = cosine_topk(q, items, 10)
        s_a, i_a = cosine_topk_approx(q, items, 10)
        rec = np.mean(
            [
                len(set(a.tolist()) & set(e.tolist())) / 10
                for a, e in zip(np.asarray(i_a), np.asarray(i_e))
            ]
        )
        assert rec >= 0.9, rec
        s_auto, i_auto = cosine_topk_auto(q, items, 10)
        np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i_e))

    def test_prepared_catalog_matches_unprepared(self):
        """fp32 `prepare_catalog` + `cosine_topk_prepared` must reproduce
        the unprepared path exactly (same normalize expression, same
        dispatch); the bf16 residency win is TPU-measured in
        tools/topk_bf16_exp.py -> KERNELS.md."""
        from sparrowrecsys_tpu.ops.topk import (
            cosine_topk,
            cosine_topk_prepared,
            prepare_catalog,
        )

        rng = np.random.default_rng(3)
        items = rng.normal(size=(2048, 16)).astype(np.float32)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        prepared = prepare_catalog(items)
        assert prepared.dtype == np.float32  # below bf16 threshold / CPU
        s_p, i_p = cosine_topk_prepared(q, prepared, 10)
        s_e, i_e = cosine_topk(q, items, 10)
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_e))
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_e), atol=1e-6)

    def test_prepared_catalog_bf16_override(self):
        """Explicit bf16 preparation keeps fp32 scores and high agreement
        with the exact fp32 ranking."""
        import jax.numpy as jnp
        from sparrowrecsys_tpu.ops.topk import (
            cosine_topk,
            cosine_topk_prepared,
            prepare_catalog,
        )

        rng = np.random.default_rng(4)
        items = rng.normal(size=(2048, 16)).astype(np.float32)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        prepared = prepare_catalog(items, dtype=jnp.bfloat16)
        assert prepared.dtype == jnp.bfloat16
        s_p, i_p = cosine_topk_prepared(q, prepared, 10)
        assert np.asarray(s_p).dtype == np.float32
        _, i_e = cosine_topk(q, items, 10)
        rec = np.mean(
            [
                len(set(a.tolist()) & set(e.tolist())) / 10
                for a, e in zip(np.asarray(i_p), np.asarray(i_e))
            ]
        )
        assert rec >= 0.8, rec

    def test_sharded_matches_dense(self):
        import jax
        from jax.sharding import Mesh
        from sparrowrecsys_tpu.ops.topk import cosine_topk, sharded_cosine_topk

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
        rng = np.random.default_rng(0)
        items = rng.normal(size=(1003, 16)).astype(np.float32)
        q = rng.normal(size=(5, 16)).astype(np.float32)
        s1, i1 = cosine_topk(q, items, 7)
        s2, i2 = sharded_cosine_topk(q, items, 7, mesh)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        # prepared (fp32) catalog shards identically: row normalization is
        # row-local, so prepare-then-shard == shard-then-normalize.
        from sparrowrecsys_tpu.ops.topk import prepare_catalog

        s3, i3 = sharded_cosine_topk(
            q, prepare_catalog(items), 7, mesh, prepared=True
        )
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s3), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))
