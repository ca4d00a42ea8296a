"""Recall + rank pipelines — `SimilarMovieProcess` / `RecForYouProcess`.

Call-stack parity (SURVEY.md §3.2/§3.3):

similar_movie_rec (SimilarMovieProcess.java:23-36):
  candidate_generator (48-59: union of per-genre top-100-by-rating, self
  removed) -> ranker (149-168: "emb" -> item-item cosine, default ->
  0.7*genre + 0.3*rating) -> truncate.

rec_for_you (RecForYouProcess.java:30-64):
  top-800-by-rating candidates -> ranker (73-99: "emb" -> user-movie
  cosine; "neuralcf"/"nerualcf" -> ModelScorer (the TF-Serving
  replacement); default -> preserve candidate order).

Also implemented for inventory parity: `multiple_retrieval_candidates`
(70-100) and `retrieval_candidates_by_embedding` (113-135 — NOTE the
reference sorts ascending there, returning the LEAST similar movies; a
bug since that path is never called from a service. We sort descending
and record the divergence).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from sparrowrecsys_tpu.serving.catalog import DataManager, Movie, User
from sparrowrecsys_tpu.serving.rankers import (
    ModelScorer,
    rank_by_embedding,
    similar_score,
)

CANDIDATE_SIZE = 800  # RecForYouProcess.java:35


class SimilarMovieProcess:
    def __init__(self, dm: DataManager):
        self.dm = dm

    def get_rec_list(self, movie_id: int, size: int, model: str) -> List[Movie]:
        movie = self.dm.get_movie_by_id(movie_id)
        if movie is None:
            return []
        candidates = self.candidate_generator(movie)
        ranked = self.ranker(movie, candidates, model)
        return ranked[:size]

    def candidate_generator(self, movie: Movie) -> List[Movie]:
        seen: Dict[int, Movie] = {}
        for genre in movie.genres:
            try:
                for c in self.dm.get_movies_by_genre(genre, 100, "rating"):
                    seen[c.movie_id] = c
            except KeyError:
                continue
        seen.pop(movie.movie_id, None)
        return list(seen.values())

    def multiple_retrieval_candidates(self, movie: Movie) -> List[Movie]:
        seen: Dict[int, Movie] = {}
        for genre in set(movie.genres):
            try:
                for c in self.dm.get_movies_by_genre(genre, 20, "rating"):
                    seen[c.movie_id] = c
            except KeyError:
                continue
        for c in self.dm.get_movies(100, "rating"):
            seen[c.movie_id] = c
        for c in self.dm.get_movies(100, "releaseYear"):
            seen[c.movie_id] = c
        seen.pop(movie.movie_id, None)
        return list(seen.values())

    def retrieval_candidates_by_embedding(
        self, movie: Movie, size: int
    ) -> Optional[List[Movie]]:
        if movie is None or movie.emb is None:
            return None
        candidates = self.dm.get_movies(10000, "rating")
        ranked = rank_by_embedding(movie.emb, candidates, self.dm)
        return ranked[:size]

    def ranker(self, movie: Movie, candidates: List[Movie], model: str) -> List[Movie]:
        if model == "emb":
            return rank_by_embedding(movie.emb, candidates, self.dm)
        scored = sorted(
            candidates, key=lambda c: similar_score(movie, c), reverse=True
        )
        return scored


class RecForYouProcess:
    def __init__(
        self,
        dm: DataManager,
        scorer: Optional[ModelScorer] = None,
        micro_batch: bool = False,
        batch_wait_ms: float = 2.0,
        scorers: Optional[dict] = None,
        model_batch: Optional[int] = None,
    ):
        self.dm = dm
        self.scorer = scorer  # the TF-Serving-equivalent CTR scorer
        #: Named full-feature scorers beyond the reference's surface:
        #: {"deepfm": ModelScorer(assembler=...), ...} — any zoo model
        #: ranks online via ?model=<name> (serving/assembler.py).
        self.scorers = scorers or {}
        # The top-800 candidate set only changes when the catalog does
        # (read-only after load), so it is computed once — the reference
        # re-sorts the whole catalog per request (RecForYouProcess.java:37).
        self._candidates: Optional[List[Movie]] = None
        self._candidate_matrix = None  # aligned [800, D] embedding rows
        self._candidate_matrix_dev = None  # device-resident copy (jnp)
        # Optional micro-batching: concurrent requests' user embeddings are
        # stacked into ONE [B, 800] cosine dispatch (serving/batcher.py).
        self._batcher = None
        if micro_batch:
            from sparrowrecsys_tpu.serving.batcher import MicroBatcher

            def _score_batch(user_embs: np.ndarray) -> np.ndarray:
                import jax.numpy as jnp

                from sparrowrecsys_tpu.ops.topk import cosine_scores
                from sparrowrecsys_tpu.serving.rankers import _DEVICE_LOCK

                with _DEVICE_LOCK:
                    # Candidate matrix is fixed post-load; keep it device-
                    # resident instead of re-uploading [800, D] per batch
                    # (device_put was ~22% of the measured core path).
                    if self._candidate_matrix_dev is None:
                        _, mat = self._candidate_set()
                        self._candidate_matrix_dev = jnp.asarray(mat)
                    return np.array(
                        cosine_scores(
                            jnp.asarray(user_embs), self._candidate_matrix_dev
                        )
                    )

            self._batcher = MicroBatcher(
                _score_batch, max_batch=64, max_wait_ms=batch_wait_ms
            )
        # Model-path micro-batchers (one per named scorer), created lazily:
        # k concurrent full-feature ranked requests share the fixed top-800
        # candidate list, so they stack into ONE [k*800] model dispatch
        # (ModelScorer.score_many) — per-request dispatch measured 13.4
        # req/s on the remote-attached TPU (one ~75 ms tunnel round trip
        # each, serialized by the device lock).
        self._micro_batch = micro_batch
        self._model_batch_wait_ms = batch_wait_ms
        self._model_batchers: dict = {}
        # Creation lock: two concurrent FIRST requests for the same model
        # must not each construct a MicroBatcher (two parallel wave leaders
        # against one scorer). Steady-state reads stay lock-free — dict
        # reads are atomic and entries are never replaced.
        import threading

        self._model_batchers_lock = threading.Lock()
        if model_batch is not None:
            self.MODEL_BATCH = int(model_batch)

    #: Wave size for the model-path batcher: 8 requests x 800 candidates
    #: pads to one compiled [8192]-row scoring shape (class default;
    #: overridden per-instance by ServingConfig.model_batch).
    MODEL_BATCH = 8

    def _model_batcher(self, name: str):
        batcher = self._model_batchers.get(name)
        if batcher is not None:
            return batcher
        with self._model_batchers_lock:
            if name in self._model_batchers:  # lost the creation race
                return self._model_batchers[name]
            from sparrowrecsys_tpu.serving.batcher import MicroBatcher

            cands, _ = self._candidate_set()
            cand_ids = [c.movie_id for c in cands]
            scorer = self.scorers[name]

            def _score_users(uids: np.ndarray) -> np.ndarray:  # [k, 1]
                users = [int(u) for u in uids[:, 0]]
                if scorer.assembler is not None:
                    # Candidate-side features live on device; the wave
                    # uploads only [k, ~16] user values (score_wave).
                    if scorer._wave is None:
                        scorer.prepare_wave(cand_ids, self.MODEL_BATCH)
                    return scorer.score_wave(users)
                return scorer.score_many(users, cand_ids)

            self._model_batchers[name] = MicroBatcher(
                _score_users, max_batch=self.MODEL_BATCH,
                max_wait_ms=self._model_batch_wait_ms,
            )
            return self._model_batchers[name]

    def _candidate_set(self):
        import numpy as np

        if self._candidates is None:
            cands = self.dm.get_movies(CANDIDATE_SIZE, "rating")
            d = (
                self.dm.movie_emb_matrix.shape[1]
                if self.dm.movie_emb_matrix.size
                else 0
            )
            mat = np.zeros((len(cands), d), np.float32)
            for i, m in enumerate(cands):
                row = self.dm.movie_emb_row(m.movie_id)
                if row >= 0 and d:
                    mat[i] = self.dm.movie_emb_matrix[row]
            self._candidates, self._candidate_matrix = cands, mat
        return self._candidates, self._candidate_matrix

    def get_rec_list(self, user_id: int, size: int, model: str) -> List[Movie]:
        user = self.dm.get_user_by_id(user_id)
        if user is None:
            return []
        candidates, _ = self._candidate_set()
        ranked = self.ranker(user, candidates, model)
        return ranked[:size]

    def ranker(self, user: User, candidates: List[Movie], model: str) -> List[Movie]:
        if model in self.scorers:  # full-feature zoo scorer (?model=deepfm ...)
            cached, _ = self._candidate_set()
            if self._micro_batch and candidates is cached:
                scores = self._model_batcher(model).submit(
                    np.array([user.user_id], np.int64)
                )
            else:
                scores = self.scorers[model].score(
                    user.user_id, [c.movie_id for c in candidates]
                )
            order = np.argsort(-scores, kind="stable")
            return [candidates[i] for i in order]
        if model == "emb":
            return self._rank_user_emb(user, candidates)
        if model in ("neuralcf", "nerualcf"):  # accept the reference typo
            if self.scorer is None:
                return list(candidates)
            scores = self.scorer.score(user.user_id, [c.movie_id for c in candidates])
            order = np.argsort(-scores, kind="stable")
            return [candidates[i] for i in order]
        return list(candidates)  # default: preserve candidate order

    def _rank_user_emb(self, user: User, candidates: List[Movie]) -> List[Movie]:
        import numpy as np

        from sparrowrecsys_tpu.serving.rankers import cosine_scores_batch

        emb = user.emb
        if emb is None:
            row = self.dm.user_emb_row(user.user_id)
            emb = self.dm.user_emb_matrix[row] if row >= 0 else None
        if emb is None:
            return list(candidates)
        cached, mat = self._candidate_set()
        if candidates is cached and mat.size:
            if self._batcher is not None:
                scores = self._batcher.submit(np.asarray(emb, np.float32))
            else:
                scores = cosine_scores_batch(np.asarray(emb, np.float32), mat)
            order = np.argsort(-scores, kind="stable")
            return [candidates[i] for i in order]
        return rank_by_embedding(emb, candidates, self.dm)
