"""Rankers for the recall+rank pipelines.

Replaces the reference's three scoring paths:
- `"emb"`: per-candidate cosine loop (`Embedding.java:63-80`, driven from
  `RecForYouProcess.java:80-83` / `SimilarMovieProcess.java:155-156`) ->
  one jitted matmul over the candidate embedding matrix (`ops.topk`);
- default heuristic: 0.7 * genre-overlap + 0.3 * rating/5
  (`SimilarMovieProcess.java:181-198`) — host-side, it's string math;
- `"nerualcf"`: REST call to TF Serving (`RecForYouProcess.java:120-147`)
  -> `ModelScorer`, an in-process jitted NeuralCF batch scorer restored
  from a versioned checkpoint (`training.checkpoint`), with an optional
  HTTP sidecar client for architectural parity (`RestScorer`).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence

import numpy as np

from sparrowrecsys_tpu.serving.catalog import DataManager, Movie

#: Device work from HTTP worker threads is serialized: the jitted scoring
#: calls are microseconds, but the PJRT client (especially the remote-
#: attached one) is not safe under concurrent dispatch from many threads.
_DEVICE_LOCK = threading.Lock()


#: Candidate-count shape buckets for the jitted cosine pass. `jax.jit`
#: specializes on the matrix's row count, so an unpadded call compiles
#: once per DISTINCT candidate-set size — and /getsimilarmovie's
#: genre-union candidates vary per movie, which on the remote-attached
#: TPU means a multi-second (tunnel: multi-minute) compile on ordinary
#: requests. Padding N up to a bucket caps serving at one compile per
#: bucket, all of which `RecSysServer.warmup()` pre-triggers at startup.
_SHAPE_BUCKETS = (128, 512, 1024, 4096, 16384)


def _pad_bucket(n: int) -> int:
    for b in _SHAPE_BUCKETS:
        if n <= b:
            return b
    return n  # beyond the largest bucket: exact shape (rare, scan-scale)


def cosine_scores_batch(query: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    """One [1, D] x [N, D] cosine pass on device; -1 for zero rows (parity
    with `calculateSimilarity` returning -1 on null embeddings). The
    matrix is zero-padded to a shape bucket so one compilation serves
    every candidate-set size in the bucket (padded rows are sliced off
    before the dead-row mask)."""
    from sparrowrecsys_tpu.ops.topk import cosine_scores
    import jax.numpy as jnp

    if matrix.size == 0 or query.size == 0:
        return np.full(len(matrix), -1.0, np.float32)
    n = len(matrix)
    padded_n = _pad_bucket(n)
    if padded_n != n:
        pad = np.zeros((padded_n - n, matrix.shape[1]), matrix.dtype)
        matrix_dev = np.concatenate([matrix, pad], axis=0)
    else:
        matrix_dev = matrix
    with _DEVICE_LOCK:
        s = np.array(
            cosine_scores(jnp.asarray(query[None, :]), jnp.asarray(matrix_dev))
        )[0, :n]
    dead = ~np.any(matrix != 0, axis=1)
    s[dead] = -1.0
    return s


def similar_score(movie: Movie, candidate: Movie) -> float:
    """`calculateSimilarScore` (SimilarMovieProcess.java:181-198)."""
    same = sum(1 for g in movie.genres if g in candidate.genres)
    denom = len(movie.genres) + len(candidate.genres)
    genre_sim = (same / denom / 2) if denom else 0.0
    return 0.7 * genre_sim + 0.3 * (candidate.average_rating / 5)


def rank_by_embedding(
    query_emb: Optional[np.ndarray],
    candidates: Sequence[Movie],
    dm: DataManager,
) -> List[Movie]:
    """Batched replacement of the emb ranker loops: gather candidate rows
    from the aligned matrix, one cosine matmul, host argsort."""
    if query_emb is None:
        # Reference scores everything -1 and the sort keeps arbitrary
        # order; return candidates unranked.
        return list(candidates)
    rows = np.array([dm.movie_emb_row(m.movie_id) for m in candidates])
    have = rows >= 0
    mat = np.zeros((len(candidates), len(query_emb)), np.float32)
    if have.any():
        mat[have] = dm.movie_emb_matrix[rows[have]]
    scores = cosine_scores_batch(np.asarray(query_emb, np.float32), mat)
    scores[~have] = -1.0
    order = np.argsort(-scores, kind="stable")
    return [candidates[i] for i in order]


class ModelScorer:
    """In-process jitted CTR scorer — the TF-Serving replacement.

    Loads a model + versioned checkpoint once; `score(user_id, movie_ids)`
    runs one jitted batch forward. Fills the role of
    `callNeuralCFTFServing` (`RecForYouProcess.java:120-147`) without the
    REST hop, and pads the candidate batch to a fixed size so one
    compilation serves all requests.
    """

    def __init__(self, model, params, batch_pad: int = 1024,
                 assembler=None, extra_int_cols: Sequence[str] = ()):
        import jax

        self.model = model
        self.params = params
        self.batch_pad = batch_pad
        #: Hot-reload state (set by from_checkpoint): the versioned dir
        #: being watched and the currently-served version. TF Serving
        #: parity — the reference's sidecar polls webroot/modeldata/
        #: neuralcf/NNN and atomically serves the newest
        #: (RecForYouProcess.java:139, export at NeuralCF.py:106-114).
        self.model_dir: Optional[str] = None
        self.version: Optional[int] = None
        #: Optional serving.assembler.FeatureAssembler: when set, score()
        #: assembles the FULL feature dict online (mf:/uf: store + catalog
        #: fallback + nearline real-time history) so feature-based models
        #: (DeepFM, Wide&Deep, DIN, ...) rank online — the 27-feature
        #: request schema of HttpClient.java:127-148, which the reference
        #: documents but never wires. None = id-only (NeuralCF) parity.
        self.assembler = assembler
        self.extra_int_cols = tuple(extra_int_cols)
        # prepare_wave() state: device-resident candidate-side feature
        # columns + the compiled wave fn (see score_wave).
        self._wave = None

        @jax.jit
        def _score(params, feats):
            out = model.apply({"params": params}, feats)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.sigmoid(logits)

        self._score = _score

    @classmethod
    def from_checkpoint(cls, model, model_dir: str, batch_pad: int = 1024,
                        assembler=None, extra_int_cols: Sequence[str] = ()):
        import jax
        import numpy as np

        from sparrowrecsys_tpu.training.checkpoint import load_latest

        if assembler is not None:
            feats = assembler.example_features(2, extra_int_cols)
        else:
            feats = {
                "movieId": np.zeros(2, np.int32),
                "userId": np.zeros(2, np.int32),
            }
        target = model.init(jax.random.PRNGKey(0), feats)["params"]
        params, version, _ = load_latest(model_dir, target)
        scorer = cls(model, params, batch_pad, assembler, extra_int_cols)
        scorer.model_dir = model_dir
        scorer.version = version
        return scorer

    def reload_if_new(self) -> Optional[int]:
        """Atomically swap in the newest COMPLETE checkpoint version if one
        has appeared since load — the TF Serving hot-reload behavior.

        Returns the new version number, or None if already current. The
        swap is a single attribute assignment (atomic under the GIL):
        in-flight score()/score_wave() calls finish on the params they
        already read; the next call sees the new tree. The compiled score
        functions take params as an ARGUMENT, so no re-jit and no dropped
        requests. A half-written export (params.msgpack without meta.json)
        is never picked up (checkpoint.latest_ready_version); a corrupt
        one is skipped and retried on the next poll."""
        if self.model_dir is None:
            return None
        from sparrowrecsys_tpu.training.checkpoint import (
            latest_ready_version,
            load_version,
        )

        v = latest_ready_version(self.model_dir)
        if v is None or (self.version is not None and v <= self.version):
            return None
        try:
            params, _ = load_version(self.model_dir, v, self.params)
        except Exception:
            return None  # partially written / corrupt: retry next poll
        self.params = params
        self.version = v
        return v

    def score(self, user_id: int, movie_ids: Sequence[int]) -> np.ndarray:
        import jax.numpy as jnp

        n = len(movie_ids)
        pad = self.batch_pad
        while pad < n:
            pad *= 2
        mids = np.zeros(pad, np.int32)
        mids[:n] = np.asarray(movie_ids, np.int32)
        if self.assembler is not None:
            # Assemble the real candidates only; batch-pad rows are zeros
            # (id 0 = miss/mask in every column's encoding).
            real = self.assembler.features(
                user_id, np.asarray(movie_ids, np.int32), self.extra_int_cols
            )
            host_feats = {}
            for k, v in real.items():
                col = np.zeros(pad, v.dtype)
                col[:n] = v
                host_feats[k] = col
        else:
            host_feats = {
                "movieId": mids,
                "userId": np.full(pad, user_id, np.int32),
            }
        with _DEVICE_LOCK:
            feats = {k: jnp.asarray(v) for k, v in host_feats.items()}
            return np.asarray(self._score(self.params, feats))[:n]

    def score_many(
        self, user_ids: Sequence[int], movie_ids: Sequence[int]
    ) -> np.ndarray:
        """Score the SAME candidate list for k users in ONE device dispatch
        — returns [k, n]. This is the model-path analogue of the emb
        path's micro-batched cosine: on remote-attached TPU each dispatch
        is a ~36 ms tunnel round-trip (BASELINE.md wave-ceiling section),
        so per-request score() serializes at ~13 req/s while a k-wave
        amortizes the round-trip k ways. Row equality with per-user
        score() is tested."""
        import jax.numpy as jnp

        n = len(movie_ids)
        k = len(user_ids)
        total = k * n
        pad = self.batch_pad
        while pad < total:
            pad *= 2
        mids = np.asarray(movie_ids, np.int32)
        if self.assembler is not None:
            reals = [
                self.assembler.features(int(u), mids, self.extra_int_cols)
                for u in user_ids
            ]
            host_feats = {}
            for key, v0 in reals[0].items():
                col = np.zeros(pad, v0.dtype)
                col[:total] = np.concatenate([r[key] for r in reals])
                host_feats[key] = col
        else:
            mcol = np.zeros(pad, np.int32)
            mcol[:total] = np.tile(mids, k)
            ucol = np.zeros(pad, np.int32)
            ucol[:total] = np.repeat(np.asarray(user_ids, np.int32), n)
            host_feats = {"movieId": mcol, "userId": ucol}
        with _DEVICE_LOCK:
            feats = {kk: jnp.asarray(v) for kk, v in host_feats.items()}
            flat = np.asarray(self._score(self.params, feats))[:total]
        return flat.reshape(k, n)

    def prepare_wave(self, movie_ids: Sequence[int], k: int) -> None:
        """Pin the candidate-side feature columns ON DEVICE for [k x n]
        waves over a fixed candidate list.

        score_many uploads every feature column per wave — 27 columns x
        padded rows (~900 KB), which is the dominant tunnel payload on
        remote-attached TPU (BASELINE.md rank-load section). The candidate
        side (movieId + genres + numerics + DIEN's zero negatives) is
        CONSTANT per candidate list, so it lives on device; each wave
        uploads only the [k, ~16]-value user rows and broadcasts them on
        device. Invalidation rides the assembler's movie_block cache: the
        wave is rebuilt when the block's array identity changes (store
        write / add_rating)."""
        import jax
        import jax.numpy as jnp

        from sparrowrecsys_tpu.serving.assembler import (
            MOVIE_FLOAT_COLS, MOVIE_GENRE_COLS,
            USER_FLOAT_COLS, USER_GENRE_COLS, USER_INT_COLS,
        )

        asm = self.assembler
        if asm is None:
            raise ValueError("prepare_wave needs an assembler-backed scorer")
        mids = np.asarray([int(m) for m in movie_ids], np.int32)
        mg, mf = asm.movie_block(mids)
        n = len(mids)
        total = k * n
        pad = self.batch_pad
        while pad < total:
            pad *= 2

        def tile_pad(col: np.ndarray) -> np.ndarray:
            out = np.zeros(pad, col.dtype)
            out[:total] = np.tile(col, k)
            return out

        resident = {"movieId": jnp.asarray(tile_pad(mids))}
        for j, c in enumerate(MOVIE_GENRE_COLS):
            resident[c] = jnp.asarray(tile_pad(np.ascontiguousarray(mg[:, j])))
        for j, c in enumerate(MOVIE_FLOAT_COLS):
            resident[c] = jnp.asarray(tile_pad(np.ascontiguousarray(mf[:, j])))
        for c in self.extra_int_cols:
            resident[c] = jnp.zeros(pad, jnp.int32)

        user_int_cols = ("userId",) + USER_INT_COLS + USER_GENRE_COLS
        user_flt_cols = USER_FLOAT_COLS
        model = self.model

        @jax.jit
        def _wave(params, ui, uf):  # ui [k, Ui] int32, uf [k, Uf] f32
            feats = dict(resident)
            tail = pad - total
            for j, c in enumerate(user_int_cols):
                col = jnp.repeat(ui[:, j], n, total_repeat_length=total)
                feats[c] = jnp.pad(col, (0, tail)) if tail else col
            for j, c in enumerate(user_flt_cols):
                col = jnp.repeat(uf[:, j], n, total_repeat_length=total)
                feats[c] = jnp.pad(col, (0, tail)) if tail else col
            out = model.apply({"params": params}, feats)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.sigmoid(logits)

        self._wave = {
            "fn": _wave, "mids": mids, "k": k, "n": n, "total": total,
            "src_mg": mg,  # identity witness for staleness (movie_block
            "user_int_cols": user_int_cols,  # returns cached array objects)
            "user_flt_cols": user_flt_cols,
        }

    def score_wave(self, user_ids: Sequence[int]) -> np.ndarray:
        """[k, n] scores over the prepared candidate list — uploads only
        the user rows. Rebuilds the resident block if the assembler's
        movie_block has been invalidated since prepare_wave."""
        w = self._wave
        if w is None or len(user_ids) != w["k"]:
            raise ValueError("call prepare_wave(movie_ids, k) first")
        mg, _ = self.assembler.movie_block(w["mids"])
        if mg is not w["src_mg"]:
            self.prepare_wave(w["mids"], w["k"])  # stale: rebuild resident
            w = self._wave
        rows = [self.assembler.user_row(int(u)) for u in user_ids]
        ui = np.asarray(
            [[int(u)] + [int(r[c]) for c in w["user_int_cols"][1:]]
             for u, r in zip(user_ids, rows)], np.int32,
        )
        uf = np.asarray(
            [[float(r[c]) for c in w["user_flt_cols"]] for r in rows],
            np.float32,
        )
        with _DEVICE_LOCK:
            flat = np.asarray(w["fn"](self.params, ui, uf))[: w["total"]]
        return flat.reshape(w["k"], w["n"])


class ModelVersionWatcher:
    """Filesystem poller that hot-reloads every registered ModelScorer —
    the TF Serving version-policy equivalent (the reference's serving
    stack gets this behavior from TF Serving itself, which polls the
    `modeldata/neuralcf/NNN` dirs and atomically serves the newest;
    `RecForYouProcess.java:139`, export at `NeuralCF.py:106-114`).

    One daemon thread, `poll_s` seconds between sweeps (TF Serving's
    `file_system_poll_wait_seconds` analogue, default 1 s). Thread-safe by
    construction: reload_if_new swaps a single attribute; serving threads
    never block on the poller."""

    def __init__(self, scorers: dict, poll_s: float = 1.0):
        self.scorers = dict(scorers)  # {name: ModelScorer}
        self.poll_s = poll_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def poll_once(self) -> dict:
        """One sweep; returns {name: new_version} for scorers that swapped."""
        from sparrowrecsys_tpu.utils.observability import get_registry

        swapped = {}
        for name, scorer in self.scorers.items():
            v = scorer.reload_if_new()
            if v is not None:
                swapped[name] = v
                get_registry().incr(f"model.reload.{name}")
        return swapped

    def versions(self) -> dict:
        """{name: currently-served version} for /metrics."""
        return {
            name: s.version
            for name, s in self.scorers.items()
            if s.version is not None
        }

    def start(self) -> "ModelVersionWatcher":
        def loop():
            while not self._stop.wait(self.poll_s):
                try:
                    self.poll_once()
                except Exception:
                    pass  # never let a poll error kill the watcher
        self._thread = threading.Thread(
            target=loop, daemon=True, name="model-version-watcher"
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)


class RestScorer:
    """TF-Serving-protocol REST client — optional sidecar-mode parity with
    `HttpClient.asyncSinglePostRequest` + the `{"instances": [...]}` payload
    (`RecForYouProcess.java:131-147`). Works against our own sidecar
    (`serving.sidecar`) or a real TF Serving."""

    def __init__(self, endpoint: str = "http://localhost:8501/v1/models/recmodel:predict"):
        self.endpoint = endpoint

    def score(self, user_id: int, movie_ids: Sequence[int]) -> np.ndarray:
        import json
        import urllib.request

        payload = json.dumps(
            {"instances": [{"userId": user_id, "movieId": int(m)} for m in movie_ids]}
        ).encode()
        req = urllib.request.Request(
            self.endpoint, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            out = json.loads(resp.read())
        return np.asarray([p[0] for p in out["predictions"]], np.float32)

    def map_post(self, body_map: dict, timeout: float = 10.0) -> Optional[dict]:
        """`HttpClient.asyncMapPostRequest` parity (HttpClient.java:65-101):
        POST every value of `body_map` to the endpoint concurrently and
        return {key: response text}. Reference semantics preserved: None
        for an empty/None map, and None (not a partial dict) when any
        request fails — the Java version catch-alls the whole batch."""
        if not body_map:
            return None
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        def post_one(body: str) -> str:
            req = urllib.request.Request(
                self.endpoint,
                data=body.encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read().decode()

        try:
            with ThreadPoolExecutor(max_workers=min(len(body_map), 16)) as pool:
                futures = {k: pool.submit(post_one, v) for k, v in body_map.items()}
                return {k: f.result() for k, f in futures.items()}
        except Exception:
            return None
