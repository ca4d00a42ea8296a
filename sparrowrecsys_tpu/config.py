"""Typed configuration for the whole framework.

Replaces the reference's scattered, hardcoded configuration:
- `online/util/Config.java:6-22` (four static mutable flags),
- hardcoded Redis endpoint (`online/datamanager/RedisClient.java:14-15`),
- hardcoded TF Serving URL (`online/recprocess/RecForYouProcess.java:139`),
- per-script hyperparameters in `TFRecModel/.../*.py`.

One frozen dataclass tree covers data paths, feature semantics, model
hyperparameters, mesh/parallelism, training, and serving.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

# --------------------------------------------------------------------------
# Canonical constants shared with the reference
# --------------------------------------------------------------------------

#: 19-genre vocabulary, identical order to `TFRecModel/.../EmbeddingMLP.py:30-32`.
GENRE_VOCAB: Tuple[str, ...] = (
    "Film-Noir", "Action", "Adventure", "Horror", "Romance", "War", "Comedy",
    "Western", "Documentary", "Sci-Fi", "Drama", "Thriller", "Crime",
    "Fantasy", "Animation", "IMAX", "Mystery", "Children", "Musical",
)

#: movieId id-space, `categorical_column_with_identity(num_buckets=1001)`
#: (`EmbeddingMLP.py:57`).
MOVIE_VOCAB_SIZE = 1001
#: userId id-space, `num_buckets=30001` (`EmbeddingMLP.py:62`).
USER_VOCAB_SIZE = 30001
#: every embedding in the reference zoo is 10-dim (`EmbeddingMLP.py:52,58,63`).
EMBEDDING_DIM = 10
#: behaviour-history length, `RECENT_MOVIES = 5` (`DIN.py:31`).
RECENT_MOVIES = 5
#: positive-label threshold, `rating >= 3.5` (`FeatureEngForRecModel.scala:36`).
POSITIVE_RATING_THRESHOLD = 3.5
#: trailing feature window, `rowsBetween(-100, -1)`
#: (`FeatureEngForRecModel.scala:100`).
USER_FEATURE_WINDOW = 100
#: decimal precision for formatted stats (`FeatureEngForRecModel.scala:17`).
NUMBER_PRECISION = 2


def _default_data_root() -> str:
    return os.environ.get(
        "SPARROW_DATA_ROOT",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"),
    )


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Paths and feature-pipeline parameters."""

    data_root: str = dataclasses.field(default_factory=_default_data_root)
    movies_csv: str = "movies.csv"
    links_csv: str = "links.csv"
    ratings_csv: str = "ratings.csv"
    # Artifact outputs (reference formats preserved).
    item_emb_file: str = "item2vecEmb.csv"   # `Embedding.scala:145-151` format `id:f f ...`
    user_emb_file: str = "userEmb.csv"
    # Sampling / split, `FeatureEngForRecModel.scala:195-212`.
    sample_fraction: float = 1.0             # reference demos with 0.1
    train_fraction: float = 0.8
    split_by_time: bool = False              # `splitAndSaveTrainingTestSamplesByTimeStamp` variant
    seed: int = 2024

    def path(self, name: str) -> str:
        return os.path.join(self.data_root, name)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shared model hyper-parameters (per-model extras live in the model)."""

    movie_vocab_size: int = MOVIE_VOCAB_SIZE
    user_vocab_size: int = USER_VOCAB_SIZE
    embedding_dim: int = EMBEDDING_DIM
    genre_vocab_size: int = len(GENRE_VOCAB)
    recent_movies: int = RECENT_MOVIES
    # Cross-feature hash buckets, `crossed_column(..., 10000)` (`WideNDeep.py:75`).
    cross_hash_buckets: int = 10000
    # Compute dtype for dense towers; params stay fp32.
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit/shard_map.

    The reference has no parallelism of its own (single-process Keras fit,
    `master=local` Spark) — SURVEY.md §2.7. We scale via a 2-D mesh:
    `data` for batch parallelism, `model` for row-sharded embedding tables.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = infer from available devices.
    data_parallel: int = -1
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop parameters.

    Reference defaults: batch=12, adam, BCE, 5 epochs
    (`EmbeddingMLP.py:14-22,87-93`). batch=12 is kept as the parity setting;
    the TPU-native default is a large batch that tiles the MXU.
    """

    batch_size: int = 8192
    parity_batch_size: int = 12
    epochs: int = 5
    learning_rate: float = 1e-3
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-7          # Keras Adam epsilon (TF default), not optax's 1e-8
    #: store the BIG embedding tables (>= optim.SMALL_LEAF_MAX_ELEMS
    #: elements) in bfloat16 with fp32 MASTER weights in the optimizer
    #: state (grouped_adam master_weights): halves the dense update's
    #: param streams AND the gather/scatter row widths end-to-end —
    #: the production form of the mfu_demo --bf16-tables ceiling.
    #: Quality A/B'd (tools/moment_dtype_ab --ab params, BASELINE.md);
    #: fp32 stays default. Orthogonal to lookup_dtype (which narrows
    #: only the lookup view of fp32 tables).
    bf16_table_params: bool = False
    #: route the row-sparse (lazy) Adam's [U, 3D] gather/scatter through
    #: the Pallas row-DMA kernels (ops/rowio.py) instead of XLA's tiled
    #: gather/scatter. Only meaningful with Trainer(sparse_tables=...);
    #: dispatch verdict in KERNELS.md (tools/pallas_rowio_probe.py).
    sparse_rowio: bool = False
    #: storage dtype for the BIG leaves' Adam moments (embedding tables) —
    #: "bfloat16" halves the dominant optimizer HBM stream (measured
    #: −2.1 ms/step at the 262144-batch MFU shape, tools/mfu_attrib.py);
    #: update math and master weights stay fp32. Quality A/B'd before
    #: use (tools/moment_dtype_ab.py, BASELINE.md); fp32 stays default.
    big_moment_dtype: str = "float32"
    shuffle_each_epoch: bool = True
    #: "exact" permutes rows (identical statistics to the reference's
    #: full shuffle); "blocks" permutes fixed blocks of `shuffle_block`
    #: rows — contiguous gathers with zero TPU tile amplification,
    #: measured ~+6% step throughput over exact (tools/step_exp7.py) at
    #: the cost of approximate shuffling (the reference's own
    #: `make_csv_dataset` buffer shuffle is also approximate,
    #: `EmbeddingMLP.py:14-22`). Opt-in; parity bands police quality.
    shuffle_mode: str = "exact"
    shuffle_block: int = 1024
    #: lax.scan unroll for the device-resident epoch loop. >1 replicates
    #: the step body inside the compiled while-loop, amortizing per-
    #: iteration loop overhead; numerics identical. Measured on v5e at the
    #: bench protocol before changing (tools/step_floor.py).
    epoch_unroll: int = 1
    seed: int = 42
    checkpoint_dir: str = "checkpoints"
    checkpoint_keep: int = 5        # reference keeps numbered versions 001..005 (MLPRec)

    def __post_init__(self) -> None:
        if self.shuffle_mode not in ("exact", "blocks"):
            raise ValueError(
                f"shuffle_mode={self.shuffle_mode!r}: expected 'exact' or "
                "'blocks' (a typo here would silently train with the "
                "default exact shuffle)"
            )


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """Online-serving parameters (replaces `RecSysServer.java` wiring)."""

    port: int = 6010                          # `RecSysServer.java:25-32` (env PORT overrides)
    candidate_size: int = 800                 # `RecForYouProcess.java:35-37`
    similar_genre_top: int = 100              # `SimilarMovieProcess.java:52`
    ab_traffic_split: int = 5                 # `ABTest.java:8`
    default_model: str = "emb"
    # The reference's load-bearing typo: `"nerualcf"` appears in
    # `ABTest.java:14` and `RecForYouProcess.java:86`. Accept both spellings.
    neuralcf_aliases: Tuple[str, ...] = ("neuralcf", "nerualcf")
    webroot: Optional[str] = None             # static assets dir (frontend parity)
    #: micro-batcher window for coalescing concurrent ranked requests into
    #: one device dispatch. 0 = TF-Serving-style adaptive batching (score
    #: whatever is pending immediately; batches grow naturally while one is
    #: in flight). >0 trades that much added latency for bigger waves —
    #: only worth it when per-dispatch overhead dominates (remote-attached
    #: TPU; see BASELINE.md serving wave-ceiling section).
    batch_wait_ms: float = 0.0
    #: model-path wave size: concurrent full-feature ranked requests per
    #: device dispatch (k x 800 candidate rows -> one compiled shape).
    #: 8 is the CPU sweet spot; on remote-attached TPU larger waves
    #: amortize the ~36 ms dispatch round-trip further (measured sweep in
    #: BASELINE.md rank-load section).
    model_batch: int = 8
    #: model-version filesystem poll interval (TF Serving's
    #: file_system_poll_wait_seconds analogue): every poll, each
    #: checkpoint-backed scorer hot-swaps to the newest complete NNN/
    #: version dir without a restart or dropped requests. 0 disables the
    #: watcher (scorers then serve their load-time version forever).
    model_poll_s: float = 1.0
    #: admission control: shed requests with 503 once this many handler
    #: executions are in flight (0 = unbounded opt-out). Under open-loop
    #: overload an unbounded queue COLLAPSES throughput (BASELINE.md
    #: round-4 saturation: 992 -> 273 rps at 2x capacity, p99 18 s);
    #: bounded, the server holds its measured ~950 rps capacity with p99
    #: ~109 ms. Default 32 = 2x the 16-worker handler pool, the measured
    #: knee concurrency — the role Jetty's bounded thread pool plays
    #: implicitly for the reference (`RecSysServer.java:76-78`); our
    #: asyncio facade has no implicit bound, so shipping it OFF would
    #: reproduce a failure mode the reference doesn't actually have.
    max_inflight: int = 32


@dataclasses.dataclass(frozen=True)
class SparrowConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    serving: ServingConfig = dataclasses.field(default_factory=ServingConfig)


def default_config() -> SparrowConfig:
    return SparrowConfig()


def config_to_json(config: SparrowConfig, path: str) -> None:
    import dataclasses as dc
    import json

    with open(path, "w") as f:
        json.dump(dc.asdict(config), f, indent=1)


def config_from_json(path: str) -> SparrowConfig:
    """Load a config file; unknown keys are rejected (typo safety)."""
    import json

    with open(path) as f:
        blob = json.load(f)

    def build(cls, data: dict):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        unknown = set(data) - set(fields)
        if unknown:
            raise ValueError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
        kwargs = {}
        for k, v in data.items():
            ft = fields[k].type
            if isinstance(v, dict) and k in _SECTIONS:
                kwargs[k] = build(_SECTIONS[k], v)
            elif isinstance(v, list):
                kwargs[k] = tuple(v)
            else:
                kwargs[k] = v
        return cls(**kwargs)

    return build(SparrowConfig, blob)


_SECTIONS = {
    "data": DataConfig,
    "model": ModelConfig,
    "mesh": MeshConfig,
    "train": TrainConfig,
    "serving": ServingConfig,
}
