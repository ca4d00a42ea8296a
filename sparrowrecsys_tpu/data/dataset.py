"""Encoded, device-ready datasets.

Replaces the reference's per-step tf.data CSV pipeline
(`make_csv_dataset(batch_size=12, label_name='label', na_value="0", ...)`,
`EmbeddingMLP.py:14-22`) with a TPU-native design: the CSV is decoded and
vocab-encoded ONCE into dense int32/float32 columns; batching is pure array
slicing, so the whole epoch can live device-resident and the training step
never crosses the host boundary for feature parsing.

Missing-value semantics follow the reference: `na_value="0"` turns missing
history movieIds into id 0 (masked by `mask_zero=True` models), and genre
strings outside the 19-genre vocabulary become OOV -> zero embedding.
"""

from __future__ import annotations

import csv
import dataclasses
import math
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from sparrowrecsys_tpu.config import GENRE_VOCAB
from sparrowrecsys_tpu.data.schema import (
    GENRE_COLUMNS,
    HISTORY_COLUMNS,
    NUMERIC_COLUMNS,
    EXTRA_NUMERIC_COLUMNS,
    SAMPLE_COLUMNS,
    SampleTable,
)

_GENRE_TO_IDX = {g: i for i, g in enumerate(GENRE_VOCAB)}

INT_FEATURES = ["movieId", "userId"] + HISTORY_COLUMNS
GENRE_FEATURES = list(GENRE_COLUMNS)
FLOAT_FEATURES = list(NUMERIC_COLUMNS) + list(EXTRA_NUMERIC_COLUMNS)


def _parse_float(s: str) -> float:
    # make_csv_dataset(na_value="0") turns missing numerics into 0.
    # Non-finite tokens ('nan'/'inf') are also treated as garbage -> 0:
    # float('nan') would poison downstream int() casts, and the native
    # parser (which only accepts [+-]digits[.digits][eE...]) maps them to
    # 0 — the two loaders must stay column-equal on the same file.
    if s == "" or s == "NULL" or s == "null":
        return 0.0
    try:
        v = float(s)
    except ValueError:
        return 0.0
    return v if math.isfinite(v) else 0.0


def load_samples(path: str) -> SampleTable:
    """Sample-CSV loader with the native C++ fast path (~20x; exact
    column equality with `load_samples_csv` is asserted in
    tests/test_native.py) and a transparent pure-Python fallback."""
    from sparrowrecsys_tpu.native import load_samples_native

    return load_samples_native(path)


def load_samples_csv(path: str) -> SampleTable:
    """Parse a reference-format 27-column sample CSV into a SampleTable
    (genre strings -> vocab indices with -1 OOV/missing; history '' -> 0).
    Pure-Python reference implementation; prefer `load_samples`."""
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = list(reader)
    col_pos = {c: header.index(c) for c in SAMPLE_COLUMNS if c in header}
    # Skip truncated rows (e.g. an interrupted feature-job write) exactly
    # like the native parser does, so the "transparent fallback" really is
    # column-equal with load_samples (tests/test_native.py).
    width = max(col_pos.values()) + 1
    rows = [r for r in rows if len(r) >= width]
    n = len(rows)
    cols: Dict[str, np.ndarray] = {}

    def grab(c: str):
        p = col_pos[c]
        return [r[p] for r in rows]

    for c in ("movieId", "userId", "label", "releaseYear", "movieRatingCount",
              "userRatingCount", "userAvgReleaseYear", "timestamp"):
        dt = np.int64 if c == "timestamp" else np.int32
        cols[c] = np.array([int(_parse_float(v)) for v in grab(c)], dtype=dt)
    for c in ("rating", "movieAvgRating", "movieRatingStddev",
              "userAvgRating", "userRatingStddev", "userReleaseYearStddev"):
        cols[c] = np.array([_parse_float(v) for v in grab(c)], dtype=np.float32)
    for c in HISTORY_COLUMNS:
        cols[c] = np.array(
            [int(_parse_float(v)) for v in grab(c)], dtype=np.int32
        )
    for c in GENRE_COLUMNS:
        cols[c] = np.array(
            [_GENRE_TO_IDX.get(v, -1) for v in grab(c)], dtype=np.int32
        )
    return SampleTable(cols)


@dataclasses.dataclass
class EncodedDataset:
    """Dense feature arrays + labels, ready for jnp.asarray.

    features: name -> array [N] (int32 for ids/genres, float32 numerics)
    labels:   float32 [N]
    """

    features: Dict[str, np.ndarray]
    labels: np.ndarray

    def __len__(self) -> int:
        return len(self.labels)

    def slice(self, idx: np.ndarray) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        return {k: v[idx] for k, v in self.features.items()}, self.labels[idx]

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        pad_final: bool = False,
    ) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray, Optional[np.ndarray]]]:
        """Yield (features, labels, valid_mask). valid_mask is None except for
        a padded final batch (pad_final=True keeps shapes static for jit)."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        full = n // batch_size
        for b in range(full):
            idx = order[b * batch_size : (b + 1) * batch_size]
            f, l = self.slice(idx)
            yield f, l, None
        rem = n - full * batch_size
        if rem and not drop_remainder:
            idx = order[full * batch_size :]
            if pad_final:
                pad = np.concatenate([idx, np.zeros(batch_size - rem, dtype=idx.dtype)])
                f, l = self.slice(pad)
                mask = np.zeros(batch_size, dtype=np.float32)
                mask[:rem] = 1.0
                yield f, l, mask
            else:
                f, l = self.slice(idx)
                yield f, l, None


def standardize(
    train: EncodedDataset, *others: "EncodedDataset"
) -> Tuple["EncodedDataset", ...]:
    """Z-score the numeric columns using TRAIN statistics.

    The reference feeds raw numerics (releaseYear ~ 1990, counts in the
    thousands) straight into Dense layers (`EmbeddingMLP.py:68-74`), which
    inflates early losses; parity runs keep that behaviour. This opt-in
    transform is the TPU-native default for quality-focused training
    (`training.run --standardize`).
    """
    stats = {}
    for c in FLOAT_FEATURES:
        v = train.features[c]
        mu, sd = float(v.mean()), float(v.std())
        stats[c] = (mu, sd if sd > 1e-6 else 1.0)

    def apply(ds: EncodedDataset) -> EncodedDataset:
        feats = dict(ds.features)
        for c, (mu, sd) in stats.items():
            feats[c] = ((ds.features[c] - mu) / sd).astype(np.float32)
        return EncodedDataset(feats, ds.labels)

    return tuple(apply(d) for d in (train, *others))


def encode_samples(table: SampleTable) -> EncodedDataset:
    """SampleTable -> EncodedDataset (drops rating/timestamp bookkeeping).

    Extended history columns (userRatedMovie6+ from
    `build_samples(history_length=N)`) pass through for long-history
    DIN/DIEN training."""
    feats: Dict[str, np.ndarray] = {}
    int_cols = list(INT_FEATURES) + sorted(
        (c for c in table.columns if c.startswith("userRatedMovie")
         and c not in INT_FEATURES),
        key=lambda c: int(c[len("userRatedMovie"):]),
    )
    for c in int_cols + GENRE_FEATURES:
        feats[c] = table[c].astype(np.int32)
    for c in FLOAT_FEATURES:
        feats[c] = table[c].astype(np.float32)
    labels = table["label"].astype(np.float32)
    return EncodedDataset(feats, labels)
