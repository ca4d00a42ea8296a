"""ctypes bindings for the C++ data loader (native/csv_loader.cc).

The shared library is built on demand (`make -C native`, g++ -O3) and
cached; if no toolchain is available every entry point falls back to the
Python loaders, so the framework never hard-depends on the native path.

At MovieLens-20M scale the native ratings parse runs at memory bandwidth
(~10-20x the Python csv module), which keeps the offline feature plane's
wall-clock dominated by the vectorized numpy stages, not IO.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsparrow_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.count_csv_rows.restype = ctypes.c_int64
        lib.count_csv_rows.argtypes = [ctypes.c_char_p]
        lib.load_ratings_csv.restype = ctypes.c_int64
        lib.load_ratings_csv.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.int64),
            ctypes.c_int64,
        ]
        lib.probe_embeddings.restype = ctypes.c_int64
        lib.probe_embeddings.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.load_embeddings.restype = ctypes.c_int64
        lib.load_embeddings.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int64, ctypes.c_int64,
        ]
        if hasattr(lib, "load_table_csv"):
            lib.load_table_csv.restype = ctypes.c_int64
            lib.load_table_csv.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int32), ctypes.c_int64,
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.float32),
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int64),
                ctypes.c_int64,
            ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_ratings_native(path: str):
    """Ratings loader: C++ fast path, Python fallback. Returns a
    `data.movielens.Ratings`."""
    from sparrowrecsys_tpu.data.movielens import Ratings, load_ratings

    lib = _load_lib()
    if lib is None:
        return load_ratings(path)
    cap = lib.count_csv_rows(path.encode())
    if cap < 0:
        raise FileNotFoundError(path)
    u = np.empty(cap, np.int32)
    m = np.empty(cap, np.int32)
    r = np.empty(cap, np.float32)
    t = np.empty(cap, np.int64)
    n = lib.load_ratings_csv(path.encode(), u, m, r, t, cap)
    if n < 0:
        # File vanished/changed between probe and parse: fall back.
        return load_ratings(path)
    return Ratings(u[:n], m[:n], r[:n], t[:n])


def load_samples_native(path: str):
    """27-column sample-table loader: C++ fast path, Python fallback.
    Returns a `data.schema.SampleTable` identical to
    `data.dataset.load_samples_csv` (asserted in tests/test_native.py)."""
    from sparrowrecsys_tpu.config import GENRE_VOCAB
    from sparrowrecsys_tpu.data.dataset import load_samples_csv
    from sparrowrecsys_tpu.data.schema import (
        GENRE_COLUMNS,
        HISTORY_COLUMNS,
        SAMPLE_COLUMNS,
        SampleTable,
    )

    lib = _load_lib()
    if lib is None or not hasattr(lib, "load_table_csv"):
        return load_samples_csv(path)
    with open(path, encoding="utf-8") as f:
        header = f.readline().strip().split(",")
    if not set(SAMPLE_COLUMNS) <= set(header):
        return load_samples_csv(path)

    INT32 = [
        "movieId", "userId", "label", "releaseYear", "movieRatingCount",
        "userRatingCount", "userAvgReleaseYear",
    ] + list(HISTORY_COLUMNS)
    FLT = [
        "rating", "movieAvgRating", "movieRatingStddev",
        "userAvgRating", "userRatingStddev", "userReleaseYearStddev",
    ]
    kind_of = {c: 1 for c in INT32}
    kind_of.update({c: 2 for c in FLT})
    kind_of.update({c: 3 for c in GENRE_COLUMNS})
    kind_of["timestamp"] = 4
    kinds = np.array([kind_of.get(c, 0) for c in header], np.int32)

    cap = lib.count_csv_rows(path.encode())
    if cap < 0:
        raise FileNotFoundError(path)
    cap = max(cap, 1)
    # column-major blocks, ordered by position in the header
    i32_cols = [c for c in header if kind_of.get(c) == 1]
    f32_cols = [c for c in header if kind_of.get(c) == 2]
    gen_cols = [c for c in header if kind_of.get(c) == 3]
    i64_cols = [c for c in header if kind_of.get(c) == 4]
    i32 = np.empty(len(i32_cols) * cap, np.int32)
    f32 = np.empty(len(f32_cols) * cap, np.float32)
    gen = np.empty(len(gen_cols) * cap, np.int32)
    i64 = np.empty(len(i64_cols) * cap, np.int64)
    vocab = "\n".join(GENRE_VOCAB).encode()
    n = lib.load_table_csv(
        path.encode(), kinds, len(header), vocab, i32, f32, gen, i64, cap
    )
    if n < 0:
        return load_samples_csv(path)
    cols: Dict[str, np.ndarray] = {}
    for j, c in enumerate(i32_cols):
        cols[c] = i32[j * cap:j * cap + n].copy()
    for j, c in enumerate(f32_cols):
        cols[c] = f32[j * cap:j * cap + n].copy()
    for j, c in enumerate(gen_cols):
        cols[c] = gen[j * cap:j * cap + n].copy()
    for j, c in enumerate(i64_cols):
        cols[c] = i64[j * cap:j * cap + n].copy()
    return SampleTable(cols)


def load_embeddings_native(path: str) -> Dict[int, np.ndarray]:
    """Embedding artifact loader (`id:f f ...`): C++ fast path."""
    from sparrowrecsys_tpu.embedding.artifacts import load_embeddings_csv

    lib = _load_lib()
    if lib is None:
        return load_embeddings_csv(path)
    dim = ctypes.c_int64(0)
    rows = lib.probe_embeddings(path.encode(), ctypes.byref(dim))
    if rows < 0:
        raise FileNotFoundError(path)
    if rows == 0 or dim.value == 0:
        return {}
    ids = np.empty(rows, np.int64)
    matrix = np.empty((rows, dim.value), np.float32)
    n = lib.load_embeddings(path.encode(), ids, matrix.reshape(-1), rows, dim.value)
    if n < 0:
        return load_embeddings_csv(path)
    return {int(ids[i]): matrix[i] for i in range(n)}
