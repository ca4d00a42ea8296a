"""Feature-pipeline throughput: numpy (host) vs jitted device pipeline.

Two device modes:
- materialized: `build_samples_device` — full 27-column host SampleTable
  (pays the device->host transfer; drop-in for the numpy path).
- resident: `device_feature_columns` + one forced scalar read — the
  training-path mode, where columns stay on device for the trainer's
  device-resident epoch and never cross the host boundary.

    python tools/device_pipeline_bench.py [--events 5000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sparrowrecsys_tpu.data.device_pipeline import (
    build_samples_device,
    device_feature_columns,
)
from sparrowrecsys_tpu.data.feature_pipeline import build_samples
from sparrowrecsys_tpu.data.movielens import MovieCatalog
from sparrowrecsys_tpu.data.synthetic import SyntheticSpec, synthetic_ratings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--movies", type=int, default=27_000)
    ap.add_argument("--users", type=int, default=138_000)
    ap.add_argument("--skip-numpy", action="store_true")
    args = ap.parse_args()

    print("backend:", jax.devices()[0].platform, flush=True)
    ids = np.arange(1, args.movies + 1, dtype=np.int32)
    catalog = MovieCatalog(
        movie_ids=ids,
        titles=[f"Movie {i}" for i in ids],
        release_years=(1950 + ids % 70).astype(np.int32),
        genres=[["Action", "Drama"] if i % 2 else ["Comedy"] for i in ids],
        id_to_row={int(i): k for k, i in enumerate(ids)},
        genre_index={},
    )
    ratings = synthetic_ratings(
        SyntheticSpec(args.users, args.movies, args.events)
    )
    n = len(ratings)
    print(f"{n:,} events", flush=True)

    if not args.skip_numpy:
        t0 = time.perf_counter()
        t_host = build_samples(ratings, catalog)
        dt = time.perf_counter() - t0
        print(
            f"numpy host       {dt:7.1f} s  {n/dt/1e6:6.2f}M ev/s "
            f"({len(t_host):,} rows)",
            flush=True,
        )

    # compile (not timed — one-off per shape)
    t0 = time.perf_counter()
    cols = device_feature_columns(ratings, catalog)
    np.asarray(cols["label"][0])
    print(f"device compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cols = device_feature_columns(ratings, catalog)
        np.asarray(cols["label"][0])  # forced sync, columns stay on device
        best = min(best, time.perf_counter() - t0)
    print(
        f"device resident  {best:7.1f} s  {n/best/1e6:6.2f}M ev/s",
        flush=True,
    )

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        t_dev = build_samples_device(ratings, catalog)
        best = min(best, time.perf_counter() - t0)
    print(
        f"device material. {best:7.1f} s  {n/best/1e6:6.2f}M ev/s "
        f"({len(t_dev):,} rows)",
        flush=True,
    )


if __name__ == "__main__":
    main()
