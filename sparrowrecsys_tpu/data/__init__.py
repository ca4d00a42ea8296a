from sparrowrecsys_tpu.data.schema import SAMPLE_COLUMNS, SampleTable
from sparrowrecsys_tpu.data.movielens import (
    load_movies,
    load_links,
    load_ratings,
    ratings_from_samples_csv,
)
from sparrowrecsys_tpu.data.feature_pipeline import build_samples, split_samples
from sparrowrecsys_tpu.data.dataset import EncodedDataset, encode_samples

__all__ = [
    "SAMPLE_COLUMNS",
    "SampleTable",
    "load_movies",
    "load_links",
    "load_ratings",
    "ratings_from_samples_csv",
    "build_samples",
    "split_samples",
    "EncodedDataset",
    "encode_samples",
]
