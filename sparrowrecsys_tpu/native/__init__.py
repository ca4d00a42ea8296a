"""Native (C++) data-plane accelerators with pure-Python fallbacks."""

from sparrowrecsys_tpu.native.loader import (
    load_embeddings_native,
    load_ratings_native,
    load_samples_native,
    native_available,
)
