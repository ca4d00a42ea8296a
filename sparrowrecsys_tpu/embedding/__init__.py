"""Embedding pretraining plane: item2vec, DeepWalk, user embeddings, LSH.

TPU-native rebuild of `offline/spark/embedding/Embedding.scala` (and the
PySpark mirror): Spark MLlib Word2Vec becomes a jitted skip-gram with
negative sampling; driver-side random walks become on-device vectorized
categorical sampling; user embeddings become a segment-mean.
"""

from sparrowrecsys_tpu.embedding.item2vec import (
    Item2VecConfig,
    build_item_sequences,
    skipgram_pairs,
    train_item2vec,
)
from sparrowrecsys_tpu.embedding.deepwalk import (
    DeepWalkConfig,
    transition_matrix,
    random_walks,
    train_deepwalk,
)
from sparrowrecsys_tpu.embedding.user_emb import generate_user_emb
from sparrowrecsys_tpu.embedding.lsh import LSHIndex
from sparrowrecsys_tpu.embedding.artifacts import (
    load_embeddings_csv,
    write_embeddings_csv,
)
