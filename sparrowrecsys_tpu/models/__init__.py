"""The CTR/ranking model zoo (TPU-native rebuild of TFRecModel/).

Every model is a Flax module mapping a feature dict (int32/float32 arrays,
see `sparrowrecsys_tpu.data.dataset.EncodedDataset`) to logits [B]. The
registry mirrors the reference's seven training scripts
(`TFRecModel/src/com/sparrowrecsys/offline/tensorflow/*.py`).
"""

from __future__ import annotations

from typing import Callable, Dict

from sparrowrecsys_tpu.models.embedding_mlp import EmbeddingMLP
from sparrowrecsys_tpu.models.wide_deep import WideNDeep
from sparrowrecsys_tpu.models.neuralcf import NeuralCF, NeuralCFTwoTower
from sparrowrecsys_tpu.models.deepfm import DeepFM, DeepFMv2
from sparrowrecsys_tpu.models.din import DIN
from sparrowrecsys_tpu.models.dien import DIEN

#: name -> zero-arg constructor with reference-default hyperparameters.
MODEL_REGISTRY: Dict[str, Callable] = {
    "embedding_mlp": EmbeddingMLP,
    "wide_deep": WideNDeep,
    "neuralcf": NeuralCF,
    "neuralcf_two_tower": NeuralCFTwoTower,
    "deepfm": DeepFM,
    "deepfm_v2": DeepFMv2,
    "din": DIN,
    "dien": DIEN,
}


def build_model(name: str, **kwargs):
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)
