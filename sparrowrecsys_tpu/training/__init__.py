"""Training plane: jitted train/eval loops, checkpointing, metrics."""

from sparrowrecsys_tpu.training.loop import TrainResult, Trainer
