"""Encoder training: contrastive (InfoNCE) fine-tuning with DP+TP
sharding. New capability (the reference has no training at all); needed
to adapt BGE-class embedders to a corpus and to exercise the multi-chip
path end to end."""

from .contrastive import TrainState, make_train_step, shard_params  # noqa: F401
