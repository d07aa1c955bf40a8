from plr2_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from plr2_tpu.train.checkpoint import CheckpointManager  # noqa: F401
