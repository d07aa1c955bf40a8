from plr2_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from plr2_tpu.train.batch_trainer import BatchTrainer  # noqa: F401
from plr2_tpu.train.fused_trainer import FusedTrainer  # noqa: F401
from plr2_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    save_variables,
    load_variables,
)
