from plr2_tpu.losses.add_loss import pose_loss, PoseLossOut, transform_hypotheses  # noqa: F401
from plr2_tpu.losses.refine_loss import refine_loss, RefineLossOut  # noqa: F401
