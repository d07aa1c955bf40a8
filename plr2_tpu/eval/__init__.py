from plr2_tpu.eval.metrics import (  # noqa: F401
    add_distance,
    adds_distance,
    pose_distance,
    success_rate,
    compute_auc,
    accuracy_threshold_curve,
)
from plr2_tpu.eval.evaluator import evaluate, EvalResult  # noqa: F401
from plr2_tpu.eval.segment import (  # noqa: F401
    write_segnet_results,
    segnet_predictor,
)
