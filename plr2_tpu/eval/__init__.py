from plr2_tpu.eval.metrics import (  # noqa: F401
    add_distance,
    adds_distance,
    pose_distance,
    success_rate,
    compute_auc,
    accuracy_threshold_curve,
)
from plr2_tpu.eval.evaluator import evaluate, EvalResult  # noqa: F401
from plr2_tpu.eval.report import (  # noqa: F401
    save_distance_report,
    load_distance_report,
    distances_from_mat_dir,
    accuracy_table,
    format_accuracy_table,
    plot_accuracy_curves,
)
from plr2_tpu.eval.segment import (  # noqa: F401
    write_segnet_results,
    segnet_predictor,
)
