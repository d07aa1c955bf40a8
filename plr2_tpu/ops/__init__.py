from plr2_tpu.ops.knn import (  # noqa: F401
    pairwise_sq_dist,
    nn_distance_xla,
    nn_index,
    chamfer_min_distance,
)
