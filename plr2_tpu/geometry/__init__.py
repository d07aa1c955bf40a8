from plr2_tpu.geometry.quaternion import (  # noqa: F401
    normalize_quaternion,
    quat_to_matrix_df,
    quat_to_matrix,
    matrix_to_quat,
    quat_multiply,
)
from plr2_tpu.geometry.pointcloud import (  # noqa: F401
    backproject_depth,
    transform_points,
    compose_pose,
)
from plr2_tpu.geometry import transformations  # noqa: F401
