from plr2_tpu.data.bbox import BORDER_LIST, get_bbox_from_mask, snap_bbox  # noqa: F401
from plr2_tpu.data.preprocess import (  # noqa: F401
    Sample,
    preprocess_crop,
    sample_choose,
    normalize_image,
    color_jitter,
)
from plr2_tpu.data.loader import (  # noqa: F401
    raw_to_sample,
    SyntheticPoseDataset,
    SyntheticSceneDataset,
    iterate_samples,
    stack_samples,
)
from plr2_tpu.data.linemod import LinemodDataset  # noqa: F401
from plr2_tpu.data.ycb import YCBDataset  # noqa: F401
