"""Predicted-mask generation for LineMOD evaluation.

The reference's tools/eval_linemod.py consumes precomputed SegNet masks
from `Linemod_preprocessed/segnet_results/{obj:02d}_label/{frame:04d}_label.png`
(pixel==255 -> object) [upstream datasets/linemod/dataset.py mode=='eval',
mount empty]. The upstream repo ships those files pre-rendered; here the
in-repo SegNet (plr2_tpu/models/segnet.py) produces them via
`write_segnet_results`, so the full predicted-mask eval protocol runs
end-to-end without external artifacts.

Class convention for LineMOD SegNet: class 0 = background, class k =
objlist position k-1 (so 14 classes for the full 13-object list).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional

import numpy as np


def write_segnet_results(
    dataset_root: str,
    out_dir: str,
    predict_labels: Callable[[np.ndarray], np.ndarray],
    objlist: Optional[List[int]] = None,
    split: str = "test",
) -> int:
    """Render predicted masks for every frame in the split files into the
    upstream segnet_results layout.

    `predict_labels(color_hwc_uint8) -> (H, W) int labels` where label
    objlist.index(obj)+1 marks object pixels. Returns the number of masks
    written."""
    from PIL import Image

    from plr2_tpu.data.linemod import OBJLIST

    objlist = objlist or OBJLIST
    written = 0
    for obj in objlist:
        obj_dir = os.path.join(dataset_root, "data", f"{obj:02d}")
        split_file = os.path.join(obj_dir, f"{split}.txt")
        if not os.path.exists(split_file):
            continue
        with open(split_file) as f:
            frames = [int(l.strip()) for l in f if l.strip()]
        label_dir = os.path.join(out_dir, f"{obj:02d}_label")
        os.makedirs(label_dir, exist_ok=True)
        cls = objlist.index(obj) + 1
        for fr in frames:
            color = np.asarray(Image.open(
                os.path.join(obj_dir, "rgb", f"{fr:04d}.png")).convert("RGB"))
            labels = np.asarray(predict_labels(color))
            mask = (labels == cls).astype(np.uint8) * 255
            Image.fromarray(mask).save(
                os.path.join(label_dir, f"{fr:04d}_label.png"))
            written += 1
    return written


def segnet_predictor(variables, num_classes: int = 14, arch: str = "segnet"):
    """Wrap a trained in-repo segmenter into the predict_labels callable.

    Normalization matches SegTrainer.train_epoch ((x/255 - 0.5) / 0.5)."""
    import jax.numpy as jnp

    from plr2_tpu.train.seg_trainer import SegTrainer

    trainer = SegTrainer(num_classes=num_classes, arch=arch)

    def predict(color: np.ndarray) -> np.ndarray:
        x = (jnp.asarray(color, jnp.float32) / 255.0 - 0.5) / 0.5
        return np.asarray(trainer.predict(variables, x[None])[0])

    return predict
