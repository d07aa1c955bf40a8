"""Raw-frame -> device Sample glue: crop window on host (cheap integer
math), fused preprocessing on device, jit-cached per crop bucket.

Also provides `SyntheticPoseDataset`, an in-memory dataset over generated
frames with the same `get_raw` contract as the LineMOD/YCB loaders, used by
tests, smoke training, and benchmarks.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from plr2_tpu.data.bbox import get_bbox_from_mask
from plr2_tpu.data.preprocess import Sample, preprocess_crop
from plr2_tpu.data import synthetic as synth


def raw_to_sample(raw: Dict, key: jax.Array, num_points: int,
                  add_noise: bool = False, noise_trans: float = 0.03,
                  img_h: Optional[int] = None, img_w: Optional[int] = None) -> Sample:
    """Crop via reference bbox semantics, then run device preprocessing.

    jit recompiles once per distinct crop (h, w) bucket — bounded by the
    border list (SURVEY.md 'hard parts' (b))."""
    ih = img_h or raw["depth"].shape[0]
    iw = img_w or raw["depth"].shape[1]
    if raw.get("bbox") is not None:
        # explicit pre-snapped window — the PoseCNN eval protocol crops
        # from the DETECTION box (upstream get_bbox(posecnn_rois)), not
        # from the predicted mask (data/posecnn.py roi_bbox)
        rmin, rmax, cmin, cmax = raw["bbox"]
    else:
        # Upstream crops around the label mask alone (before depth-validity
        # intersection); loaders that distinguish the two pass `bbox_mask`.
        rmin, rmax, cmin, cmax = get_bbox_from_mask(
            raw.get("bbox_mask", raw["mask"]), ih, iw)
    intr = raw["intrinsics"]
    intr_vec = jnp.asarray([intr["cx"], intr["cy"], intr["fx"], intr["fy"],
                            intr["cam_scale"]], dtype=jnp.float32)
    return preprocess_crop(
        jnp.asarray(raw["color"][rmin:rmax, cmin:cmax]),
        jnp.asarray(raw["depth"][rmin:rmax, cmin:cmax], dtype=jnp.float32),
        jnp.asarray(raw["mask"][rmin:rmax, cmin:cmax]),
        jnp.asarray(rmin), jnp.asarray(cmin), intr_vec,
        jnp.asarray(raw["model_points"]),
        jnp.asarray(raw["target_r"]), jnp.asarray(raw["target_t"]),
        jnp.asarray(raw["obj_idx"], dtype=jnp.int32),
        key, num_points=num_points, add_noise=add_noise,
        noise_trans=noise_trans)


class SyntheticPoseDataset:
    """Generated frames with known poses; same get_raw contract as the real
    loaders. One sample per (frame, object)."""

    def __init__(self, num_frames: int = 8, num_objects: int = 3,
                 model_points: int = 500, num_points: int = 500,
                 seed: int = 0, img_h: int = 480, img_w: int = 640):
        self.num_points = num_points
        self.frames: List[synth.SyntheticFrame] = []
        self.models: Dict[int, np.ndarray] = {}
        self.items: List[Dict] = []
        for f in range(num_frames):
            frame, models = synth.make_scene(
                num_objects=num_objects, model_points=model_points,
                seed=seed * 1000 + f, img_h=img_h, img_w=img_w)
            self.models.update(models)
            fi = len(self.frames)
            self.frames.append(frame)
            for obj_id in frame.poses:
                self.items.append({"frame": fi, "obj": obj_id,
                                   "models": models})
        self.diameters = {
            obj_id - 1: float(np.linalg.norm(
                m.max(0) - m.min(0)))
            for obj_id, m in self.models.items()
        }

    def __len__(self) -> int:
        return len(self.items)

    def get_raw(self, i: int) -> Dict:
        it = self.items[i]
        frame = self.frames[it["frame"]]
        obj = it["obj"]
        r, t = frame.poses[obj]
        return dict(
            color=frame.color,
            depth=frame.depth.astype(np.float32),
            mask=(frame.label == obj) & (frame.depth > 0),
            target_r=r, target_t=t,
            model_points=it["models"][obj],
            obj_idx=obj - 1,  # 0-based class index
            intrinsics=frame.intrinsics,
        )


class SyntheticSceneDataset:
    """Scene dataset over a FIXED model library (config-5 journey,
    tools/journey_config5.py): every frame renders a random subset of the
    same `models` (1-based ids), so object identities persist across
    frames — the YCB-style regime where a 21-way per-object head can
    actually learn per-object features. Same `get_raw` contract as the
    real loaders plus `frames`/`models` for the full-pipeline evaluator
    (eval/full_pipeline.evaluate_full_pipeline consumes SyntheticFrame's
    color/depth/label/poses/intrinsics directly)."""

    def __init__(self, models: Dict[int, np.ndarray], num_frames: int,
                 objects_per_frame: int = 5, num_points: int = 1000,
                 seed: int = 0, img_h: int = 480, img_w: int = 640,
                 distinct_colors: bool = False):
        self.num_points = num_points
        self.models = dict(models)
        self.frames: List[synth.SyntheticFrame] = []
        self.items: List[Dict] = []
        rng = np.random.default_rng(seed)
        ids = np.asarray(sorted(models))
        # distinct_colors: well-separated HSV palette instead of the
        # id-hash colors whose near-collision pairs cap per-pixel
        # object-identity segmentation (synthetic.distinct_palette)
        palette = (synth.distinct_palette(int(ids.max()))
                   if distinct_colors else None)
        for f in range(num_frames):
            k = min(objects_per_frame, len(ids))
            visible = rng.choice(ids, size=k, replace=False)
            frame = synth.make_library_scene(
                self.models, sorted(int(i) for i in visible),
                seed=seed * 7919 + f, img_h=img_h, img_w=img_w,
                colors=palette)
            fi = len(self.frames)
            self.frames.append(frame)
            for obj_id in frame.poses:
                self.items.append({"frame": fi, "obj": obj_id})
        self.diameters = {
            obj_id - 1: float(np.linalg.norm(m.max(0) - m.min(0)))
            for obj_id, m in self.models.items()
        }

    def __len__(self) -> int:
        return len(self.items)

    def get_raw(self, i: int) -> Dict:
        it = self.items[i]
        frame = self.frames[it["frame"]]
        obj = it["obj"]
        r, t = frame.poses[obj]
        return dict(
            color=frame.color,
            depth=frame.depth.astype(np.float32),
            mask=(frame.label == obj) & (frame.depth > 0),
            target_r=r, target_t=t,
            model_points=self.models[obj],
            obj_idx=obj - 1,
            intrinsics=frame.intrinsics,
        )


def iterate_samples(dataset, key: jax.Array, num_points: int,
                    add_noise: bool = False, shuffle: bool = False,
                    seed: int = 0) -> Iterator[Sample]:
    """Single-sample iterator (the reference's batch-1 DataLoader shape)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in order:
        key, sub = jax.random.split(key)
        yield raw_to_sample(dataset.get_raw(int(i)), sub, num_points,
                            add_noise=add_noise)


def stack_samples(samples: List[Sample], crop: int) -> Sample:
    """Batch same-or-smaller crops into one fixed (crop, crop) batch.

    Crops are placed top-left in a zero canvas and `choose` indices are
    re-strided to the padded width — the batched TPU mode documented in
    data/preprocess.py (per-sample mode preserves reference fidelity).
    """
    out_img, out_choose = [], []
    for s in samples:
        h, w = s.img.shape[0], s.img.shape[1]
        if h > crop or w > crop:
            raise ValueError(f"crop {h}x{w} exceeds canvas {crop}")
        img = jnp.zeros((crop, crop, 3), s.img.dtype).at[:h, :w].set(s.img)
        rows, cols = s.choose // w, s.choose % w
        out_img.append(img)
        out_choose.append(rows * crop + cols)
    return Sample(
        points=jnp.stack([s.points for s in samples]),
        choose=jnp.stack(out_choose),
        img=jnp.stack(out_img),
        target=jnp.stack([s.target for s in samples]),
        model_points=jnp.stack([s.model_points for s in samples]),
        idx=jnp.stack([s.idx for s in samples]),
    )
