"""Full-pipeline driver (BASELINE config 5): segmentation-mask crop +
DenseFusion + 4-iter refinement, batched multi-object evaluation.

The reference's equivalent chain is PoseCNN-or-SegNet masks -> per-object
NumPy crop -> PoseNet -> host-side refine loop (tools/eval_ycb.py,
SURVEY.md section 3.2). Here the segmenter runs on device, every detected
object's crop goes through the fused preprocessing, and all objects of a
frame are estimated as ONE batch through the single-jit estimate+refine
program. Optionally exports per-frame poses as .mat files compatible with
the YCB toolbox ('poses' (K, 7) [wxyz quat | xyz trans] rows).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plr2_tpu.data.loader import raw_to_sample
from plr2_tpu.data.loader import stack_samples
from plr2_tpu.eval.metrics import compute_auc, pose_distance, success_rate
from plr2_tpu.pipeline import DenseFusionPipeline


@dataclass
class FullPipelineResult:
    auc: float = 0.0
    under_2cm: float = 0.0
    mean_distance: float = 0.0        # over detected objects (finite dis)
    num_objects: int = 0              # scored GT objects incl. lost ones
    num_frames: int = 0
    # GT objects whose mask the segmenter missed (or was below the pixel
    # floor): scored as distance=inf — the YCB toolbox counts undetected
    # GT objects as failures in the AUC/threshold curves (upstream
    # replace_ycb_toolbox/evaluate_poses_keyframe.m [upstream, mount
    # empty]); silently dropping them would inflate AUC under predicted
    # (PoseCNN/SegNet) masks
    lost_detections: int = 0
    # ROI mode only: PoseCNN detections of classes with no GT pose in the
    # frame — estimated and exported (the upstream dump carries every
    # detection row) but never scored (the toolbox matches on GT ids)
    extra_detections: int = 0
    per_frame_poses: List[Dict] = field(default_factory=list)
    # raw ADD(-S) distances per object id — input to eval/report.py
    per_object_distances: Dict[int, List[float]] = field(default_factory=dict)


def segment_frame(seg_trainer, seg_state, color: np.ndarray) -> np.ndarray:
    """Predict a label map with the trained SegNet."""
    norm = (jnp.asarray(color[None], jnp.float32) / 255.0 - 0.5) / 0.5
    return np.asarray(seg_trainer.predict(seg_state["variables"], norm)[0])


def ycb_frames_and_models(ds, max_frames: Optional[int] = None):
    """YCBDataset -> (frames, models) in this module's contract: frame
    objects with 1-based label-id pose dicts, and a 1-based id -> model
    points map. Shared by the live eval CLI and the offline re-evaluation
    (tools/plot_accuracy.py) so both see identical ground truth."""
    import types

    frames, models = [], {}
    n = len(ds) if max_frames is None else min(len(ds), max_frames)
    for i in range(n):
        fr = ds.get_frame(i)
        poses = {oid + 1: (o["target_r"], o["target_t"])
                 for oid, o in fr["objects"].items()}
        frames.append(types.SimpleNamespace(
            color=fr["color"], depth=fr["depth"], label=fr["label"],
            poses=poses, intrinsics=fr["intrinsics"]))
        for oid in fr["objects"]:
            models[oid + 1] = ds.model_points[oid]
    return frames, models


def evaluate_full_pipeline(
    pipe: DenseFusionPipeline,
    variables,
    frames,                      # SyntheticFrame-likes: color/depth/label/poses/intrinsics
    models: Dict[int, np.ndarray],
    sym_list: Tuple[int, ...],
    refine_iterations: int = 4,
    seg_predict=None,            # None -> use GT labels (PoseCNN-mask mode)
    crop_canvas: int = 240,
    num_points: Optional[int] = None,
    min_mask_pixels: int = 50,
    save_mat_dir: str = "",
    device_pipeline: bool = False,  # run the single-jit frame program
    seg_variables=None,             # with device_pipeline: SegNet inside it
    seg_model=None,
) -> FullPipelineResult:
    if device_pipeline:
        return _evaluate_device_pipeline(
            pipe, variables, frames, models, sym_list, refine_iterations,
            seg_predict, crop_canvas, num_points, min_mask_pixels,
            save_mat_dir, seg_model, seg_variables)
    n_pts = num_points or pipe.num_points
    # sequential mask providers (PoseCNNMasks) track frame order internally
    if seg_predict is not None and hasattr(seg_predict, "reset"):
        seg_predict.reset()
    # PoseCNN results with `rois` switch the protocol to the upstream
    # eval_ycb iteration: crop windows snap from the DETECTION box
    # (get_bbox(posecnn_rois) [upstream, mount empty]) and the per-frame
    # unit is the detection list, not the GT object list
    use_rois = seg_predict is not None and hasattr(seg_predict, "detections")
    key = jax.random.key(0)
    dists: List[float] = []
    result = FullPipelineResult()

    def _lost(obj_id):
        dists.append(float("inf"))
        result.per_object_distances.setdefault(obj_id, []).append(
            float("inf"))
        result.lost_detections += 1

    for fi, frame in enumerate(frames):
        label = (seg_predict(frame.color) if seg_predict is not None
                 else frame.label)
        img_h, img_w = frame.depth.shape
        det_map = None
        if use_rois:
            dets = seg_predict.detections(fi, img_h, img_w)
            if dets is not None:
                det_map = {}
                for obj_id, box in dets:
                    det_map.setdefault(obj_id, box)
        samples, objs = [], []

        frame_key = jax.random.fold_in(key, fi)

        def _queue(obj_id, mask, r_gt, t_gt, bbox, scored):
            raw = dict(
                color=frame.color, depth=frame.depth.astype(np.float32),
                mask=mask, target_r=r_gt, target_t=t_gt,
                model_points=models[obj_id], obj_idx=obj_id - 1,
                intrinsics=frame.intrinsics, bbox=bbox)
            if seg_predict is not None and bbox is None:
                # predicted-mask protocol (upstream mask_to_bbox, same as
                # tools/eval_linemod.py --segnet_results): the crop window
                # snaps from the LARGEST connected blob of the predicted
                # label, so stray false-positive pixels elsewhere in the
                # frame cannot inflate the bbox; the depth-intersected
                # mask above still drives point sampling
                from plr2_tpu.data.linemod import largest_component_mask

                raw["bbox_mask"] = largest_component_mask(label == obj_id)
            # (frame, object-id)-derived key — the same derivation the
            # device pipeline uses (serving.py _frame_samples), so the
            # stochastic subsample path stays bit-exact host==device
            sub = jax.random.fold_in(frame_key, obj_id)
            samples.append(raw_to_sample(raw, sub, n_pts, add_noise=False))
            objs.append((obj_id, scored))

        if det_map is not None:
            for obj_id, (r_gt, t_gt) in frame.poses.items():
                box = det_map.get(obj_id)
                if box is None:  # GT object PoseCNN never detected
                    _lost(obj_id)
                    continue
                mask = (label == obj_id) & (frame.depth > 0)
                rmin, rmax, cmin, cmax = box
                # the upstream lost-detection check counts valid mask
                # pixels INSIDE the detection window
                if mask[rmin:rmax, cmin:cmax].sum() < min_mask_pixels:
                    _lost(obj_id)
                    continue
                _queue(obj_id, mask, r_gt, t_gt, box, scored=True)
            for obj_id, box in det_map.items():
                if obj_id in frame.poses:
                    continue
                result.extra_detections += 1
                if obj_id not in models:
                    continue  # no mesh to estimate against
                mask = (label == obj_id) & (frame.depth > 0)
                rmin, rmax, cmin, cmax = box
                if mask[rmin:rmax, cmin:cmax].sum() < min_mask_pixels:
                    continue
                _queue(obj_id, mask,
                       np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32), box, scored=False)
        else:
            for obj_id, (r_gt, t_gt) in frame.poses.items():
                mask = (label == obj_id) & (frame.depth > 0)
                if mask.sum() < min_mask_pixels:
                    _lost(obj_id)
                    continue
                _queue(obj_id, mask, r_gt, t_gt, None, scored=True)
        if not samples:
            # no detected object in this frame — mirror the device mode:
            # empty poses entry (lost GT objects were scored inf above)
            result.per_frame_poses.append({})
            result.num_frames += 1
            if save_mat_dir:
                import scipy.io as sio
                os.makedirs(save_mat_dir, exist_ok=True)
                sio.savemat(os.path.join(save_mat_dir, f"{fi:06d}.mat"),
                            {"poses": np.zeros((0, 7)),
                             "cls_indexes": np.zeros((0,), np.int32)})
            continue

        # auto-grow the canvas for oversized (e.g. noisy-mask) crops; the
        # border-list snapping keeps the number of distinct jit buckets small
        canvas = max([crop_canvas] + [max(s.img.shape[0], s.img.shape[1])
                                      for s in samples])
        batch = stack_samples(samples, crop=canvas)
        est = pipe.estimate(variables, batch.img, batch.points, batch.choose,
                            batch.idx, refine_iterations=refine_iterations)

        frame_poses = {}
        for bi, (obj_id, scored) in enumerate(objs):
            if scored:
                dis = float(pose_distance(
                    batch.model_points[bi], est.quat[bi], est.trans[bi],
                    batch.target[bi], symmetric=(obj_id - 1) in sym_list))
                dists.append(dis)
                result.per_object_distances.setdefault(obj_id, []).append(dis)
            frame_poses[obj_id] = np.concatenate(
                [np.asarray(est.quat[bi]), np.asarray(est.trans[bi])])
        result.per_frame_poses.append(frame_poses)
        result.num_frames += 1

        if save_mat_dir:
            import scipy.io as sio
            os.makedirs(save_mat_dir, exist_ok=True)
            sio.savemat(
                os.path.join(save_mat_dir, f"{fi:06d}.mat"),
                {"poses": np.stack(list(frame_poses.values()))
                 if frame_poses else np.zeros((0, 7)),
                 "cls_indexes": np.asarray(list(frame_poses), np.int32)})

    result.num_objects = len(dists)
    if dists:
        # AUC / <2cm include lost detections (inf) as failures; the mean
        # is over detected objects so it stays a meaningful distance
        result.auc = compute_auc(dists)
        result.under_2cm = success_rate(dists, 0.02)
        finite = [d for d in dists if np.isfinite(d)]
        result.mean_distance = float(np.mean(finite)) if finite else float("inf")
    return result


def _evaluate_device_pipeline(pipe, variables, frames, models, sym_list,
                              refine_iterations, seg_predict, crop_canvas,
                              num_points, min_mask_pixels, save_mat_dir,
                              seg_model, seg_variables) -> FullPipelineResult:
    """The same protocol through the single-jit frame program
    (plr2_tpu/serving.py): one XLA dispatch per frame instead of a host
    crop/stack round-trip per object. Object slots are padded to the max
    per-frame object count so every frame reuses one compiled program."""
    from plr2_tpu.serving import FrameEstimator

    frames = list(frames)
    result = FullPipelineResult()
    if not frames:
        return result
    k_slots = max(len(f.poses) for f in frames)
    h, w = frames[0].depth.shape
    fe = FrameEstimator(pipe, canvas=crop_canvas, img_h=h, img_w=w,
                        refine_iterations=refine_iterations,
                        min_mask_pixels=min_mask_pixels, seg_model=seg_model)
    if seg_predict is not None and hasattr(seg_predict, "reset"):
        seg_predict.reset()
    key = jax.random.key(0)
    dists: List[float] = []

    for fi, frame in enumerate(frames):
        label = (seg_predict(frame.color) if seg_predict is not None
                 else frame.label)
        obj_ids = sorted(frame.poses)
        if not obj_ids:
            result.num_frames += 1
            result.per_frame_poses.append({})
            continue
        pad = k_slots - len(obj_ids)
        oid = np.asarray(obj_ids + [0] * pad, np.int32)
        mps = np.stack([models[o] for o in obj_ids]
                       + [models[obj_ids[0]]] * pad)
        tr = np.stack([frame.poses[o][0] for o in obj_ids]
                      + [np.eye(3, dtype=np.float32)] * pad)
        tt = np.stack([frame.poses[o][1] for o in obj_ids]
                      + [np.zeros(3, np.float32)] * pad)
        intr = jnp.asarray([frame.intrinsics[k] for k in
                            ("cx", "cy", "fx", "fy", "cam_scale")],
                           jnp.float32)
        # frame-index-derived key; the frame program folds it per object
        # id, matching the host mode's derivation exactly
        sub = jax.random.fold_in(key, fi)
        poses, samples = fe.run_with_samples(
            variables, jnp.asarray(frame.color),
            jnp.asarray(frame.depth, jnp.float32),
            jnp.asarray(label, jnp.int32), jnp.asarray(oid),
            jnp.asarray(mps), intr, sub, seg_variables=seg_variables,
            target_r=jnp.asarray(tr), target_t=jnp.asarray(tt))

        valid = np.asarray(poses.valid)
        frame_poses = {}
        for bi, obj_id in enumerate(obj_ids):
            if not valid[bi]:
                dists.append(float("inf"))
                result.per_object_distances.setdefault(obj_id, []).append(
                    float("inf"))
                result.lost_detections += 1
                continue
            dis = float(pose_distance(
                samples.model_points[bi], poses.quat[bi], poses.trans[bi],
                samples.target[bi], symmetric=(obj_id - 1) in sym_list))
            dists.append(dis)
            result.per_object_distances.setdefault(obj_id, []).append(dis)
            frame_poses[obj_id] = np.concatenate(
                [np.asarray(poses.quat[bi]), np.asarray(poses.trans[bi])])
        result.per_frame_poses.append(frame_poses)
        result.num_frames += 1

        if save_mat_dir:
            import scipy.io as sio
            os.makedirs(save_mat_dir, exist_ok=True)
            sio.savemat(
                os.path.join(save_mat_dir, f"{fi:06d}.mat"),
                {"poses": np.stack(list(frame_poses.values()))
                 if frame_poses else np.zeros((0, 7)),
                 "cls_indexes": np.asarray(list(frame_poses), np.int32)})

    result.num_objects = len(dists)
    if dists:
        # AUC / <2cm include lost detections (inf) as failures; the mean
        # is over detected objects so it stays a meaningful distance
        result.auc = compute_auc(dists)
        result.under_2cm = success_rate(dists, 0.02)
        finite = [d for d in dists if np.isfinite(d)]
        result.mean_distance = float(np.mean(finite)) if finite else float("inf")
    return result
