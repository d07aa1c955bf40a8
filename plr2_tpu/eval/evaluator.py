"""Evaluation drivers — the reference's tools/eval_linemod.py and
tools/eval_ycb.py (SURVEY.md sections 3.2/3.3) re-built over the jitted
pipeline: per sample, run PoseNet + on-device refinement, measure ADD(-S)
against the ground-truth-posed model points, aggregate per object.

LineMOD protocol: success = dis < 0.1 * object diameter (ADD; ADD-S for
symmetric objects). YCB protocol: ADD-S AUC (<0.1 m) and <2 cm rate over
all (frame, object) samples.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from plr2_tpu.data.loader import raw_to_sample
from plr2_tpu.eval.metrics import compute_auc, pose_distance, success_rate
from plr2_tpu.pipeline import DenseFusionPipeline


@dataclass
class EvalResult:
    per_object_success: Dict[int, float] = field(default_factory=dict)
    per_object_auc: Dict[int, float] = field(default_factory=dict)
    # raw ADD(-S) distances per object id — the input to the offline
    # accuracy report/curves (eval/report.py, --save_distances)
    per_object_distances: Dict[int, List[float]] = field(default_factory=dict)
    mean_success: float = 0.0
    auc: float = 0.0
    under_2cm: float = 0.0
    mean_distance: float = 0.0
    num_samples: int = 0
    # Samples whose (predicted) mask had no valid pixels — the upstream
    # eval's "NOT Pass! Lost detection!" path, which skips the sample
    # entirely (excluded from both numerator and denominator).
    lost_detections: int = 0


def _estimate_sample(pipe, variables, s, refine_iterations):
    est = pipe.estimate(
        variables,
        s.img[None], s.points[None], s.choose[None], s.idx[None],
        refine_iterations=refine_iterations)
    return est.quat[0], est.trans[0]


def evaluate(
    pipe: DenseFusionPipeline,
    variables,
    dataset,
    sym_list: Tuple[int, ...],
    refine_iterations: int = 2,
    diameters: Optional[Dict[int, float]] = None,
    num_points: Optional[int] = None,
    max_samples: Optional[int] = None,
    seed: int = 0,
    batch_size: int = 1,
    crop_canvas: int = 240,
) -> EvalResult:
    """Run the full eval protocol over `dataset` (any get_raw provider).

    batch_size 1 is the reference-faithful per-crop mode (one jit program
    per border-list bucket); batch_size > 1 pads crops onto a shared canvas
    and runs the estimate+refine program batched (throughput mode)."""
    n_pts = num_points or pipe.num_points
    key = jax.random.key(seed)
    dists: List[float] = []
    per_obj: Dict[int, List[float]] = {}

    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    pending: List[Tuple[int, object]] = []

    def flush():
        nonlocal pending
        if not pending:
            return
        from plr2_tpu.data.loader import stack_samples
        objs = [o for o, _ in pending]
        ss = [s for _, s in pending]
        canvas = max([crop_canvas] + [max(s.img.shape[0], s.img.shape[1])
                                      for s in ss])
        batch = stack_samples(ss, crop=canvas)
        est = pipe.estimate(variables, batch.img, batch.points, batch.choose,
                            batch.idx, refine_iterations=refine_iterations)
        for bi, obj in enumerate(objs):
            dis = float(pose_distance(
                batch.model_points[bi], est.quat[bi], est.trans[bi],
                batch.target[bi], symmetric=obj in sym_list))
            dists.append(dis)
            per_obj.setdefault(obj, []).append(dis)
        pending = []

    lost = 0
    for i in range(n):
        raw = dataset.get_raw(i)
        if raw.get("lost"):
            lost += 1
            continue
        key, sub = jax.random.split(key)
        s = raw_to_sample(raw, sub, n_pts, add_noise=False)
        obj = int(raw["obj_idx"])
        if batch_size > 1:
            pending.append((obj, s))
            if len(pending) >= batch_size:
                flush()
            continue
        q, t = _estimate_sample(pipe, variables, s, refine_iterations)
        dis = float(pose_distance(s.model_points, q, t, s.target,
                                  symmetric=obj in sym_list))
        dists.append(dis)
        per_obj.setdefault(obj, []).append(dis)
    flush()

    result = EvalResult(num_samples=len(dists), lost_detections=lost)
    if not dists:
        return result
    result.mean_distance = float(np.mean(dists))
    result.auc = compute_auc(dists)
    result.under_2cm = success_rate(dists, 0.02)
    result.per_object_auc = {obj: compute_auc(d) for obj, d in per_obj.items()}
    result.per_object_distances = per_obj
    if diameters:
        succ = {
            obj: success_rate(d, 0.1 * diameters.get(obj, 0.1))
            for obj, d in per_obj.items()
        }
        result.per_object_success = succ
        result.mean_success = float(np.mean(list(succ.values())))
    return result
