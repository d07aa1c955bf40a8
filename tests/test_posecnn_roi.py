"""PoseCNN ROI-bbox eval protocol (VERDICT round-2 next-steps #2).

The upstream tools/eval_ycb.py snaps each crop window from the PoseCNN
DETECTION box (`get_bbox(posecnn_rois)`) and iterates the detection list
[upstream, mount empty] — not the predicted-mask bbox over GT objects.
These tests drive evaluate_full_pipeline over synthetic .mat fixtures
where the two protocols provably differ (inflated ROI boxes), plus the
missing-detection (GT object absent from rois -> inf) and
extra-detection (rois class with no GT -> exported, never scored) cases.
"""

import os

import numpy as np
import jax
import pytest

from plr2_tpu.data import SyntheticPoseDataset
from plr2_tpu.data.bbox import get_bbox_from_mask
from plr2_tpu.data.posecnn import PoseCNNMasks, roi_bbox
from plr2_tpu.eval.full_pipeline import evaluate_full_pipeline
from plr2_tpu.pipeline import DenseFusionPipeline

N_PTS = 96
EXTRA_ID = 3  # class id detected by "PoseCNN" but absent from GT


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    ds = SyntheticPoseDataset(num_frames=2, num_objects=2, model_points=128,
                              num_points=N_PTS, seed=5)
    frames = list(ds.frames)
    models = dict(ds.models)
    models[EXTRA_ID] = models[sorted(models)[0]]

    results_dir = str(tmp_path_factory.mktemp("posecnn"))
    import scipy.io as sio

    meta = {}
    for fi, fr in enumerate(frames):
        h, w = fr.depth.shape
        labels = np.asarray(fr.label, np.int32).copy()
        rois = []
        gt_ids = sorted(fr.poses)
        for k, obj_id in enumerate(gt_ids):
            if fi == 0 and k == 0:
                meta["missing_id"] = obj_id  # PoseCNN missed this object
                continue
            rs, cs = np.nonzero(labels == obj_id)
            # inflate the detection box well past the tight mask bbox so
            # the ROI-snapped window provably differs from the mask window
            y1 = max(int(rs.min()) - 60, 0)
            y2 = min(int(rs.max()) + 60, h - 1)
            x1 = max(int(cs.min()) - 60, 0)
            x2 = min(int(cs.max()) + 60, w - 1)
            rois.append([0.0, float(obj_id), float(x1), float(y1),
                         float(x2), float(y2)])
            meta.setdefault("boxes", {})[(fi, obj_id)] = (x1, y1, x2, y2)
        if fi == 1:
            # extra detection: relabel half of the last GT object's pixels
            # as EXTRA_ID so the spurious class has valid mask pixels
            donor = gt_ids[-1]
            rs, cs = np.nonzero(labels == donor)
            half = len(rs) // 2
            labels[rs[:half], cs[:half]] = EXTRA_ID
            y1, y2 = int(rs[:half].min()), int(rs[:half].max())
            x1, x2 = int(cs[:half].min()), int(cs[:half].max())
            rois.append([0.0, float(EXTRA_ID), float(x1), float(y1),
                         float(x2), float(y2)])
        sio.savemat(os.path.join(results_dir, f"{fi:06d}.mat"),
                    {"labels": labels, "rois": np.asarray(rois, np.float64)})

    pipe = DenseFusionPipeline(num_points=N_PTS, num_objects=4,
                               use_pallas=False)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)
    return ds, frames, models, results_dir, pipe, variables, meta


def test_roi_bbox_differs_from_mask_bbox(setup):
    _, frames, _, results_dir, _, _, meta = setup
    masks = PoseCNNMasks(results_dir)
    fr = frames[1]
    h, w = fr.depth.shape
    dets = dict(masks.detections(1, h, w))
    for obj_id in sorted(fr.poses):
        mask_box = get_bbox_from_mask(
            np.asarray(masks.labels_for_frame(1)) == obj_id, h, w)
        assert dets[obj_id] != mask_box, (
            "inflated ROI snapped to the same window as the mask bbox — "
            "fixture does not discriminate the protocols")


def test_roi_bbox_matches_upstream_arithmetic(setup):
    """roi_bbox = snap_bbox((y1+1, y2-1, x1+1, x2-1)) — the upstream
    get_bbox(posecnn_rois) index convention."""
    from plr2_tpu.data.bbox import snap_bbox

    row = np.asarray([0.0, 2.0, 100.2, 50.7, 300.9, 200.1])
    got = roi_bbox(row, 480, 640)
    want = snap_bbox(50 + 1, 200 - 1, 100 + 1, 300 - 1, 480, 640)
    assert got == want


def test_full_pipeline_roi_protocol(setup):
    ds, frames, models, results_dir, pipe, variables, meta = setup
    res = evaluate_full_pipeline(
        pipe, variables, frames, models, sym_list=(1,),
        refine_iterations=1, seg_predict=PoseCNNMasks(results_dir),
        min_mask_pixels=20)

    missing = meta["missing_id"]
    # missing detection -> scored inf, counted lost
    assert res.lost_detections >= 1
    assert any(np.isinf(d) for d in res.per_object_distances[missing])
    # extra detection -> counted, exported, never scored
    assert res.extra_detections == 1
    assert EXTRA_ID not in res.per_object_distances
    assert EXTRA_ID in res.per_frame_poses[1]
    # every detected GT object is scored finite
    for fi, fr in enumerate(frames):
        for obj_id in fr.poses:
            if fi == 0 and obj_id == missing:
                continue
            assert obj_id in res.per_frame_poses[fi]
    # num_objects counts scored GT entries (incl. the inf), not extras
    n_gt = sum(len(f.poses) for f in frames)
    assert res.num_objects == n_gt


def test_roi_protocol_uses_detection_windows_not_mask(setup):
    """The same fixtures evaluated with a labels-only provider (mask-bbox
    protocol) must produce different distances for the objects whose ROI
    window was inflated — proof the ROI branch actually drives the crop."""
    ds, frames, models, results_dir, pipe, variables, meta = setup
    roi_res = evaluate_full_pipeline(
        pipe, variables, frames, models, sym_list=(1,),
        refine_iterations=1, seg_predict=PoseCNNMasks(results_dir),
        min_mask_pixels=20)

    class LabelsOnly:
        """Same predicted labels, no `detections` attr -> mask protocol."""
        def __init__(self, d):
            self._m = PoseCNNMasks(d)
            self._i = 0

        def reset(self):
            self._i = 0

        def __call__(self, color):
            lab = self._m.labels_for_frame(self._i)
            self._i += 1
            return lab

    mask_res = evaluate_full_pipeline(
        pipe, variables, frames, models, sym_list=(1,),
        refine_iterations=1, seg_predict=LabelsOnly(results_dir),
        min_mask_pixels=20)

    # compare an object detected in both protocols in frame 1
    obj = sorted(frames[1].poses)[0]
    roi_d = [d for d in roi_res.per_object_distances[obj] if np.isfinite(d)]
    mask_d = [d for d in mask_res.per_object_distances[obj] if np.isfinite(d)]
    assert roi_d and mask_d
    assert not np.allclose(roi_d[-1], mask_d[-1]), (
        "ROI-mode distance identical to mask-mode — the detection window "
        "was not consumed")
