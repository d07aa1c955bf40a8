"""Config-5 full-pipeline test: seg-mask (GT and SegNet) -> batched
multi-object DenseFusion + 4-iter refine + .mat export, on synthetic
frames."""

import numpy as np
import jax

from plr2_tpu.data.synthetic import make_scene
from plr2_tpu.eval.full_pipeline import evaluate_full_pipeline, segment_frame
from plr2_tpu.pipeline import DenseFusionPipeline


def test_full_pipeline_gt_masks(tmp_path):
    frames, models_list = [], []
    all_models = {}
    for s in range(2):
        frame, models = make_scene(num_objects=2, model_points=128, seed=s)
        frames.append(frame)
        all_models.update(models)

    pipe = DenseFusionPipeline(num_points=96, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)
    res = evaluate_full_pipeline(
        pipe, variables, frames, all_models, sym_list=(),
        refine_iterations=4, num_points=96,
        save_mat_dir=str(tmp_path / "mats"))
    assert res.num_frames == 2
    assert res.num_objects >= 2
    assert 0 <= res.auc <= 100
    assert np.isfinite(res.mean_distance)
    # .mat export readable and well-formed
    import scipy.io as sio
    mats = sorted((tmp_path / "mats").glob("*.mat"))
    assert len(mats) == 2
    m = sio.loadmat(str(mats[0]))
    assert m["poses"].shape[1] == 7
    q = m["poses"][:, :4]
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)


def test_full_pipeline_with_segnet_masks():
    from plr2_tpu.train.seg_trainer import SegTrainer

    frame, models = make_scene(num_objects=2, model_points=400, seed=3)
    trainer = SegTrainer(num_classes=4, crop=96, batch=2, lr=5e-3)
    state = trainer.init_state(jax.random.key(0))
    # train on object-centred crops (random windows of a 480x640 frame are
    # almost all background; the real driver trains on full YCB frames for
    # hundreds of epochs)
    import types
    crops = []
    for obj_id in frame.poses:
        rows, cols = np.nonzero(frame.label == obj_id)
        r0 = int(np.clip(rows.mean() - 48, 0, frame.label.shape[0] - 96))
        c0 = int(np.clip(cols.mean() - 48, 0, frame.label.shape[1] - 96))
        crops.append(types.SimpleNamespace(
            color=frame.color[r0:r0 + 96, c0:c0 + 96],
            label=frame.label[r0:r0 + 96, c0:c0 + 96]))
    for e in range(40):
        state = trainer.train_epoch(state, crops, seed=e)

    pred = segment_frame(trainer, state, frame.color)
    gt_fg = frame.label > 0
    # recall on object pixels: the segmenter must find the objects (some
    # background false positives elsewhere in the frame are fine for the
    # crop mechanism, which needs per-object blobs, not perfect masks)
    recall = (pred[gt_fg] == frame.label[gt_fg]).mean()
    assert recall > 0.5, recall

    pipe = DenseFusionPipeline(num_points=96, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)
    res = evaluate_full_pipeline(
        pipe, variables, [frame], models, sym_list=(),
        refine_iterations=2, num_points=96,
        seg_predict=lambda color: segment_frame(trainer, state, color))
    assert res.num_frames == 1
    # at least one object found through the predicted masks
    assert res.num_objects >= 1


def test_predicted_mask_bbox_ignores_stray_blob():
    """Predicted-mask protocol (upstream mask_to_bbox parity, same as
    tools/eval_linemod.py --segnet_results): the crop window snaps from
    the LARGEST connected blob of the predicted label. A stray
    false-positive blob in a far corner (over background, depth 0 — so
    point sampling is untouched either way) must leave the result
    bit-identical to the GT-mask run; without the blob rule the bbox
    spans both blobs and the crop geometry (hence the pose) changes."""
    frame, models = make_scene(num_objects=1, model_points=128, seed=21)
    pipe = DenseFusionPipeline(num_points=96, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)

    noisy = frame.label.copy()
    # far-corner stray blob of the same object id, over empty background
    assert frame.depth[:12, :12].max() == 0
    noisy[2:10, 2:10] = 1

    clean = frame.label.copy()
    ref = evaluate_full_pipeline(
        pipe, variables, [frame], models, sym_list=(),
        refine_iterations=2, num_points=96,
        seg_predict=lambda color: clean)
    res = evaluate_full_pipeline(
        pipe, variables, [frame], models, sym_list=(),
        refine_iterations=2, num_points=96,
        seg_predict=lambda color: noisy)
    assert res.lost_detections == 0
    np.testing.assert_array_equal(
        np.asarray(res.per_object_distances[1]),
        np.asarray(ref.per_object_distances[1]))


def test_pspnet_segmenter_arch_trains():
    """build_segmenter('pspnet') (light serving segmenter) runs through the
    same SegTrainer: BN stats + dropout rng handled, loss decreases."""
    import types

    from plr2_tpu.train.seg_trainer import SegTrainer

    frame, _ = make_scene(num_objects=2, model_points=200, seed=5)
    trainer = SegTrainer(num_classes=4, crop=64, batch=2, lr=5e-4,
                         arch="pspnet")
    state = trainer.init_state(jax.random.key(0))
    crops = []
    for obj_id in frame.poses:
        rows, cols = np.nonzero(frame.label == obj_id)
        r0 = int(np.clip(rows.mean() - 32, 0, frame.label.shape[0] - 64))
        c0 = int(np.clip(cols.mean() - 32, 0, frame.label.shape[1] - 64))
        crops.append(types.SimpleNamespace(
            color=frame.color[r0:r0 + 64, c0:c0 + 64],
            label=frame.label[r0:r0 + 64, c0:c0 + 64]))
    state = trainer.train_epoch(state, crops, seed=0)
    first = state["last_epoch_loss"]
    for e in range(1, 6):
        state = trainer.train_epoch(state, crops, seed=e)
    assert np.isfinite(state["last_epoch_loss"])
    assert state["last_epoch_loss"] < first


def test_lost_detection_scored_as_failure(tmp_path):
    """A GT object the segmenter misses is scored distance=inf (toolbox
    semantics: failures in AUC/<2cm, excluded from the mean) in BOTH the
    host and device pipeline modes, and the offline .mat re-evaluation
    reproduces the same accounting."""
    from plr2_tpu.eval.report import distances_from_mat_dir

    frame, models = make_scene(num_objects=2, model_points=128, seed=11)
    lost_id = max(frame.poses)

    def seg(color):
        lab = frame.label.copy()
        lab[lab == lost_id] = 0
        return lab

    pipe = DenseFusionPipeline(num_points=96, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)
    kwargs = dict(sym_list=(), refine_iterations=2, num_points=96)

    full = evaluate_full_pipeline(pipe, variables, [frame], models, **kwargs)
    assert full.lost_detections == 0 and full.num_objects == 2

    res = evaluate_full_pipeline(pipe, variables, [frame], models,
                                 seg_predict=seg,
                                 save_mat_dir=str(tmp_path / "mats"),
                                 **kwargs)
    assert res.lost_detections == 1
    assert res.num_objects == 2  # lost object still counted in the protocol
    assert np.isinf(res.per_object_distances[lost_id][0])
    assert np.isfinite(res.mean_distance)  # mean over detected only

    dev = evaluate_full_pipeline(pipe, variables, [frame], models,
                                 seg_predict=seg, device_pipeline=True,
                                 **kwargs)
    assert dev.lost_detections == 1 and dev.num_objects == 2
    assert np.isinf(dev.per_object_distances[lost_id][0])

    # offline re-eval of the saved .mat dump: the missing object comes
    # back as inf, the detected one as its finite distance
    recomputed = distances_from_mat_dir(str(tmp_path / "mats"), [frame],
                                        models, sym_list=())
    assert np.isinf(recomputed[lost_id][0])
    detected = min(frame.poses)
    np.testing.assert_allclose(recomputed[detected][0],
                               res.per_object_distances[detected][0],
                               rtol=1e-5)
