"""Exercise the REAL LineMOD / YCB dataset loaders end-to-end by writing
miniature on-disk datasets in the exact upstream directory layouts
(synthetic frames rendered with known poses, saved as PNG/yml/mat/ply/xyz),
then verifying parsing, units, and that the loaded samples' clouds land on
the GT-posed model surface."""

import os

import numpy as np
import pytest
import jax

from plr2_tpu.data.synthetic import box_model_points, render_frame, random_pose
from plr2_tpu.data.loader import raw_to_sample


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def linemod_root(tmp_path_factory):
    """Miniature Linemod_preprocessed tree: object 01, two frames."""
    import yaml

    root = tmp_path_factory.mktemp("linemod")
    obj = 1
    obj_dir = root / "data" / f"{obj:02d}"
    for sub in ("rgb", "depth", "mask"):
        os.makedirs(obj_dir / sub)
    os.makedirs(root / "models")

    # model in mm (upstream PLY units), ~3k points for a dense mask
    mp_m = box_model_points(3000, extent=(0.05, 0.06, 0.04), seed=3)
    mp_mm = mp_m * 1000.0
    with open(root / "models" / f"obj_{obj:02d}.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(mp_mm)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in mp_mm:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
    with open(root / "models" / "models_info.yml", "w") as f:
        d_mm = float(np.linalg.norm(mp_mm.max(0) - mp_mm.min(0)))
        yaml.safe_dump({obj: {"diameter": d_mm}}, f)

    # LineMOD intrinsics (dataset constants); depth in mm => cam_scale 1000
    intr = dict(cx=325.26110, cy=242.04899, fx=572.41140, fy=573.57043,
                cam_scale=1000.0)
    gt = {}
    rng = np.random.default_rng(0)
    for fr in range(2):
        r, t = random_pose(rng)
        frame = render_frame({obj: mp_m}, {obj: (r, t)}, intrinsics=intr,
                             seed=fr)
        _write_png(obj_dir / "rgb" / f"{fr:04d}.png", frame.color)
        from PIL import Image
        Image.fromarray(frame.depth).save(obj_dir / "depth" / f"{fr:04d}.png")
        _write_png(obj_dir / "mask" / f"{fr:04d}.png",
                   ((frame.label == obj) * 255).astype(np.uint8))
        gt[fr] = [{
            "obj_id": obj,
            "cam_R_m2c": [float(x) for x in r.reshape(-1)],
            "cam_t_m2c": [float(x) for x in (t * 1000.0)],  # mm
        }]
    with open(obj_dir / "gt.yml", "w") as f:
        yaml.safe_dump(gt, f)
    with open(obj_dir / "info.yml", "w") as f:
        yaml.safe_dump({fr: {"depth_scale": 1.0} for fr in range(2)}, f)
    with open(obj_dir / "train.txt", "w") as f:
        f.write("0\n")
    with open(obj_dir / "test.txt", "w") as f:
        f.write("1\n")
    return str(root)


def test_linemod_loader_end_to_end(linemod_root):
    from plr2_tpu.data import LinemodDataset

    ds = LinemodDataset(linemod_root, "train", num_points=300,
                        num_mesh_points=400, objlist=[1])
    assert len(ds) == 1
    assert 1 in ds.diameters and 0.05 < ds.diameters[1] < 0.2
    raw = ds.get_raw(0)
    assert raw["obj_idx"] == 0
    assert raw["model_points"].shape == (400, 3)
    # model points back in metres
    assert np.abs(raw["model_points"]).max() < 0.2

    s = raw_to_sample(raw, jax.random.key(0), 300, add_noise=False)
    target = np.asarray(s.target)
    pts = np.asarray(s.points)
    d2 = ((pts[:, None] - target[None]) ** 2).sum(-1)
    # backprojected cloud lies on the GT-posed surface (few mm at 16-bit
    # depth quantization + sparse target sampling)
    assert np.median(np.sqrt(d2.min(1))) < 0.02
    # test split works too
    ds_test = LinemodDataset(linemod_root, "test", num_points=300,
                             num_mesh_points=400, objlist=[1])
    assert len(ds_test) == 1


def test_linemod_loader_missing_root_raises(tmp_path):
    from plr2_tpu.data import LinemodDataset
    with pytest.raises(FileNotFoundError):
        LinemodDataset(str(tmp_path / "nope"), "train")


@pytest.fixture(scope="module")
def ycb_root(tmp_path_factory):
    """Miniature YCB_Video_Dataset tree: one real + one synthetic frame."""
    import scipy.io as sio
    from PIL import Image

    root = tmp_path_factory.mktemp("ycb")
    os.makedirs(root / "data" / "0001")
    os.makedirs(root / "data_syn")
    os.makedirs(root / "dataset_config")

    classes = ["002_master_chef_can", "003_cracker_box"]
    models = {}
    for ci, name in enumerate(classes):
        os.makedirs(root / "models" / name)
        mp = box_model_points(2000, extent=(0.04, 0.05, 0.05), seed=10 + ci)
        np.savetxt(root / "models" / name / "points.xyz", mp, fmt="%.6f")
        models[ci] = mp

    intr = dict(cx=312.9869, cy=241.3109, fx=1066.778, fy=1067.487,
                cam_scale=10000.0)
    rng = np.random.default_rng(1)
    frames = []
    for i, rel in enumerate(["data/0001/000001", "data_syn/000002"]):
        poses = {}
        for ci in range(2):
            r, t = random_pose(rng)
            t[0] = -0.12 + 0.24 * ci
            poses[ci + 1] = (r, t)
        frame = render_frame({ci + 1: models[ci] for ci in range(2)}, poses,
                             intrinsics=intr, seed=100 + i)
        base = root / rel
        Image.fromarray(frame.color).save(str(base) + "-color.png")
        Image.fromarray(frame.depth).save(str(base) + "-depth.png")
        Image.fromarray(frame.label.astype(np.uint8)).save(
            str(base) + "-label.png")
        k = len(poses)
        pose_arr = np.zeros((3, 4, k), dtype=np.float64)
        cls = np.zeros((k, 1), dtype=np.float64)
        for j, (obj_id, (r, t)) in enumerate(sorted(poses.items())):
            pose_arr[:, :3, j] = r
            pose_arr[:, 3, j] = t
            cls[j, 0] = obj_id
        sio.savemat(str(base) + "-meta.mat",
                    {"poses": pose_arr, "cls_indexes": cls,
                     "factor_depth": np.array([[10000.0]]),
                     "intrinsic_matrix": np.array(
                         [[intr["fx"], 0, intr["cx"]],
                          [0, intr["fy"], intr["cy"]], [0, 0, 1]])})
        frames.append(rel)

    with open(root / "dataset_config" / "classes.txt", "w") as f:
        f.write("\n".join(classes) + "\n")
    with open(root / "dataset_config" / "train_data_list.txt", "w") as f:
        f.write("\n".join(frames) + "\n")
    with open(root / "dataset_config" / "test_data_list.txt", "w") as f:
        f.write(frames[0] + "\n")
    return str(root)


def test_ycb_loader_end_to_end(ycb_root):
    from plr2_tpu.data import YCBDataset

    ds = YCBDataset(ycb_root, "train", num_points=400, num_mesh_points=300)
    assert len(ds) == 2
    assert len(ds.classes) == 2
    fr = ds.get_frame(0)
    assert set(fr["objects"].keys()) == {0, 1}
    assert fr["intrinsics"]["cam_scale"] == 10000.0

    raw = ds.get_raw(0, obj_idx=0)
    s = raw_to_sample(raw, jax.random.key(0), 400, add_noise=False)
    target = np.asarray(s.target)
    pts = np.asarray(s.points)
    d2 = ((pts[:, None] - target[None]) ** 2).sum(-1)
    assert np.median(np.sqrt(d2.min(1))) < 0.02

    # synthetic frame composites over the real background (no crash path)
    raw_syn = ds.get_raw(1, obj_idx=1)
    assert raw_syn["mask"].sum() > 20


def test_train_epoch_on_real_layout_linemod(linemod_root):
    """One curriculum train epoch through the real LineMOD loader path."""
    from plr2_tpu.config import (DatasetConfig, ModelConfig, PipelineConfig,
                                 TrainConfig)
    from plr2_tpu.data import LinemodDataset
    from plr2_tpu.train import Trainer

    cfg = PipelineConfig(
        dataset=DatasetConfig(name="linemod", num_points=96, num_objects=13,
                              num_mesh_points=128, sym_list=(7, 8)),
        model=ModelConfig(num_points=96, num_objects=13),
        train=TrainConfig(batch_size=1, nepoch=1))
    train_ds = LinemodDataset(linemod_root, "train", num_points=96,
                              num_mesh_points=128, objlist=[1])
    test_ds = LinemodDataset(linemod_root, "test", num_points=96,
                             num_mesh_points=128, objlist=[1], add_noise=False)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=80)
    state, info = tr.train_epoch(state, train_ds, jax.random.key(1))
    assert np.isfinite(info["train_loss"])
    dis = tr.test_epoch(state, test_ds, jax.random.key(2))
    assert np.isfinite(dis)


def test_ycb_object_selection_covers_all_objects(ycb_root):
    """Regression: repeated visits to a frame must eventually train on every
    labelled object (a fixed per-index seed trained only one forever)."""
    from plr2_tpu.data import YCBDataset

    ds = YCBDataset(ycb_root, "train", num_points=64, num_mesh_points=64)
    seen = {int(ds.get_raw(0)["obj_idx"]) for _ in range(16)}
    assert seen == {0, 1}, seen


def test_ycb_refine_stage_mesh_switch(ycb_root):
    """Upstream num_pt_mesh_small/large contract: 300-pt meshes during the
    PoseNet stage, the high-resolution mesh once set_refine(True)."""
    from plr2_tpu.data import YCBDataset

    ds = YCBDataset(ycb_root, "train", num_points=64, num_mesh_points=300,
                    num_mesh_points_large=1500, add_front=False)
    assert ds.get_num_points_mesh() == 300
    assert ds.get_raw(0, obj_idx=0)["model_points"].shape == (300, 3)
    ds.set_refine(True)
    assert ds.get_num_points_mesh() == 1500
    assert ds.get_raw(0, obj_idx=0)["model_points"].shape == (1500, 3)
    # the two resolutions subsample the same cloud
    small = ds.model_points[0]
    large = ds.model_points_large[0]
    assert {tuple(p) for p in small[:50]} <= {tuple(p) for p in large} or \
        len(large) > len(small)  # (disjoint draws allowed; size is the contract)


def test_trainer_syncs_refine_mesh_on_datasets(ycb_root):
    from plr2_tpu.config import get_preset
    from plr2_tpu.data import YCBDataset
    from plr2_tpu.train.trainer import Trainer, TrainState

    ds = YCBDataset(ycb_root, "train", num_points=64, num_mesh_points=64,
                    num_mesh_points_large=256, add_front=False)
    state = TrainState(variables={}, opt_state=None, lr=1e-4, w=0.015,
                       refine_started=True)
    Trainer._sync_refine_meshes(state, ds)
    assert ds.refine and ds.get_num_points_mesh() == 256
    state.refine_started = False
    Trainer._sync_refine_meshes(state, ds)
    assert not ds.refine and ds.get_num_points_mesh() == 64


def test_ycb_add_front_occluder(ycb_root):
    """Occluder compositing: the chosen synthetic frame's objects are
    pasted in front and their pixels leave the object mask."""
    from plr2_tpu.data import YCBDataset
    from PIL import Image

    ds = YCBDataset(ycb_root, "train", num_points=64, num_mesh_points=64,
                    add_front=True, front_num=1, front_keep_px=10,
                    minimum_num_pt=0, seed=2)
    base = ds._get_raw_once(0, obj_idx=0)
    ds_plain = YCBDataset(ycb_root, "train", num_points=64,
                          num_mesh_points=64, add_front=False, seed=2)
    plain = ds_plain._get_raw_once(0, obj_idx=0)
    # front compositing may legitimately fail all attempts only if the
    # occluder never overlaps; with one syn frame covering the scene it
    # must fire for some seed — assert the contract when it does
    fired = base["mask"].sum() < plain["mask"].sum()
    if fired:
        # occluded pixels: removed from mask, color replaced by the front
        # frame's color
        occluded = plain["mask"] & ~base["mask"]
        assert occluded.sum() > 0
        syn = np.asarray(Image.open(
            os.path.join(ycb_root, ds.syn_frames[0] + "-color.png")).convert("RGB"))
        ys, xs = np.nonzero(occluded)
        assert (base["color"][ys, xs] == syn[ys, xs]).all()
    else:
        # never-overlapping fixture: mask must be untouched
        assert (base["mask"] == plain["mask"]).all()


def test_ycb_minimum_visible_resample(ycb_root, monkeypatch):
    """A sample whose mask has <= minimum_num_pt pixels is replaced by a
    fresh random draw (upstream re-__getitem__ behavior)."""
    from plr2_tpu.data import YCBDataset

    ds = YCBDataset(ycb_root, "train", num_points=64, num_mesh_points=64,
                    add_front=False, minimum_num_pt=50)
    real_once = ds._get_raw_once
    calls = {"n": 0}

    def fake_once(i, obj_idx=None):
        calls["n"] += 1
        raw = real_once(i, obj_idx)
        if calls["n"] == 1:  # first draw: degenerate 1-pixel mask
            tiny = np.zeros_like(raw["mask"])
            tiny[0, 0] = True
            raw = dict(raw, mask=tiny)
        return raw

    monkeypatch.setattr(ds, "_get_raw_once", fake_once)
    raw = ds.get_raw(0, obj_idx=0)
    assert calls["n"] >= 2  # the degenerate draw was rejected
    assert raw["mask"].sum() > 50


def test_linemod_segnet_results_eval(linemod_root, tmp_path):
    """The upstream eval protocol with predicted (non-GT) masks:
    segnet_results/{obj:02d}_label/{frame:04d}_label.png, pixel==255 ->
    object; an empty predicted mask is a 'Lost detection' the evaluator
    skips."""
    from PIL import Image

    from plr2_tpu.data import LinemodDataset
    from plr2_tpu.eval import evaluate, write_segnet_results
    from plr2_tpu.pipeline import DenseFusionPipeline

    # render predicted masks through the writer: a fake predictor that
    # erodes the GT mask (simulating imperfect segmentation). The writer
    # iterates test.txt (frame 1 only) for object 01.
    gt_mask = np.asarray(Image.open(
        os.path.join(linemod_root, "data", "01", "mask", "0001.png"))) > 128

    def predict_labels(color):
        eroded = gt_mask.copy()
        eroded[:, 1::3] = False  # drop every third column
        return eroded.astype(np.int32)  # class 1 = objlist position 0

    out = str(tmp_path / "segnet_results")
    n = write_segnet_results(linemod_root, out, predict_labels,
                             objlist=[1], split="test")
    assert n == 1
    assert os.path.exists(os.path.join(out, "01_label", "0001_label.png"))

    ds_pred = LinemodDataset(linemod_root, "test", num_points=96,
                             num_mesh_points=128, objlist=[1],
                             segnet_results=out)
    ds_gt = LinemodDataset(linemod_root, "test", num_points=96,
                           num_mesh_points=128, objlist=[1])
    raw_pred = ds_pred.get_raw(0)
    raw_gt = ds_gt.get_raw(0)
    assert not raw_pred["lost"]
    # the predicted mask is the eroded one, strictly smaller than GT
    assert raw_pred["mask"].sum() < raw_gt["mask"].sum()
    assert not raw_pred["bbox_mask"][:, 1::3].any()

    # the eval protocol runs end-to-end from predicted masks
    pipe = DenseFusionPipeline(num_points=96, num_objects=1)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)
    diam = {0: ds_pred.diameters[1]}
    res = evaluate(pipe, variables, ds_pred, sym_list=(), num_points=96,
                   refine_iterations=1, diameters=diam)
    assert res.num_samples == 1
    assert res.lost_detections == 0
    assert np.isfinite(res.mean_distance)

    # empty predicted mask -> lost detection, skipped (not scored)
    Image.fromarray(np.zeros_like(gt_mask, dtype=np.uint8)).save(
        os.path.join(out, "01_label", "0001_label.png"))
    assert ds_pred.get_raw(0)["lost"]
    res2 = evaluate(pipe, variables, ds_pred, sym_list=(), num_points=96,
                    refine_iterations=1, diameters=diam)
    assert res2.num_samples == 0
    assert res2.lost_detections == 1


def test_linemod_cache_returns_identical_samples(linemod_root):
    from plr2_tpu.data import LinemodDataset

    plain = LinemodDataset(linemod_root, "train", num_points=300,
                           num_mesh_points=400, objlist=[1])
    cached = LinemodDataset(linemod_root, "train", num_points=300,
                            num_mesh_points=400, objlist=[1], cache_mb=64)
    for _ in range(3):  # repeat visits exercise the hit path
        a, b = plain.get_raw(0), cached.get_raw(0)
        for k in ("color", "depth", "mask", "target_r", "target_t",
                  "model_points"):
            np.testing.assert_array_equal(a[k], b[k])
    assert cached._frame_cache.hits == 2


def test_ycb_cache_preserves_per_visit_randomness(ycb_root):
    """Caching covers only the pure decode: synthetic-background draws and
    occluder draws must still re-randomize per visit, and the sample stream
    must match an uncached dataset with the same seed exactly."""
    from plr2_tpu.data import YCBDataset

    kw = dict(num_points=64, num_mesh_points=64, add_front=True,
              front_num=1, front_keep_px=10, minimum_num_pt=0, seed=5)
    plain = YCBDataset(ycb_root, "train", **kw)
    cached = YCBDataset(ycb_root, "train", cache_mb=64, **kw)
    for i in [0, 1, 0, 1, 0]:
        a, b = plain.get_raw(i), cached.get_raw(i)
        for k in ("color", "depth", "mask", "target_r", "target_t"):
            np.testing.assert_array_equal(a[k], b[k])
        assert a["obj_idx"] == b["obj_idx"]
    assert cached._frame_cache.hits > 0


def test_ycb_bbox_mask_is_label_only(ycb_root):
    """Upstream YCB snaps the crop window from the LABEL mask alone
    (get_bbox(mask_label)) — depth holes must not shrink the crop, even
    though the choose-sampling mask is label AND depth>0."""
    from plr2_tpu.data.bbox import get_bbox_from_mask
    from plr2_tpu.data.ycb import YCBDataset

    ds = YCBDataset(ycb_root, "train", num_points=100, num_mesh_points=64,
                    add_noise=False)
    fr = ds.get_frame(0)
    raw = ds.get_raw(0, obj_idx=0)
    np.testing.assert_array_equal(np.asarray(raw["bbox_mask"]),
                                  fr["label"] == 1)
    # knock depth holes into the object's top rows: the sampling mask
    # shrinks but the bbox (from bbox_mask) must not move
    h, w = fr["depth"].shape
    bbox_before = get_bbox_from_mask(raw["bbox_mask"], h, w)
    rows = np.nonzero(raw["bbox_mask"].any(axis=1))[0]
    holed = dict(raw)
    depth = fr["depth"].copy()
    depth[rows[:2], :] = 0
    holed["depth"] = depth
    holed["mask"] = raw["bbox_mask"] & (depth > 0)
    assert holed["mask"].sum() < raw["bbox_mask"].sum()
    assert get_bbox_from_mask(holed["bbox_mask"], h, w) == bbox_before


def test_linemod_predicted_mask_bbox_ignores_stray_pixels(linemod_root,
                                                          tmp_path):
    """Upstream crops predicted masks through mask_to_bbox (largest
    contour): a stray false-positive pixel far from the object must not
    inflate the crop window to the whole frame."""
    from PIL import Image

    from plr2_tpu.data import LinemodDataset
    from plr2_tpu.data.bbox import get_bbox_from_mask

    gt_mask = np.asarray(Image.open(
        os.path.join(linemod_root, "data", "01", "mask", "0001.png"))) > 128
    noisy = gt_mask.copy()
    noisy[2, 2] = True  # lone false positive near the image corner

    out = tmp_path / "segnet_results" / "01_label"
    os.makedirs(out)
    Image.fromarray(noisy.astype(np.uint8) * 255).save(out / "0001_label.png")

    ds = LinemodDataset(linemod_root, "test", num_points=96,
                        num_mesh_points=128, objlist=[1],
                        segnet_results=str(tmp_path / "segnet_results"))
    raw = ds.get_raw(0)
    h, w = gt_mask.shape
    assert not raw["bbox_mask"][2, 2]  # stray blob dropped from the bbox
    from plr2_tpu.data.linemod import largest_component_mask
    assert (get_bbox_from_mask(raw["bbox_mask"], h, w)
            == get_bbox_from_mask(largest_component_mask(gt_mask), h, w))
    # ... whereas the raw extent of the noisy mask would span the corner
    assert get_bbox_from_mask(noisy, h, w)[0] <= 2
    # sampling still sees every predicted pixel inside the window
    assert raw["mask"][gt_mask & (raw["depth"] > 0)].all()
