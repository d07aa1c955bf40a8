"""Native C++ data-plane tests: results must match the Python/JAX
implementations bit-for-bit where semantics are deterministic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plr2_tpu import native
from plr2_tpu.data import get_bbox_from_mask, snap_bbox, sample_choose
from plr2_tpu.data.loader import SyntheticPoseDataset, raw_to_sample
from plr2_tpu.data.prefetch import host_prepare, PrefetchLoader
from plr2_tpu.geometry.pointcloud import backproject_depth

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_native_snap_bbox_matches_python(rng):
    for _ in range(50):
        r0, c0 = int(rng.integers(0, 440)), int(rng.integers(0, 600))
        h, w = int(rng.integers(1, 250)), int(rng.integers(1, 250))
        py = snap_bbox(r0, min(r0 + h, 480), c0, min(c0 + w, 640))
        cc = native.snap_bbox(r0, min(r0 + h, 480), c0, min(c0 + w, 640))
        assert py == cc


def test_native_mask_bbox_choose_wrap_matches_device(rng):
    mask = np.zeros((480, 640), bool)
    on = rng.choice(480 * 640, 30, replace=False)
    mask[np.unravel_index(on, mask.shape)] = True
    bbox, choose, count = native.mask_bbox_choose(mask, 100, seed=1)
    assert bbox == get_bbox_from_mask(mask)
    rmin, rmax, cmin, cmax = bbox
    crop = mask[rmin:rmax, cmin:cmax].reshape(-1)
    # wrap case (count < num_points): must equal the device sampler exactly
    dev = np.asarray(sample_choose(jnp.asarray(crop), 100, jax.random.key(0)))
    np.testing.assert_array_equal(choose, dev)
    assert count == int(crop.sum())


def test_native_mask_bbox_choose_subsample_properties(rng):
    mask = np.zeros((480, 640), bool)
    mask[100:200, 100:220] = True
    bbox, choose, count = native.mask_bbox_choose(mask, 500, seed=3)
    rmin, rmax, cmin, cmax = bbox
    crop = mask[rmin:rmax, cmin:cmax].reshape(-1)
    assert count == int(crop.sum()) and count > 500
    assert crop[choose].all()                       # all masked pixels
    assert len(np.unique(choose)) == 500            # no replacement
    assert (np.sort(choose) == choose).all()        # ascending order
    # different seeds -> different subsets
    _, choose2, _ = native.mask_bbox_choose(mask, 500, seed=4)
    assert not np.array_equal(choose, choose2)


def test_native_backproject_matches_jax(rng):
    depth = rng.uniform(500, 2000, size=(60, 80)).astype(np.float32)
    choose = np.sort(rng.choice(60 * 80, 200, replace=False)).astype(np.int32)
    cloud = native.backproject(depth, choose, 80, 10, 20,
                               325.2611, 242.04899, 572.4114, 573.57043, 1000.0)
    rows = (choose // 80 + 10).astype(np.float32)
    cols = (choose % 80 + 20).astype(np.float32)
    ref = np.asarray(backproject_depth(
        jnp.asarray(depth.reshape(-1)[choose]), jnp.asarray(rows),
        jnp.asarray(cols), 325.2611, 242.04899, 572.4114, 573.57043, 1000.0))
    np.testing.assert_allclose(cloud, ref, rtol=1e-6)


def test_native_parse_ply(tmp_path, rng):
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    path = tmp_path / "model.ply"
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("element face 0\nproperty list uchar int vertex_indices\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
    out = native.parse_ply(str(path))
    np.testing.assert_allclose(out, pts, atol=1e-5)
    # python parser agrees
    from plr2_tpu.data.linemod import parse_ply_vertices
    np.testing.assert_allclose(parse_ply_vertices(str(path)), pts, atol=1e-5)


def test_host_prepare_matches_device_pipeline():
    ds = SyntheticPoseDataset(num_frames=1, num_objects=1, num_points=200,
                              seed=11)
    raw = ds.get_raw(0)
    host = host_prepare(raw, 200, seed=0)
    dev = raw_to_sample(raw, jax.random.key(0), 200, add_noise=False)
    # same crop, same target; clouds land on the same surface (choose RNG
    # streams differ between host/device paths by design)
    assert host["img"].shape == dev.img.shape
    np.testing.assert_allclose(host["target"], np.asarray(dev.target), atol=1e-5)
    np.testing.assert_allclose(host["img"], np.asarray(dev.img), atol=1e-5)
    d2 = ((host["points"][:, None] - np.asarray(dev.points)[None]) ** 2).sum(-1)
    assert np.median(np.sqrt(d2.min(1))) < 0.02


def test_prefetch_loader_order_and_contents():
    ds = SyntheticPoseDataset(num_frames=2, num_objects=2, num_points=100,
                              seed=13)
    loader = PrefetchLoader(ds, num_points=100, num_workers=3)
    got = list(loader)
    assert len(got) == len(ds)
    # deterministic submission order: sample i corresponds to dataset item i
    for i, s in enumerate(got):
        assert int(s["idx"]) == int(ds.get_raw(i)["obj_idx"])
        assert s["points"].shape == (100, 3)


def test_native_mask_bbox_and_choose_in_bbox(rng):
    """Split entry points: bbox from one mask (the label), choose from
    another (label & depth-valid) inside that bbox — the upstream crop
    semantics for loaders that distinguish the two."""
    label = np.zeros((480, 640), bool)
    label[100:180, 200:300] = True
    valid = label.copy()
    valid[::2] = False  # half the label pixels lack depth

    bbox = native.mask_bbox(label)
    ref_bbox, _, _ = native.mask_bbox_choose(label, 10, seed=0)
    assert bbox == ref_bbox == get_bbox_from_mask(label)

    choose, count = native.choose_in_bbox(valid, bbox, 300, seed=7)
    rmin, rmax, cmin, cmax = bbox
    crop = valid[rmin:rmax, cmin:cmax].reshape(-1)
    assert count == int(crop.sum())
    assert crop[choose].all()
    assert len(np.unique(choose)) == 300
    # matches the fused call when the two masks coincide
    bbox2, choose2, count2 = native.mask_bbox_choose(valid, 300, seed=7)
    choose3, count3 = native.choose_in_bbox(valid, bbox2, 300, seed=7)
    np.testing.assert_array_equal(choose2, choose3)
    assert count2 == count3


def test_prefetch_samples_equal_inline_with_augmentation():
    """The threaded native data plane must yield bit-identical samples to
    the sequential (num_workers=0) run of the same preparation —
    augmentation (ColorJitter + translation noise) included, since both
    the host choose seed and the device augmentation key derive from the
    dataset index, not thread order."""
    from plr2_tpu.data.prefetch import iterate_prefetch_samples

    ds = SyntheticPoseDataset(num_frames=2, num_objects=2, num_points=100,
                              seed=21)
    key = jax.random.key(5)
    kw = dict(num_points=100, add_noise=True, noise_trans=0.03,
              shuffle=True, seed=3)
    inline = list(iterate_prefetch_samples(ds, key, num_workers=0, **kw))
    threaded = list(iterate_prefetch_samples(ds, key, num_workers=3, **kw))
    assert len(inline) == len(threaded) == len(ds)
    for a, b in zip(inline, threaded):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    # augmentation actually fired: unaugmented stream differs
    plain = list(iterate_prefetch_samples(
        ds, key, num_points=100, add_noise=False, shuffle=True, seed=3,
        num_workers=0))
    assert not np.allclose(np.asarray(plain[0].img),
                           np.asarray(inline[0].img))


def test_trainer_with_workers_smoke():
    """cfg.train.workers > 0 routes the epoch loops through the native
    data plane; one epoch trains and evaluates with finite metrics."""
    from plr2_tpu.config import (DatasetConfig, ModelConfig, PipelineConfig,
                                 TrainConfig)
    from plr2_tpu.train import Trainer

    cfg = PipelineConfig(
        dataset=DatasetConfig(name="synthetic", num_points=96, num_objects=2,
                              num_mesh_points=128, sym_list=(1,)),
        model=ModelConfig(num_points=96, num_objects=2),
        train=TrainConfig(batch_size=2, nepoch=1, workers=2))
    ds = SyntheticPoseDataset(num_frames=2, num_objects=2, model_points=128,
                              num_points=96, seed=2)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=80)
    state, info = tr.train_epoch(state, ds, jax.random.key(1))
    assert np.isfinite(info["train_loss"])
    dis = tr.test_epoch(state, ds, jax.random.key(2))
    assert np.isfinite(dis)


def test_process_prefetch_matches_threaded():
    """Process-mode PrefetchLoader (spawned workers, the reference's
    DataLoader model) must yield sample-for-sample the same stream as the
    threaded mode. Run via subprocess: spawn re-imports __main__, which
    must be an import-safe script rather than the pytest entry."""
    import subprocess
    import sys
    import os

    runner = os.path.join(os.path.dirname(__file__), "proc_loader_runner.py")
    out = subprocess.run([sys.executable, runner], capture_output=True,
                         text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PROC_LOADER_OK" in out.stdout
