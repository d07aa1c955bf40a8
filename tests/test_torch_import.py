"""Reference-checkpoint migration tests, both directions.

Import: a state_dict in the UPSTREAM DenseFusion naming scheme
(cnn.model.feats..., psp.stages.N.1, up_k.conv.1, Conv1d heads) merges
into the flax tree exactly, including the `num_batches_tracked` buffers
every real torch BN checkpoint carries.

Export (models/torch_export.py): the emitted dict must (a) round-trip
through the importer to the identical variable tree, and (b) strict-load
into torch modules with the authentic upstream attribute names — whose
forward pass must then match the flax forward. (b) is the migration
guarantee: a .pth we export produces the same poses in reference-layout
torch code."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from plr2_tpu.models.posenet import PoseNet, PoseRefineNet
from plr2_tpu.models.torch_export import (
    export_posenet_state_dict, export_refinenet_state_dict)
from plr2_tpu.models.torch_import import (
    import_posenet_state_dict, import_refinenet_state_dict)


def _t(x):
    return torch.from_numpy(np.array(x))  # np.array copies: torch needs writable


def _as_torch(sd):
    return {k: _t(v) for k, v in sd.items()}


from plr2_tpu.models.torch_upstream import (
    UPoseNet as _UPoseNet, UPoseRefineNet as _UPoseRefineNet)


# ---------------- helpers ----------------

def _randomize_batch_stats(rng, variables):
    def _rand(path, x):
        r = rng.normal(size=x.shape).astype(np.float32)
        if any("var" in str(p) for p in path):
            return jnp.asarray(np.abs(r) * 0.5 + 0.3)
        return jnp.asarray(r * 0.3)

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        _rand, variables["batch_stats"])
    return variables


# ---------------- tests ----------------

def test_posenet_export_import_roundtrip(rng):
    model = PoseNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    src = _randomize_batch_stats(rng, model.init(jax.random.key(1), *args))
    sd = _as_torch(export_posenet_state_dict(src))
    assert any(k.endswith("num_batches_tracked") for k in sd)
    sd = {("module." + k if i % 2 else k): v  # exercise DataParallel prefixes
          for i, (k, v) in enumerate(sd.items())}

    dst = model.init(jax.random.key(2), *args)
    dst, unmatched = import_posenet_state_dict(sd, dst)
    assert unmatched == [], unmatched[:5]

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(src)[0],
            jax.tree_util.tree_flatten_with_path(dst)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))

    # imported model must produce identical outputs to the source
    out_a = model.apply(src, *args)
    out_b = model.apply(dst, *args)
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refinenet_export_import_roundtrip():
    model = PoseRefineNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 16, 3)), jnp.zeros((1, 16, 32)),
            jnp.zeros((1,), jnp.int32))
    src = model.init(jax.random.key(1), *args)
    sd = _as_torch(export_refinenet_state_dict(src))

    dst = model.init(jax.random.key(2), *args)
    dst, unmatched = import_refinenet_state_dict(sd, dst)
    assert unmatched == []
    a = model.apply(src, *args)
    b = model.apply(dst, *args)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_posenet_export_strict_loads_and_matches_forward(rng):
    """The exported .pth strict-loads into upstream-named torch modules and
    the torch forward reproduces the flax forward — the full train-here,
    deploy-on-reference migration path."""
    num_obj, n, hw = 3, 16, 48
    model = PoseNet(num_points=n, num_objects=num_obj)
    img = rng.normal(size=(2, hw, hw, 3)).astype(np.float32)
    cloud = rng.normal(size=(2, n, 3)).astype(np.float32)
    choose = rng.integers(0, hw * hw, size=(2, n)).astype(np.int32)
    obj = np.array([0, 2], dtype=np.int32)
    variables = _randomize_batch_stats(rng, model.init(
        jax.random.key(0), jnp.asarray(img), jnp.asarray(cloud),
        jnp.asarray(choose), jnp.asarray(obj)))

    tm = _UPoseNet(n, num_obj).eval()
    tm.load_state_dict(_as_torch(export_posenet_state_dict(variables)),
                       strict=True)

    jr, jt, jc, jemb = model.apply(variables, jnp.asarray(img),
                                   jnp.asarray(cloud), jnp.asarray(choose),
                                   jnp.asarray(obj))
    with torch.no_grad():
        tr, tt, tc, temb = tm(torch.from_numpy(img).permute(0, 3, 1, 2),
                              torch.from_numpy(cloud),
                              torch.from_numpy(choose).long(),
                              torch.from_numpy(obj).long())
    np.testing.assert_allclose(np.asarray(jemb), temb.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-4)


def test_refinenet_export_strict_loads_and_matches_forward(rng):
    num_obj, n = 3, 16
    model = PoseRefineNet(num_points=n, num_objects=num_obj)
    cloud = rng.normal(size=(2, n, 3)).astype(np.float32)
    emb = rng.normal(size=(2, n, 32)).astype(np.float32)
    obj = np.array([1, 0], dtype=np.int32)
    variables = model.init(jax.random.key(0), jnp.asarray(cloud),
                           jnp.asarray(emb), jnp.asarray(obj))

    tm = _UPoseRefineNet(n, num_obj).eval()
    tm.load_state_dict(_as_torch(export_refinenet_state_dict(variables)),
                       strict=True)

    jr, jt = model.apply(variables, jnp.asarray(cloud), jnp.asarray(emb),
                         jnp.asarray(obj))
    with torch.no_grad():
        tr, tt = tm(torch.from_numpy(cloud), torch.from_numpy(emb),
                    torch.from_numpy(obj).long())
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=1e-4)


def test_save_reference_checkpoint_roundtrip(tmp_path, rng):
    """tools/export_torch.py's core: variables tree -> .pth files torch can
    load -> load_reference_checkpoint recovers the identical tree."""
    from plr2_tpu.models.torch_export import save_reference_checkpoint
    from plr2_tpu.models.torch_import import load_reference_checkpoint

    pose = PoseNet(num_points=16, num_objects=3)
    refine = PoseRefineNet(num_points=16, num_objects=3)
    pargs = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
             jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    rargs = (jnp.zeros((1, 16, 3)), jnp.zeros((1, 16, 32)),
             jnp.zeros((1,), jnp.int32))
    src = {
        "posenet": _randomize_batch_stats(
            rng, pose.init(jax.random.key(1), *pargs)),
        "refiner": refine.init(jax.random.key(1), *rargs),
    }
    pp = str(tmp_path / "pose_model.pth")
    rp = str(tmp_path / "pose_refine_model.pth")
    save_reference_checkpoint(src, pp, rp)

    dst = {
        "posenet": pose.init(jax.random.key(2), *pargs),
        "refiner": refine.init(jax.random.key(2), *rargs),
    }
    dst = load_reference_checkpoint(pp, dst, rp)
    for name in ("posenet", "refiner"):
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(src[name])[0],
                jax.tree_util.tree_flatten_with_path(dst[name])[0]):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{name}/{pa}")


def test_import_shape_mismatch_raises():
    model = PoseNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    var = model.init(jax.random.key(0), *args)
    bad = {"feat.conv1.weight": torch.zeros(64, 7, 1)}  # wrong in-dim
    with pytest.raises(ValueError, match="shape mismatch"):
        import_posenet_state_dict(bad, var)
