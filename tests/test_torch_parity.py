"""Bit-fidelity cross-check: the full PoseNet/PoseRefineNet forward passes
are mirrored in PyTorch (the reference's framework, written here from the
documented architecture spec — plr2_tpu/models/torch_mirror.py), the flax
parameters are transplanted, and the outputs compared. This validates every
semantic the reference implementation depends on — conv padding/dilation,
BN eval statistics, max-pool, adaptive pooling, bilinear upsampling, PReLU,
head reshaping — end to end (SURVEY.md 'hard parts' (a))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from plr2_tpu.models.posenet import PoseNet, PoseRefineNet
from plr2_tpu.models.torch_mirror import TPoseNet, transplant_posenet


# ---------------- the parity test ----------------


def test_posenet_forward_matches_torch_mirror(rng):
    num_obj, n, hw = 5, 64, 80
    model = PoseNet(num_points=n, num_objects=num_obj)
    img = rng.normal(size=(2, hw, hw, 3)).astype(np.float32)
    cloud = rng.normal(size=(2, n, 3)).astype(np.float32)
    choose = rng.integers(0, hw * hw, size=(2, n)).astype(np.int32)
    obj = np.array([1, 4], dtype=np.int32)
    variables = model.init(jax.random.key(0), jnp.asarray(img),
                           jnp.asarray(cloud), jnp.asarray(choose),
                           jnp.asarray(obj))
    # non-trivial batch stats so BN eval actually normalizes: random means
    # and positive variances replace the init (mean 0, var 1) stats before
    # the transplant, so both frameworks must apply the same normalization
    def _randomize_stat(path, x):
        r = rng.normal(size=x.shape).astype(np.float32)
        if any("var" in str(p) for p in path):
            return jnp.asarray(np.abs(r) * 0.5 + 0.3)
        return jnp.asarray(r * 0.3)

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        _randomize_stat, variables["batch_stats"])

    jr, jt, jc, jemb = model.apply(variables, jnp.asarray(img),
                                   jnp.asarray(cloud), jnp.asarray(choose),
                                   jnp.asarray(obj))

    tm = TPoseNet(num_obj).eval()
    transplant_posenet(tm, variables)
    with torch.no_grad():
        tr, tt, tc, temb = tm(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(cloud), torch.from_numpy(choose).long(),
            torch.from_numpy(obj).long())

    np.testing.assert_allclose(np.asarray(jemb), temb.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-4)


def test_refinenet_forward_matches_torch_mirror(rng):
    num_obj, n = 5, 64
    model = PoseRefineNet(num_points=n, num_objects=num_obj)
    cloud = rng.normal(size=(2, n, 3)).astype(np.float32)
    emb = rng.normal(size=(2, n, 32)).astype(np.float32)
    obj = np.array([0, 3], dtype=np.int32)
    variables = model.init(jax.random.key(0), jnp.asarray(cloud),
                           jnp.asarray(emb), jnp.asarray(obj))
    jr, jt = model.apply(variables, jnp.asarray(cloud), jnp.asarray(emb),
                         jnp.asarray(obj))

    p = variables["params"]

    def lin(name, sub):
        w = torch.from_numpy(np.asarray(sub[name]["kernel"]).T.copy())
        b = torch.from_numpy(np.asarray(sub[name]["bias"]).copy())
        return lambda x: x @ w.T + b

    f = p["feat"]
    xt = torch.from_numpy(cloud)
    et = torch.from_numpy(emb)
    x = F.relu(lin("conv1", f)(xt))
    e = F.relu(lin("e_conv1", f)(et))
    f1 = torch.cat([x, e], -1)
    x = F.relu(lin("conv2", f)(x))
    e = F.relu(lin("e_conv2", f)(e))
    f2 = torch.cat([x, e], -1)
    y = torch.cat([f1, f2], -1)
    y = F.relu(lin("conv5", f)(y))
    y = F.relu(lin("conv6", f)(y))
    feat = y.mean(1)

    outs = {}
    for tag, od in (("r", 4), ("t", 3)):
        h = F.relu(lin(f"conv1_{tag}", p)(feat))
        h = F.relu(lin(f"conv2_{tag}", p)(h))
        h = lin(f"conv3_{tag}", p)(h).reshape(2, num_obj, od)
        sel = torch.from_numpy(obj).long().view(2, 1, 1).expand(2, 1, od)
        outs[tag] = torch.gather(h, 1, sel)
    np.testing.assert_allclose(np.asarray(jr), outs["r"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jt), outs["t"].numpy(), atol=1e-4)
