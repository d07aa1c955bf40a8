"""SegNet tests: unpool semantics vs a NumPy index oracle, shapes, loss,
and a few-step learning smoke on a trivial synthetic task."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

torch = pytest.importorskip("torch")

from plr2_tpu.models.segnet import (
    SegNet, max_pool_with_mask, max_unpool, segmentation_loss)


def test_maxpool_mask_matches_torch_unpool(rng):
    """pool+unpool roundtrip == torch's MaxUnpool2d with return_indices
    (when maxima are unique)."""
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    pooled, mask = max_pool_with_mask(jnp.asarray(x))
    y = rng.normal(size=pooled.shape).astype(np.float32)
    ours = np.asarray(max_unpool(jnp.asarray(y), mask))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    pt, idx = torch.nn.functional.max_pool2d(xt, 2, 2, return_indices=True)
    np.testing.assert_allclose(
        np.asarray(pooled), pt.permute(0, 2, 3, 1).numpy(), atol=1e-6)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)
    ref = torch.nn.functional.max_unpool2d(yt, idx, 2, 2)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_segnet_output_shape():
    m = SegNet(num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    var = m.init(jax.random.key(0), x)
    y = m.apply(var, x)
    assert y.shape == (1, 64, 64, 5)
    assert bool(jnp.isfinite(y).all())


def test_segmentation_loss_known_value():
    logits = jnp.zeros((1, 2, 2, 3))  # uniform -> loss = log(3)
    labels = jnp.zeros((1, 2, 2), jnp.int32)
    loss = segmentation_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(3.0), rtol=1e-6)


def test_segnet_learns_trivial_split(rng):
    """A tiny SegNet must fit 'left half class 0 / right half class 1'."""
    m = SegNet(num_classes=2, enc_blocks=((1, 8), (1, 16)))
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    labels = jnp.concatenate(
        [jnp.zeros((2, 16, 8), jnp.int32), jnp.ones((2, 16, 8), jnp.int32)],
        axis=2)
    # make the input informative about the label
    x = x.at[:, :, 8:, 0].add(3.0)
    var = m.init(jax.random.key(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(var["params"])

    @jax.jit
    def step(params, bstats, opt):
        def loss_fn(p):
            logits, mut = m.apply({"params": p, "batch_stats": bstats}, x,
                                  train=True, mutable=["batch_stats"])
            return segmentation_loss(logits, labels), mut["batch_stats"]
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), bs, opt, loss

    params, bstats = var["params"], var["batch_stats"]
    first = None
    for i in range(30):
        params, bstats, opt, loss = step(params, bstats, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))
    logits = m.apply({"params": params, "batch_stats": bstats}, x)
    acc = float(jnp.mean((jnp.argmax(logits, -1) == labels)))
    assert acc > 0.8, acc
