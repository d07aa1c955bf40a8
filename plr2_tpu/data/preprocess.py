"""Fused on-device preprocessing: mask -> choose-sampling -> depth
backprojection -> image normalization, all jit-able with static shapes.

Replaces the per-sample NumPy block of the reference datasets
(datasets/*/dataset.py __getitem__, SURVEY.md section 3.4) with XLA ops.
Host code only decodes files and computes the crop window; everything after
the raw uint8/uint16 crop arrays runs on device.

`sample_choose` reproduces the reference's sampling contract with
fixed-shape primitives:
  * more than `num_points` masked pixels -> uniform random subset
    (reference: shuffle a 0/1 mask, keep order — here top_k over random
    scores, then sorted to ascending pixel order)
  * fewer -> the masked pixel list wrap-padded cyclically ('wrap' np.pad)
  * none  -> all-zeros choose (the reference returns a zero sample)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from plr2_tpu.geometry.pointcloud import backproject_depth

# ImageNet normalization used by the reference's torchvision transform
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Sample(NamedTuple):
    """The reference's per-sample 6-tuple (channel-last image)."""

    points: jnp.ndarray  # (N, 3) backprojected cloud
    choose: jnp.ndarray  # (N,) flat indices into the crop
    img: jnp.ndarray     # (H, W, 3) normalized crop
    target: jnp.ndarray  # (M, 3) GT-posed model points
    model_points: jnp.ndarray  # (M, 3)
    idx: jnp.ndarray     # () object index


def _coord_scores(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """(P,) int32 pseudo-random scores keyed by each pixel's WINDOW-RELATIVE
    (row, col) coordinates (murmur3-style integer mixing of the coordinates
    with the key material) — NOT by its flattened position. Consequence:
    a pixel draws the identical score whether the window lives in a
    host-side bbox crop (h x w) or at the top-left of a serving canvas
    (240 x 240), so the stochastic subsample below picks the SAME pixel
    set on both paths (host==device bit-exactness in both sampling
    regimes, tests/test_serving.py). Scores are non-negative, so -1 is a
    safe masked-out sentinel."""
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    r = jnp.arange(h, dtype=jnp.uint32)[:, None]
    c = jnp.arange(w, dtype=jnp.uint32)[None, :]
    x = r * jnp.uint32(0x9E3779B1) ^ (c * jnp.uint32(0x85EBCA77))
    x = x + kd[0]
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = x + kd[-1]
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return (x >> jnp.uint32(1)).astype(jnp.int32).reshape(-1)


@functools.partial(jax.jit, static_argnames=("num_points", "width"))
def sample_choose(mask_flat: jnp.ndarray, num_points: int,
                  key: jax.Array, width: int | None = None) -> jnp.ndarray:
    """mask_flat (P,) bool -> (num_points,) flat indices of chosen pixels.

    `width` is the window's row stride: when given, the random-subset
    scores key off window-relative (row, col) coordinates so the chosen
    set is independent of how the window is embedded in a larger array
    (see _coord_scores). Without it the mask is treated as one row."""
    p = mask_flat.shape[0]
    count = jnp.sum(mask_flat.astype(jnp.int32))
    idx = jnp.arange(p, dtype=jnp.int32)

    # ordered nonzero indices, front-packed: sort key puts masked pixels
    # first in ascending index order
    order_scores = jnp.where(mask_flat, -idx, jnp.iinfo(jnp.int32).min)
    _, ordered = jax.lax.top_k(order_scores, num_points)  # ascending masked idx
    # wrap-pad: j-th output = ordered[j % count]
    j = jnp.arange(num_points, dtype=jnp.int32)
    wrap = jnp.take(ordered, j % jnp.maximum(count, 1))

    # random subset (count > num_points): top_k over coordinate-keyed
    # scores; top_k tie-break (lowest index) is row-major in every
    # embedding, so even score collisions select consistently
    w = width or p
    rand_scores = jnp.where(mask_flat, _coord_scores(key, p // w, w), -1)
    _, subset = jax.lax.top_k(rand_scores, num_points)
    subset = jnp.sort(subset)  # reference keeps flat-index order after shuffle

    choose = jnp.where(count > num_points, subset, wrap)
    return jnp.where(count > 0, choose, jnp.zeros_like(choose)).astype(jnp.int32)


def normalize_image(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 (H, W, 3) -> normalized float32, torchvision semantics."""
    x = img_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


# --- ColorJitter: exact torchvision float-tensor semantics -----------------
# The reference trains with transforms.ColorJitter(0.2, 0.2, 0.2, 0.05)
# (datasets/*/dataset.py [upstream, mount empty]). The per-op math below
# transcribes torchvision's functional-tensor formulas (_blend with clamp,
# rgb_to_grayscale weights 0.2989/0.587/0.114, contrast blending toward the
# *grayscale* mean, hue via exact RGB<->HSV), and the op order is a uniform
# random permutation per sample, as in ColorJitter.forward.


def _blend(img1, img2, ratio):
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def _rgb_to_grayscale(x):
    """(..., 3) -> (..., 1); torchvision rgb_to_grayscale weights."""
    w = jnp.asarray([0.2989, 0.587, 0.114], dtype=x.dtype)
    return (x * w).sum(-1, keepdims=True)


def adjust_brightness(x, factor):
    return _blend(x, jnp.zeros_like(x), factor)


def adjust_contrast(x, factor):
    mean = jnp.mean(_rgb_to_grayscale(x), axis=(-3, -2, -1), keepdims=True)
    return _blend(x, mean, factor)


def adjust_saturation(x, factor):
    return _blend(x, _rgb_to_grayscale(x), factor)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    eqc = maxc == minc
    cr = maxc - minc
    s = cr / jnp.where(eqc, 1.0, maxc)
    cr_div = jnp.where(eqc, 1.0, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    hr = jnp.where(maxc == r, bc - gc, 0.0)
    hg = jnp.where((maxc == g) & (maxc != r), 2.0 + rc - bc, 0.0)
    hb = jnp.where((maxc != g) & (maxc != r), 4.0 + gc - rc, 0.0)
    h = jnp.mod((hr + hg + hb) / 6.0 + 1.0, 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    onehot = jax.nn.one_hot(i, 6, dtype=v.dtype)  # (..., 6)
    a1 = jnp.stack([v, q, p, p, t, v], axis=-1)
    a2 = jnp.stack([t, v, v, q, p, p], axis=-1)
    a3 = jnp.stack([p, p, t, v, v, q], axis=-1)
    return jnp.stack([(onehot * a1).sum(-1), (onehot * a2).sum(-1),
                      (onehot * a3).sum(-1)], axis=-1)


def adjust_hue(x, factor):
    hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    h = jnp.mod(hsv[..., 0] + factor, 1.0)
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def apply_jitter_ops(img01, factors, order):
    """Apply brightness/contrast/saturation/hue (factors (4,)) in the given
    permutation `order` (4,) int32 of op ids 0..3."""
    ops = (
        lambda x: adjust_brightness(x, factors[0]),
        lambda x: adjust_contrast(x, factors[1]),
        lambda x: adjust_saturation(x, factors[2]),
        lambda x: adjust_hue(x, factors[3]),
    )

    def body(i, x):
        return jax.lax.switch(order[i], ops, x)

    return jax.lax.fori_loop(0, 4, body, img01)


def color_jitter(img01: jnp.ndarray, key: jax.Array,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2, hue: float = 0.05) -> jnp.ndarray:
    """Device-side ColorJitter(0.2, 0.2, 0.2, 0.05), torchvision semantics:
    uniform factors in [max(0,1-v), 1+v] (hue in [-h, h]) applied in a
    uniformly random per-sample order."""
    kperm, kb, kc, ks, kh = jax.random.split(key, 5)
    factors = jnp.stack([
        jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                           maxval=1 + brightness),
        jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                           maxval=1 + contrast),
        jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                           maxval=1 + saturation),
        jax.random.uniform(kh, (), minval=-hue, maxval=hue),
    ])
    order = jax.random.permutation(kperm, jnp.arange(4, dtype=jnp.int32))
    return apply_jitter_ops(img01, factors, order)


@functools.partial(jax.jit, static_argnames=("num_points", "add_noise"))
def preprocess_crop(
    color_crop: jnp.ndarray,   # (H, W, 3) uint8
    depth_crop: jnp.ndarray,   # (H, W) float32 (raw depth units)
    mask_crop: jnp.ndarray,    # (H, W) bool: label == obj & depth > 0
    row0: jnp.ndarray,         # () crop origin row in the full image
    col0: jnp.ndarray,         # () crop origin col
    intrinsics: jnp.ndarray,   # (5,) [cx, cy, fx, fy, cam_scale]
    model_points: jnp.ndarray, # (M, 3)
    target_r: jnp.ndarray,     # (3, 3)
    target_t: jnp.ndarray,     # (3,)
    obj_idx: jnp.ndarray,      # () int32
    key: jax.Array,
    num_points: int,
    add_noise: bool = False,
    noise_trans: float = 0.03,
) -> Sample:
    """Fused device-side __getitem__ tail for one crop window."""
    h, w = depth_crop.shape
    k_choose, k_jit, k_trans = jax.random.split(key, 3)

    choose = sample_choose(mask_crop.reshape(-1), num_points, k_choose,
                           width=mask_crop.shape[1])

    depth_sel = jnp.take(depth_crop.reshape(-1), choose)
    rows = (choose // w).astype(jnp.float32) + row0.astype(jnp.float32)
    cols = (choose % w).astype(jnp.float32) + col0.astype(jnp.float32)
    cx, cy, fx, fy, cam_scale = (intrinsics[i] for i in range(5))
    cloud = backproject_depth(depth_sel, rows, cols, cx, cy, fx, fy, cam_scale)

    img01 = color_crop.astype(jnp.float32) / 255.0
    if add_noise:
        img01 = color_jitter(img01, k_jit)
        add_t = jax.random.uniform(k_trans, (3,), minval=-noise_trans,
                                   maxval=noise_trans)
        cloud = cloud + add_t
    else:
        add_t = jnp.zeros(3)
    img = (img01 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    # HIGHEST: GT metric coordinates (TPU matmuls default to bf16 operands)
    target = jnp.matmul(model_points, target_r.T,
                        precision=jax.lax.Precision.HIGHEST) \
        + target_t + add_t
    return Sample(points=cloud, choose=choose, img=img, target=target,
                  model_points=model_points, idx=obj_idx)
