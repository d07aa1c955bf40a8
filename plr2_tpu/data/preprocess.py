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


@functools.partial(jax.jit, static_argnames=("num_points",))
def sample_choose(mask_flat: jnp.ndarray, num_points: int,
                  key: jax.Array) -> jnp.ndarray:
    """mask_flat (P,) bool -> (num_points,) flat indices of chosen pixels."""
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

    # random subset (count > num_points): top_k over uniform scores
    rand_scores = jnp.where(
        mask_flat, jax.random.uniform(key, (p,)), -jnp.inf)
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


def color_jitter(img01: jnp.ndarray, key: jax.Array,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2, hue: float = 0.05) -> jnp.ndarray:
    """Device-side ColorJitter(0.2, 0.2, 0.2, 0.05) equivalent on [0,1] RGB.

    Factor sampling matches torchvision ranges (uniform in [max(0,1-v),1+v],
    hue in [-h, h]); application order is fixed b->c->s->h rather than
    torchvision's random permutation.
    """
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    s = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    h = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    x = jnp.clip(img01 * b, 0.0, 1.0)
    gray = jnp.mean(x, axis=(-3, -2, -1), keepdims=True)
    x = jnp.clip((x - gray) * c + gray, 0.0, 1.0)
    lum = (x * jnp.asarray([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    x = jnp.clip((x - lum) * s + lum, 0.0, 1.0)
    # hue rotation in YIQ space (cheap approximation of HSV hue shift)
    theta = 2.0 * jnp.pi * h
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    rgb2yiq = jnp.asarray([[0.299, 0.587, 0.114],
                           [0.596, -0.274, -0.322],
                           [0.211, -0.523, 0.312]])
    yiq2rgb = jnp.linalg.inv(rgb2yiq)
    rot = jnp.asarray([[1.0, 0.0, 0.0],
                       [0.0, cos_t, -sin_t],
                       [0.0, sin_t, cos_t]])
    x = jnp.clip(x @ (yiq2rgb @ rot @ rgb2yiq).T, 0.0, 1.0)
    return x


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

    choose = sample_choose(mask_crop.reshape(-1), num_points, k_choose)

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

    target = model_points @ target_r.T + target_t + add_t
    return Sample(points=cloud, choose=choose, img=img, target=target,
                  model_points=model_points, idx=obj_idx)
