"""SegNet semantic segmentation (the reference's vanilla_segmentation/
segnet.py — SURVEY.md section 2 #15): VGG16-style encoder-decoder that
produces per-pixel object labels used to crop objects when PoseCNN masks
aren't available (BASELINE config 5).

TPU-first re-design of max-unpooling: instead of CUDA-style scatter through
saved argmax indices, each unpool broadcasts the decoder feature back to
the pre-pool resolution and gates it with the encoder's argmax mask
(x == nearest-upsampled max), normalizing over ties. Identical placement
semantics, expressed as dense elementwise ops XLA fuses.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _nearest_up2(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def max_pool_with_mask(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2x2/s2 max pool; also returns the tie-normalized argmax mask used by
    the paired unpool."""
    pooled = nn.max_pool(x, (2, 2), strides=(2, 2))
    up = _nearest_up2(pooled)
    mask = (x == up).astype(x.dtype)
    # normalize ties within each 2x2 window so unpool preserves magnitude
    b, h, w, c = mask.shape
    win = mask.reshape(b, h // 2, 2, w // 2, 2, c)
    counts = jnp.maximum(win.sum(axis=(2, 4), keepdims=True), 1.0)
    mask = (win / counts).reshape(b, h, w, c)
    return pooled, mask


def max_unpool(y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Place decoder features at the encoder's max locations."""
    return _nearest_up2(y) * mask


class _ConvBNRelu(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class SegNet(nn.Module):
    """VGG16 encoder (2-2-3-3-3 conv blocks) + mirrored decoder."""

    num_classes: int = 22  # 21 YCB objects + background
    dtype: Any = jnp.float32
    enc_blocks: Sequence[Tuple[int, int]] = (
        (2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        masks = []
        for bi, (n_convs, feats) in enumerate(self.enc_blocks):
            for ci in range(n_convs):
                x = _ConvBNRelu(feats, self.dtype,
                                name=f"enc{bi}_{ci}")(x, train=train)
            x, mask = max_pool_with_mask(x)
            masks.append(mask)

        dec_blocks = list(reversed(self.enc_blocks))
        for bi, (n_convs, feats) in enumerate(dec_blocks):
            x = max_unpool(x, masks[len(masks) - 1 - bi])
            # mirrored block: last conv transitions to the next block's width
            next_feats = (dec_blocks[bi + 1][1] if bi + 1 < len(dec_blocks)
                          else self.enc_blocks[0][1])
            for ci in range(n_convs):
                out_feats = feats if ci < n_convs - 1 else next_feats
                x = _ConvBNRelu(out_feats, self.dtype,
                                name=f"dec{bi}_{ci}")(x, train=train)
        return nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="classifier")(x)


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel cross entropy (the reference's CrossEntropyLoss2d)."""
    logp = nn.log_softmax(logits, axis=-1)
    onehot = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(onehot)


def build_segmenter(arch: str, num_classes: int, dtype: Any = jnp.float32):
    """Segmentation architectures usable everywhere a seg model is consumed
    (SegTrainer, FrameEstimator's on-device segmentation, segnet_results
    rendering).

    "segnet"  — the reference-parity VGG16 encoder-decoder above
                (vanilla_segmentation/segnet.py).
    "pspnet"  — the repo's PSPNet (dilated ResNet-18 trunk at stride 8 +
                pyramid pooling) with a per-pixel classifier head. Far less
                full-resolution conv work than VGG16 (which runs 13 conv
                layers at frame resolution both ways): the serving-mode
                segmentation lever when the frame segmenter, not the pose
                network, is the bottleneck (docs/PERF_NOTES.md).

    Both take (B, H, W, 3) normalized frames (H, W multiples of 32 — the
    callers pad) and return (B, H, W, num_classes) logits.
    """
    if arch == "segnet":
        return SegNet(num_classes=num_classes, dtype=dtype)
    if arch == "pspnet":
        from plr2_tpu.models.pspnet import PSPNet

        return PSPNet(emb_dim=num_classes, log_softmax_final=False,
                      phase_upsample=True, dtype=dtype)
    raise ValueError(f"unknown segmenter arch {arch!r} "
                     "(expected 'segnet' or 'pspnet')")
