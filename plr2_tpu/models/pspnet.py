"""PSPNet color encoder -> 32-d per-pixel embedding (flax.linen, NHWC).

Re-design of the reference's lib/pspnet.py (PSPModule with bins 1/2/3/6 over
the 512-channel stride-8 map, bottleneck to 1024, three 2x bilinear
upsample+conv stages back to input resolution, final 1x1 conv to 32
channels — SURVEY.md section 2 #2).

TPU-first choices:
  * Adaptive average pooling is expressed as two small matmuls with
    precomputed (static-shape) averaging operators — MXU work instead of
    strided window reductions.
  * Bilinear resizes use `jax.image.resize(method="linear")`, which matches
    PyTorch's align_corners=False half-pixel convention.

`log_softmax_final` reproduces the upstream quirk of a LogSoftmax over the
32 embedding channels left in `final` (inherited from the segmentation
origin of pspnet-pytorch). Default True to match upstream; VERIFY against
the reference when readable.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from plr2_tpu.models.resnet import DilatedResNet18


@functools.lru_cache(maxsize=64)
def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix implementing PyTorch
    AdaptiveAvgPool window semantics: window i = [floor(i*n/s), ceil((i+1)*n/s))."""
    a = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        lo = int(np.floor(i * n_in / n_out))
        hi = int(np.ceil((i + 1) * n_in / n_out))
        a[i, lo:hi] = 1.0 / (hi - lo)
    return a


def adaptive_avg_pool_2d(x: jnp.ndarray, out_hw: int) -> jnp.ndarray:
    """NHWC adaptive average pool to (out_hw, out_hw) via matmuls."""
    _, h, w, _ = x.shape
    ah = jnp.asarray(_adaptive_pool_matrix(h, out_hw))
    aw = jnp.asarray(_adaptive_pool_matrix(w, out_hw))
    # pooled[b, i, j, c] = sum_hw ah[i,h] aw[j,w] x[b,h,w,c]
    y = jnp.einsum("ih,bhwc->biwc", ah, x)
    return jnp.einsum("jw,biwc->bijc", aw, y)


def bilinear_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """NHWC bilinear resize (half-pixel / align_corners=False)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="linear")


class PSPModule(nn.Module):
    """Pyramid scene pooling: per-bin pooled 1x1 conv branches + identity,
    concatenated and bottlenecked to `out_features` with ReLU."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, h, w, c = x.shape
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool_2d(x, size)
            p = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"stage{i}_conv")(p)
            priors.append(bilinear_resize(p, h, w))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(self.out_features, (1, 1), dtype=self.dtype,
                    name="bottleneck")(y)
        return nn.relu(y)


class PSPUpsample(nn.Module):
    """2x bilinear upsample -> 3x3 conv -> PReLU."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, h, w, _ = x.shape
        x = bilinear_resize(x, 2 * h, 2 * w)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv")(x)
        prelu_alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, prelu_alpha * x)


class PSPNet(nn.Module):
    """Full color encoder: image crop (B, H, W, 3) -> embedding (B, H, W, 32).

    When `choose` (B, N) flat pixel indices are given, the gather happens
    BEFORE the final 1x1 conv and log-softmax (both are per-pixel, so
    gather commutes exactly) and the return is the gathered (B, N, 32)
    embedding — skipping the full-resolution 32-channel map write and the
    25k-pixel softmax that only 1000 chosen pixels ever use.
    """

    emb_dim: int = 32
    sizes: Sequence[int] = (1, 2, 3, 6)
    psp_out: int = 1024
    log_softmax_final: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, choose=None):
        f = DilatedResNet18(dtype=self.dtype, name="feats")(x, train=train)
        p = PSPModule(out_features=self.psp_out, sizes=self.sizes,
                      dtype=self.dtype, name="psp")(f)
        p = nn.Dropout(0.3, deterministic=not train, name="drop_1")(p)
        p = PSPUpsample(256, dtype=self.dtype, name="up_1")(p)
        p = nn.Dropout(0.15, deterministic=not train, name="drop_2a")(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_2")(p)
        p = nn.Dropout(0.15, deterministic=not train, name="drop_2b")(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_3")(p)
        if choose is not None:
            b, h, w, c = p.shape
            p = jnp.take_along_axis(p.reshape(b, h * w, c),
                                    choose[..., None], axis=1)
            p = p[:, :, None, :]  # (B, N, 1, 64): 1x1 conv as per-row dense
        p = nn.Conv(self.emb_dim, (1, 1), dtype=self.dtype, name="final")(p)
        if self.log_softmax_final:
            p = jax.nn.log_softmax(p, axis=-1)
        if choose is not None:
            p = p[:, :, 0, :]  # (B, N, emb_dim)
        return p
