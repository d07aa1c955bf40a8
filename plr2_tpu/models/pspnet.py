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
from typing import Any, Optional, Sequence

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


@functools.lru_cache(maxsize=64)
def _bilinear_upscale_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) half-pixel linear-interp operator (upscale only):
    row i holds the two clamped-taps weights for output coordinate
    (i + 0.5) * n_in / n_out - 0.5. Matches jax.image.resize 'linear'."""
    a = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        c = (i + 0.5) * n_in / n_out - 0.5
        m = int(np.floor(c))
        f = c - m
        a[i, min(max(m, 0), n_in - 1)] += 1.0 - f
        a[i, min(max(m + 1, 0), n_in - 1)] += f
    return a


def bilinear_upscale_mm(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """NHWC bilinear upscale as two small matmuls (no gathers; the PSP
    priors blow tiny 1/2/3/6-px maps up to the feature resolution, which
    as `jax.image.resize` is gather-bound on TPU)."""
    _, h_in, w_in, _ = x.shape
    rh = jnp.asarray(_bilinear_upscale_matrix(h_in, h), x.dtype)
    rw = jnp.asarray(_bilinear_upscale_matrix(w_in, w), x.dtype)
    y = jnp.einsum("ih,bhwc->biwc", rh, x)
    return jnp.einsum("jw,biwc->bijc", rw, y)


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
            # gather-free upscale: MXU matmuls, not jax.image.resize gathers
            priors.append(bilinear_upscale_mm(p, h, w))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(self.out_features, (1, 1), dtype=self.dtype,
                    name="bottleneck")(y)
        return nn.relu(y)


class _ConvParams(nn.Module):
    """Parameter container with nn.Conv's exact tree (kernel/bias, same
    initializers) but no compute, for the fused Pallas stage — checkpoints
    stay interchangeable with the XLA path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


def _up_tap_indices(i: jnp.ndarray, n: int):
    """Half-pixel 2x-upsample source taps for output coords `i` (at 2n
    resolution): returns (i0, i1, w0, w1) with indices clamped to [0, n)
    — clamped duplicates sum their weights, exactly like the
    _bilinear_upscale_matrix accumulation."""
    cpos = (i.astype(jnp.float32) + 0.5) / 2.0 - 0.5
    m = jnp.floor(cpos)
    f = cpos - m
    i0 = jnp.clip(m, 0, n - 1).astype(jnp.int32)
    i1 = jnp.clip(m + 1, 0, n - 1).astype(jnp.int32)
    return i0, i1, 1.0 - f, f


def sparse_upsample_conv_prelu(y, kernel, bias, prelu_alpha, choose):
    """PSPUpsample (2x bilinear + 3x3 zero-pad conv + PReLU) evaluated ONLY
    at `choose` flat positions of the (2h x 2w) output map.

    y (B, h, w, C), kernel (3, 3, C, Cout), choose (B, N) -> (B, N, Cout).
    Exact vs the dense stage followed by a gather (pinned by test): per
    chosen pixel the 3x3 conv window needs a 3x3 patch of the upsampled
    map, each tap a 2x2 half-pixel blend of y — 36 gathered taps replace
    materializing the full-resolution map (the largest HBM tensor of the
    decoder) and the dense conv over 2h*2w positions.
    """
    b, h, w, cin = y.shape
    big_h, big_w = 2 * h, 2 * w
    r = (choose // big_w).astype(jnp.int32)
    c = (choose % big_w).astype(jnp.int32)
    dr = jnp.arange(-1, 2, dtype=jnp.int32)
    rows = r[..., None] + dr  # (B, N, 3) output-res conv window rows
    cols = c[..., None] + dr
    # conv zero padding: window positions outside the output map are zero
    valid = (rows >= 0) & (rows < big_h)
    validc = (cols >= 0) & (cols < big_w)
    r0, r1, wr0, wr1 = _up_tap_indices(jnp.clip(rows, 0, big_h - 1), h)
    c0, c1, wc0, wc1 = _up_tap_indices(jnp.clip(cols, 0, big_w - 1), w)

    yflat = y.reshape(b, h * w, cin)

    def gather(ri, ci):  # (B,N,3) x (B,N,3) -> (B, N, 3, 3, C)
        idx = ri[:, :, :, None] * w + ci[:, :, None, :]
        g = jnp.take_along_axis(yflat, idx.reshape(b, -1)[..., None], axis=1)
        return g.reshape(idx.shape + (cin,))

    wr0 = wr0[..., :, None, None].astype(y.dtype)
    wr1 = wr1[..., :, None, None].astype(y.dtype)
    wc0 = wc0[..., None, :, None].astype(y.dtype)
    wc1 = wc1[..., None, :, None].astype(y.dtype)
    xup = (gather(r0, c0) * wr0 * wc0 + gather(r0, c1) * wr0 * wc1 +
           gather(r1, c0) * wr1 * wc0 + gather(r1, c1) * wr1 * wc1)
    mask = (valid[..., :, None] & validc[..., None, :])[..., None]
    xup = jnp.where(mask, xup, 0)
    out = jnp.einsum("bnijc,ijco->bno", xup, kernel,
                     preferred_element_type=y.dtype) + bias
    return jnp.where(out >= 0, out, prelu_alpha * out)


class _UpsampleParams(nn.Module):
    """PSPUpsample's exact parameter tree (prelu_alpha + conv kernel/bias)
    without the dense compute — the sparse decode path consumes the raw
    weights, so checkpoints stay interchangeable."""

    out_channels: int
    in_features: int

    @nn.compact
    def __call__(self):
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
        kernel, bias = _ConvParams(features=self.out_channels,
                                   in_features=self.in_features,
                                   name="conv")()
        return kernel, bias, alpha


class PSPUpsample(nn.Module):
    """2x bilinear upsample -> 3x3 conv -> PReLU.

    With `use_pallas=True` the whole stage runs as one Pallas kernel
    (ops/pallas_upsample.py): the 2x-upsampled map stays in VMEM instead
    of round-tripping HBM between resize and conv. Both paths share the
    gather-free half-pixel upsample math and are numerically equivalent.
    """

    out_channels: int
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_phase: bool = False  # phase-decomposed upconv (ops/phase_upconv.py)
    # hand-derived phase-conv backward for grad-scan contexts (the
    # autodiff wgrad aborts the TPU compiler inside fused scans at
    # crop >= 160; the batched step keeps autodiff — it measures faster)
    scan_safe_phase_vjp: bool = False

    @nn.compact
    def __call__(self, x):
        from plr2_tpu.ops.pallas_upsample import (
            fused_upconv3x3_prelu, upsample2x_bilinear)

        prelu_alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
        if self.use_pallas:
            kernel, bias = _ConvParams(features=self.out_channels,
                                       in_features=x.shape[-1],
                                       name="conv")()
            interpret = jax.default_backend() != "tpu"
            return fused_upconv3x3_prelu(
                x.astype(self.dtype), kernel.astype(self.dtype),
                bias, prelu_alpha, interpret)
        if self.use_phase:
            from plr2_tpu.ops.phase_upconv import phase_upconv3x3_prelu

            kernel, bias = _ConvParams(features=self.out_channels,
                                       in_features=x.shape[-1],
                                       name="conv")()
            return phase_upconv3x3_prelu(
                x.astype(self.dtype), kernel, bias, prelu_alpha,
                scan_safe_vjp=self.scan_safe_phase_vjp)
        _, h, w, _ = x.shape
        x = bilinear_upscale_mm(x, 2 * h, 2 * w)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv")(x)
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
    use_pallas: bool = False
    # With `choose`, evaluate the final upsample stage only at the chosen
    # pixels (sparse_upsample_conv_prelu) — exact, skips the full-res
    # 64-channel map. MEASURED SLOWER end-to-end on v5e (892 vs 2167 f/s,
    # batch 64 bf16): the 36-tap gathers lose far more than the skipped
    # dense conv saves — XLA's conv pipeline + one gather wins. Kept as an
    # opt-in reference implementation (exactness pinned in test_models).
    sparse_decode: bool = False
    # Phase-decomposed upsample+conv stages (ops/phase_upconv.py): exact,
    # never materializes the 2x maps; up_3 gathers chosen pixels straight
    # from the low-res phase grid (no depth-to-space).
    phase_upsample: bool = False
    # route the phase-conv backward through the hand-derived transpose
    # (grad-scan contexts only — see PSPUpsample.scan_safe_phase_vjp)
    scan_safe_phase_vjp: bool = False
    bn_axis: Optional[str] = None  # see models/resnet.py BasicBlock.bn_axis

    @nn.compact
    def __call__(self, x, *, train: bool = False, choose=None):
        f = DilatedResNet18(dtype=self.dtype, bn_axis=self.bn_axis,
                            name="feats")(x, train=train)
        p = PSPModule(out_features=self.psp_out, sizes=self.sizes,
                      dtype=self.dtype, name="psp")(f)
        # upstream uses nn.Dropout2d: whole CHANNELS drop per sample, not
        # elements — broadcast over the spatial dims reproduces that
        # (training-time only; eval-mode forward parity is unaffected)
        p = nn.Dropout(0.3, deterministic=not train, broadcast_dims=(1, 2),
                       name="drop_1")(p)
        p = PSPUpsample(256, dtype=self.dtype, use_pallas=self.use_pallas,
                        use_phase=self.phase_upsample,
                        scan_safe_phase_vjp=self.scan_safe_phase_vjp,
                        name="up_1")(p)
        p = nn.Dropout(0.15, deterministic=not train, broadcast_dims=(1, 2),
                       name="drop_2a")(p)
        p = PSPUpsample(64, dtype=self.dtype, use_pallas=self.use_pallas,
                        use_phase=self.phase_upsample,
                        scan_safe_phase_vjp=self.scan_safe_phase_vjp,
                        name="up_2")(p)
        p = nn.Dropout(0.15, deterministic=not train, broadcast_dims=(1, 2),
                       name="drop_2b")(p)
        if choose is not None and self.sparse_decode:
            kernel, bias, alpha = _UpsampleParams(
                out_channels=64, in_features=p.shape[-1], name="up_3")()
            p = sparse_upsample_conv_prelu(
                p, kernel.astype(self.dtype), bias, alpha, choose)
            p = p[:, :, None, :]  # (B, N, 1, 64)
        elif choose is not None and self.phase_upsample:
            from plr2_tpu.ops.phase_upconv import phase_upconv3x3_prelu_gather

            kernel, bias, alpha = _UpsampleParams(
                out_channels=64, in_features=p.shape[-1], name="up_3")()
            p = phase_upconv3x3_prelu_gather(
                p.astype(self.dtype), kernel, bias, alpha, choose,
                scan_safe_vjp=self.scan_safe_phase_vjp)
            p = p[:, :, None, :]  # (B, N, 1, 64)
        else:
            p = PSPUpsample(64, dtype=self.dtype, use_pallas=self.use_pallas,
                            use_phase=self.phase_upsample,
                            scan_safe_phase_vjp=self.scan_safe_phase_vjp,
                            name="up_3")(p)
            if choose is not None:
                b, h, w, c = p.shape
                p = jnp.take_along_axis(p.reshape(b, h * w, c),
                                        choose[..., None], axis=1)
                p = p[:, :, None, :]  # (B, N, 1, 64): 1x1 conv per-row dense
        p = nn.Conv(self.emb_dim, (1, 1), dtype=self.dtype, name="final")(p)
        if self.log_softmax_final:
            p = jax.nn.log_softmax(p, axis=-1)
        if choose is not None:
            p = p[:, :, 0, :]  # (B, N, emb_dim)
        return p
