"""PoseNet / PoseRefineNet (flax.linen) — dense per-point color+geometry
fusion with per-point pose regression heads.

Re-design of the reference's lib/network.py (SURVEY.md section 2 #3-#5).
All the reference's 1x1 Conv1d stacks become Dense layers over the last
axis of (B, N, C) tensors — on TPU these are exactly the batched matmuls
the MXU wants, and XLA fuses the interleaved ReLUs/concats. With
`use_pallas=True` the three pose-head MLP ladders additionally run as one
hand-written Pallas kernel each (`ops.pallas_fusion.fused_mlp_head`):
the whole 1408->640->256->128->K ladder stays VMEM-resident per row
block, so the (B*N, 1408) fused feature is read from HBM once per head
with no intermediate-activation round-trips. Parameter trees are
IDENTICAL between the two paths (same names, shapes, initializers), so
checkpoints are interchangeable.

Shape contract (matches the reference forward, transposed to channel-last):
  PoseNet(img_emb HxWx32 gathered at `choose`, cloud (B,N,3), obj (B,))
    -> pred_r (B,N,4) wxyz (unnormalized), pred_t (B,N,3),
       pred_c (B,N,1) in (0,1), emb (B,N,32)
  PoseRefineNet(new_points (B,N,3), emb (B,N,32), obj (B,))
    -> pred_r (B,1,4), pred_t (B,1,3)

Dimension ladder (identical to the reference so weights are transplantable):
  geom 3->64->128, color 32->64->128, fuse concat(128)+concat(256),
  512 -> 1024 -> global mean-pool; per-point feature 128+256+1024 = 1408;
  heads 1408->640->256->128->num_obj*{4,3,1}; refiner feat 384->512->1024,
  heads 1024->512->128->num_obj*{4,3}.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from plr2_tpu.models.pspnet import PSPNet


def _global_point_mean(y: jnp.ndarray, points_axis: Optional[str],
                       keepdims: bool) -> jnp.ndarray:
    """Mean over the point axis (dim 1), optionally across a mesh axis.

    With `points_axis`, the (B, N_local, C) input is one shard of the point
    dimension inside a `shard_map` over that mesh axis: the global mean is
    the pmean of equal-sized local means — the sequence-parallel form of
    the reference's AvgPool1d(num_points) global feature (one tiny ICI
    all-reduce per pool). See parallel/point_parallel.py."""
    local = jnp.mean(y, axis=1, keepdims=keepdims)
    if points_axis is not None:
        local = jax.lax.pmean(local, points_axis)
    return local


def gather_emb(emb_map: jnp.ndarray, choose: jnp.ndarray) -> jnp.ndarray:
    """Gather per-pixel embeddings at flat crop indices.

    emb_map: (B, H, W, C); choose: (B, N) int32 flat indices into H*W.
    Returns (B, N, C). Mirrors the reference's torch.gather on the
    flattened feature map.
    """
    b, h, w, c = emb_map.shape
    flat = emb_map.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, choose[..., None], axis=1)


class PoseNetFeat(nn.Module):
    """Dense fusion trunk: per-point geometry & color MLPs + global feature.

    Returns the (B, N, 1408) fused per-point feature.
    """

    dtype: Any = jnp.float32
    points_axis: Optional[str] = None  # mesh axis for sequence parallelism

    @nn.compact
    def __call__(self, cloud: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        d = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)  # noqa: E731
        x = nn.relu(d(64, "conv1")(cloud))
        e = nn.relu(d(64, "e_conv1")(emb))
        feat_1 = jnp.concatenate([x, e], axis=-1)  # (B, N, 128)

        x = nn.relu(d(128, "conv2")(x))
        e = nn.relu(d(128, "e_conv2")(e))
        feat_2 = jnp.concatenate([x, e], axis=-1)  # (B, N, 256)

        y = nn.relu(d(512, "conv5")(feat_2))
        y = nn.relu(d(1024, "conv6")(y))
        # AvgPool1d(num_points); pmean across point shards under SP
        glob = _global_point_mean(y, self.points_axis, keepdims=True)
        glob = jnp.broadcast_to(glob, (y.shape[0], y.shape[1], 1024))
        return jnp.concatenate([feat_1, feat_2, glob], axis=-1)  # (B, N, 1408)


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact tree (kernel/bias, same
    initializers) but no compute — the Pallas head path consumes the raw
    weights, and checkpoints stay interchangeable with the XLA path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class PoseNet(nn.Module):
    """Full estimator: color CNN + dense fusion + per-point pose heads."""

    num_points: int
    num_objects: int
    emb_dim: int = 32
    dtype: Any = jnp.float32
    use_pallas: bool = False  # fused Pallas head kernels (interpret off-TPU)
    phase_upsample: bool = False  # phase-decomposed PSP upsample stages
    # hand-derived phase-conv backward for grad-scan contexts (see
    # ops/phase_upconv.py _phase_conv_flat_cv)
    scan_safe_phase_vjp: bool = False
    points_axis: Optional[str] = None  # mesh axis for sequence parallelism
    bn_axis: Optional[str] = None  # see models/resnet.py BasicBlock.bn_axis

    @nn.compact
    def __call__(self, img, cloud, choose, obj, *, train: bool = False):
        """img: (B, H, W, 3) normalized crop; cloud: (B, N, 3);
        choose: (B, N) int32; obj: (B,) int32 object index.

        With `points_axis` set, cloud/choose hold one shard of the point
        dimension (inside shard_map over that mesh axis); img stays
        replicated and the CNN runs whole per device — only the global
        pool crosses shards. Everything else is per-point."""
        # gather-before-final-conv: exact commute (1x1 conv + per-pixel
        # log_softmax), skips the full-res 32ch map + softmax
        emb = PSPNet(emb_dim=self.emb_dim, dtype=self.dtype,
                     use_pallas=self.use_pallas,
                     phase_upsample=self.phase_upsample,
                     scan_safe_phase_vjp=self.scan_safe_phase_vjp,
                     bn_axis=self.bn_axis,
                     name="cnn")(img, train=train, choose=choose)  # (B, N, 32)
        feat = PoseNetFeat(dtype=self.dtype, points_axis=self.points_axis,
                           name="feat")(cloud, emb)

        def head_pallas(out_dim: int, tag: str) -> jnp.ndarray:
            from plr2_tpu.ops.pallas_fusion import fused_mlp_head

            params = []
            c_in = feat.shape[-1]
            for f, i in ((640, 1), (256, 2), (128, 3),
                         (self.num_objects * out_dim, 4)):
                k, bias = _DenseParams(features=f, in_features=c_in,
                                       name=f"conv{i}_{tag}")()
                params.append((k.astype(self.dtype), bias.astype(self.dtype)))
                c_in = f
            b, n = feat.shape[0], feat.shape[1]
            x2d = feat.reshape(b * n, feat.shape[-1])
            interpret = jax.default_backend() != "tpu"
            return fused_mlp_head(x2d, tuple(params), interpret).reshape(
                b, n, self.num_objects * out_dim)

        def select_obj(h, out_dim: int) -> jnp.ndarray:
            # (B, N, num_obj * out_dim) -> the query object's rows
            b, n = h.shape[0], h.shape[1]
            h = h.reshape(b, n, self.num_objects, out_dim)
            sel = obj[:, None, None, None]
            return jnp.take_along_axis(
                h, jnp.broadcast_to(sel, (b, n, 1, out_dim)), axis=2
            )[:, :, 0, :]

        def head_xla(out_dim: int, tag: str, h1) -> jnp.ndarray:
            h = h1
            for f, i in ((256, 2), (128, 3)):
                h = nn.relu(nn.Dense(f, dtype=self.dtype,
                                     name=f"conv{i}_{tag}")(h))
            # the query-object selection commutes with the final matmul:
            # gather the object's weight COLUMNS (tiny) and run a batched
            # einsum, instead of computing all num_obj outputs and
            # gathering rows after — the post-matmul take_along_axis on
            # (B, N, num_obj, out_dim) measured ~14 ms at batch 128 on
            # v5e (trailing dims of 4/3/1 tile terribly), 3x the cost of
            # the entire matmul ladder (tools/bench_heads.py)
            k, bias = _DenseParams(
                features=self.num_objects * out_dim, in_features=128,
                name=f"conv4_{tag}")()
            k = k.astype(self.dtype).reshape(128, self.num_objects, out_dim)
            ksel = jnp.take(k, obj, axis=1).transpose(1, 0, 2)  # (B,128,od)
            bsel = bias.astype(self.dtype).reshape(
                self.num_objects, out_dim)[obj]  # (B, od)
            return jnp.einsum("bnk,bko->bno", h, ksel) + bsel[:, None, :]

        if self.use_pallas:
            pred_r = select_obj(head_pallas(4, "r"), 4)
            pred_t = select_obj(head_pallas(3, "t"), 3)
            pred_c = select_obj(head_pallas(1, "c"), 1)
        else:
            # level-1: the three 1408->640 matmuls share `feat`; apply
            # them as ONE 1408->1920 matmul (kernels concatenated at
            # apply time — exact per-column math, identical param tree,
            # feat is read from HBM once instead of three times)
            l1 = []
            for tag in ("r", "t", "c"):
                k, bias = _DenseParams(features=640, in_features=feat.shape[-1],
                                       name=f"conv1_{tag}")()
                l1.append((k.astype(self.dtype), bias.astype(self.dtype)))
            kcat = jnp.concatenate([k for k, _ in l1], axis=1)
            bcat = jnp.concatenate([b_ for _, b_ in l1], axis=0)
            h1 = nn.relu(feat @ kcat + bcat)  # (B, N, 1920)
            pred_r = head_xla(4, "r", h1[..., 0:640])
            pred_t = head_xla(3, "t", h1[..., 640:1280])
            pred_c = head_xla(1, "c", h1[..., 1280:1920])
        pred_c = jax.nn.sigmoid(pred_c)
        return pred_r, pred_t, pred_c, emb


class PoseRefineNetFeat(nn.Module):
    """Refiner trunk: two-scale concat (384) -> 512 -> 1024 -> global pool."""

    dtype: Any = jnp.float32
    points_axis: Optional[str] = None  # mesh axis for sequence parallelism

    @nn.compact
    def __call__(self, cloud: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        d = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)  # noqa: E731
        x = nn.relu(d(64, "conv1")(cloud))
        e = nn.relu(d(64, "e_conv1")(emb))
        feat_1 = jnp.concatenate([x, e], axis=-1)  # 128

        x = nn.relu(d(128, "conv2")(x))
        e = nn.relu(d(128, "e_conv2")(e))
        feat_2 = jnp.concatenate([x, e], axis=-1)  # 256

        y = jnp.concatenate([feat_1, feat_2], axis=-1)  # 384
        y = nn.relu(d(512, "conv5")(y))
        y = nn.relu(d(1024, "conv6")(y))
        return _global_point_mean(y, self.points_axis, keepdims=False)


class PoseRefineNet(nn.Module):
    """Residual pose-delta regressor applied iteratively outside/inside scan."""

    num_points: int
    num_objects: int
    dtype: Any = jnp.float32
    points_axis: Optional[str] = None  # mesh axis for sequence parallelism

    @nn.compact
    def __call__(self, cloud, emb, obj):
        feat = PoseRefineNetFeat(dtype=self.dtype,
                                 points_axis=self.points_axis,
                                 name="feat")(cloud, emb)

        def head(out_dim: int, tag: str) -> jnp.ndarray:
            h = feat
            for f, i in ((512, 1), (128, 2)):
                h = nn.relu(nn.Dense(f, dtype=self.dtype, name=f"conv{i}_{tag}")(h))
            h = nn.Dense(self.num_objects * out_dim, dtype=self.dtype,
                         name=f"conv3_{tag}")(h)
            b = h.shape[0]
            h = h.reshape(b, self.num_objects, out_dim)
            sel = jnp.broadcast_to(obj[:, None, None], (b, 1, out_dim))
            return jnp.take_along_axis(h, sel, axis=1)  # (B, 1, out_dim)

        pred_r = head(4, "r")  # (B, 1, 4)
        pred_t = head(3, "t")  # (B, 1, 3)
        return pred_r, pred_t
