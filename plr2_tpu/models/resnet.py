"""Dilated ResNet-18 trunk for the PSPNet color encoder (flax.linen, NHWC).

Re-designs the reference's backbone (upstream lib/extractors.py, a
pspnet-pytorch-style ResNet with a 3-conv stem and dilated layer3/layer4 —
SURVEY.md section 2 #2) as TPU-idiomatic NHWC convolutions. Output stride 8:
stem stride 2 -> maxpool stride 2 -> layer2 stride 2; layer3/4 use dilation
2/4 with stride 1.

Structure contract (for weight transplant from the reference):
  stem:  conv3x3(3,64,s2) bn relu | conv3x3(64,64) bn relu |
         conv3x3(64,128) bn relu | maxpool3x3 s2
  layer1: 2x BasicBlock(128->64)   (downsample 1x1 on the first block)
  layer2: 2x BasicBlock(64->128, s2)
  layer3: 2x BasicBlock(128->256, dilation 2)
  layer4: 2x BasicBlock(256->512, dilation 4)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    """ResNet BasicBlock with optional stride/dilation (expansion = 1)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Any = jnp.float32
    # mesh axis to sync train-mode BN moments over (set when the batch is
    # sharded over a MANUAL shard_map axis — composed dp x sp/tp meshes;
    # under plain GSPMD data parallelism the global moments come for free)
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis, name=name,
        )
        residual = x
        pad = self.dilation
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)
        if self.use_downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


def _max_pool_3x3_s2(x):
    """MaxPool2d(kernel_size=3, stride=2, padding=1) — PyTorch semantics."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


class DilatedResNet18(nn.Module):
    """Returns the stride-8, 512-channel feature map (psp_size = 512)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32
    bn_axis: Optional[str] = None  # see BasicBlock.bn_axis

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis, name=name,
        )
        # 3-conv stem (pspnet-style)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(norm("bn2")(x))
        x = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv3")(x)
        x = nn.relu(norm("bn3")(x))
        x = _max_pool_3x3_s2(x)

        specs: Tuple[Tuple[int, int, int], ...] = (
            (64, 1, 1),   # layer1 (inplanes 128 -> 64: needs downsample)
            (128, 2, 1),  # layer2
            (256, 1, 2),  # layer3, dilated
            (512, 1, 4),  # layer4, dilated
        )
        in_planes = 128
        for li, (planes, stride, dilation) in enumerate(specs, start=1):
            for bi in range(self.layers[li - 1]):
                first = bi == 0
                x = BasicBlock(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    use_downsample=first and (stride != 1 or in_planes != planes),
                    dtype=self.dtype,
                    bn_axis=self.bn_axis,
                    name=f"layer{li}_block{bi}",
                )(x, train=train)
            in_planes = planes
        return x
