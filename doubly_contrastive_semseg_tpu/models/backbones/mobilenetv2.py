"""MobileNetV2 backbone with output-stride control for DeepLab.

Re-design of reference ``network/backbone/mobilenetv2.py`` (VainF fork of
torchvision MobileNetV2 with dilation past the output-stride point). Standard
inverted-residual schedule (t, c, n, s):
(1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2) (6,96,3,1) (6,160,3,2) (6,320,1,1).
Once the accumulated stride reaches ``output_stride``, further stride-2
blocks become dilated instead.

Returns {'low_level': features[0:4] output (24 ch @ 1/4),
         'out': last inverted-residual output (320 ch)} — the channel split
used by the factory (``network/modeling.py:85-96``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import batch_norm

Dtype = Any

INVERTED_RESIDUAL_SETTING = [
    # t, c, n, s
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class ConvBNReLU6(nn.Module):
    """conv → BN → ReLU6. The deeplab fork sets padding=0 on EVERY ConvBNReLU
    (``backbone/mobilenetv2.py:36-43``, pad applied to the block INPUT — see
    InvertedResidual), so ``pad`` defaults to 0/VALID; the stereo trunks'
    fork passes an explicit pad at the stem (``network/feature.py:355``)."""

    features: int
    k: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    pad: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        p = self.pad
        x = nn.Conv(self.features, (self.k, self.k),
                    strides=(self.stride, self.stride),
                    padding="VALID" if p == 0 else [(p, p), (p, p)],
                    kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = batch_norm(self.dtype, name="bn")(x, use_running_average=not train)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    """Reference quirk reproduced for checkpoint parity
    (``backbone/mobilenetv2.py:52-82``): the block pads its INPUT by the
    depthwise dilation and runs the whole expand→dw→project stack on the
    padded map with zero conv padding. Because the 1×1 expand's BatchNorm
    shifts the zero border, the depthwise conv sees NON-zero borders — a
    different function from pad-at-depthwise, so import parity requires
    this exact form."""

    features: int
    stride: int = 1
    dilation: int = 1
    expand_ratio: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.features
        d = self.dilation  # fixed_padding(3, d) = (d, d) per side
        out = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        if self.expand_ratio != 1:
            out = ConvBNReLU6(hidden, k=1, dtype=self.dtype, name="expand")(out, train)
        out = ConvBNReLU6(hidden, k=3, stride=self.stride, dilation=self.dilation,
                          groups=hidden, dtype=self.dtype, name="depthwise")(out, train)
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="project")(out)
        out = batch_norm(self.dtype, name="project_bn")(out, use_running_average=not train)
        return x + out if use_res else out


class MobileNetV2(nn.Module):
    output_stride: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        # the reference stem conv has padding 0 (ConvBNReLU default, no
        # fixed_padding wrapper at features[0]) — border pixels are dropped
        x = ConvBNReLU6(32, k=3, stride=2, dtype=self.dtype, name="stem")(x, train)
        current_stride = 2
        dilation = 1
        out: Dict[str, jax.Array] = {}
        block_idx = 1  # features[0] is the stem
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            for i in range(n):
                stride = s if i == 0 else 1
                d = dilation
                if stride == 2 and current_stride >= self.output_stride:
                    dilation *= stride
                    d = dilation // stride  # first dilated block keeps prev rate
                    stride = 1
                x = InvertedResidual(c, stride=stride, dilation=d,
                                     expand_ratio=t, dtype=self.dtype,
                                     name=f"block{block_idx}")(x, train)
                if stride == 2:
                    current_stride *= 2
                block_idx += 1
                if block_idx == 4:  # features[0:4] boundary (modeling.py:86)
                    out["low_level"] = x  # 24 ch @ 1/4
        out["out"] = x  # 320 ch
        return out
