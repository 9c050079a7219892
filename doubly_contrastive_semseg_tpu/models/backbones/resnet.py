"""Dilated ResNet-50/101 backbone for the DeepLab family.

Re-design of reference ``network/backbone/resnet.py`` (torchvision-style
ResNet with ``replace_stride_with_dilation``): when a stage's stride is
replaced, its convs dilate by the accumulated factor instead of
downsampling — output stride 8 ([F,T,T]) or 16 ([F,F,T]), selected by the
factory (``network/modeling.py:46-52``).

Returns {'low_level': layer1 (256 ch), 'out': layer4 (2048 ch)} — the
``IntermediateLayerGetter`` contract (``network/modeling.py:64``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import batch_norm, conv_kxk, max_pool_3x3_s2

Dtype = Any


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out_ch = self.planes * self.expansion
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(x)
        out = batch_norm(self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv_kxk(self.planes, 3, self.stride, dilation=self.dilation,
                       dtype=self.dtype, name="conv2")(out)
        out = batch_norm(self.dtype, name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv3")(out)
        out = batch_norm(self.dtype, name="bn3")(out, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="downsample_conv")(x)
            residual = batch_norm(self.dtype, name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


class DilatedResNet(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, True)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = batch_norm(self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        out: Dict[str, jax.Array] = {}
        dilation = 1
        stage_planes = (64, 128, 256, 512)
        for si, (planes, n_blocks) in enumerate(zip(stage_planes, self.layers)):
            stride = 1 if si == 0 else 2
            # torchvision convention: when a stage's stride is replaced, the
            # FIRST block's 3×3 conv keeps the PREVIOUS dilation; only the
            # remaining blocks use the doubled one (torchvision _make_layer;
            # proven against the reference oracle in tests)
            prev_dilation = dilation
            if si > 0 and self.replace_stride_with_dilation[si - 1]:
                dilation *= stride
                stride = 1
            for bi in range(n_blocks):
                x = Bottleneck(planes=planes, stride=stride if bi == 0 else 1,
                               dilation=prev_dilation if bi == 0 else dilation,
                               dtype=self.dtype,
                               name=f"layer{si + 1}_{bi}")(x, train)
            if si == 0:
                out["low_level"] = x  # 256 ch @ 1/4
        out["out"] = x  # 2048 ch @ 1/output_stride
        return out


def resnet50(replace_stride_with_dilation, dtype=jnp.float32) -> DilatedResNet:
    return DilatedResNet((3, 4, 6, 3), tuple(replace_stride_with_dilation), dtype)


def resnet101(replace_stride_with_dilation, dtype=jnp.float32) -> DilatedResNet:
    return DilatedResNet((3, 4, 23, 3), tuple(replace_stride_with_dilation), dtype)
