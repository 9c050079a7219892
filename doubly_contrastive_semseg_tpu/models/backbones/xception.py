"""AlignedXception backbone (DeepLab variant).

Re-design of reference ``network/backbone/xception.py`` (292 LoC, from
jfzhang95/pytorch-deeplab-xception): entry flow (2 convs + 3 separable-conv
blocks), 16 middle-flow blocks, exit flow; strides after the output-stride
point become dilations. ``low_level`` = entry block 1 output (128 ch @ 1/4),
``out`` = 2048 ch (``network/modeling.py:105-127``)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import batch_norm, conv_kxk

Dtype = Any


class SepConvBN(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c_in = x.shape[-1]
        p = self.dilation
        x = nn.Conv(c_in, (3, 3), strides=(self.stride,) * 2,
                    padding=[(p, p), (p, p)], kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=c_in, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="depthwise")(x)
        x = batch_norm(self.dtype, name="bn_dw")(x, use_running_average=not train)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="pointwise")(x)
        x = batch_norm(self.dtype, name="bn_pw")(x, use_running_average=not train)
        return x


class XBlock(nn.Module):
    features: Tuple[int, int, int]
    stride: int = 1
    dilation: int = 1
    skip_kind: str = "conv"  # conv | sum | none
    start_with_relu: bool = True
    # the reference appends the stride-2 conv (``xception.py:67``) and the
    # ``is_last`` conv (``xception.py:72``) with DEFAULT dilation 1, so the
    # block's final conv ignores the block dilation; only visible at
    # output_stride 8 (block20: [2, 2, 1])
    last_dilation: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out = x
        for i, f in enumerate(self.features):
            if i > 0 or self.start_with_relu:
                out = nn.relu(out)
            last = i == len(self.features) - 1
            s = self.stride if last else 1
            d = self.dilation
            if last and self.last_dilation is not None:
                d = self.last_dilation
            out = SepConvBN(f, stride=s, dilation=d,
                            dtype=self.dtype, name=f"sep{i}")(out, train)
        if self.skip_kind == "conv":
            skip = nn.Conv(self.features[-1], (1, 1),
                           strides=(self.stride,) * 2, use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="skip_conv")(x)
            skip = batch_norm(self.dtype, name="skip_bn")(
                skip, use_running_average=not train)
            return out + skip
        if self.skip_kind == "sum":
            return out + x
        return out


class AlignedXception(nn.Module):
    output_stride: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        dt = self.dtype
        if self.output_stride == 16:
            entry3_stride, mid_dil, exit_dil = 2, 1, (1, 2)
        else:  # output_stride 8
            entry3_stride, mid_dil, exit_dil = 1, 2, (2, 4)

        x = conv_kxk(32, 3, stride=2, dtype=dt, name="conv1")(x)
        x = batch_norm(dt, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = conv_kxk(64, 3, dtype=dt, name="conv2")(x)
        x = batch_norm(dt, name="bn2")(x, use_running_average=not train)
        x = nn.relu(x)

        x = XBlock((128, 128, 128), stride=2, start_with_relu=False,
                   dtype=dt, name="block1")(x, train)
        # reference applies relu AFTER block1 and stores THAT as low_level
        # (xception.py:192-195 "add relu here"); block2 then starts without
        # its leading relu (start_with_relu=False) — numerically idempotent
        # on the already-relu'd input, mirrored here for clarity
        x = nn.relu(x)
        out: Dict[str, jax.Array] = {"low_level": x}  # 128 ch @ 1/4
        x = XBlock((256, 256, 256), stride=2, start_with_relu=False,
                   dtype=dt, name="block2")(x, train)
        x = XBlock((728, 728, 728), stride=entry3_stride, dtype=dt,
                   name="block3")(x, train)
        for i in range(16):  # middle flow
            x = XBlock((728, 728, 728), dilation=mid_dil, skip_kind="sum",
                       dtype=dt, name=f"block{4 + i}")(x, train)
        x = XBlock((728, 1024, 1024), dilation=exit_dil[0], last_dilation=1,
                   dtype=dt, name="block20")(x, train)
        x = nn.relu(SepConvBN(1536, dilation=exit_dil[1], dtype=dt,
                              name="conv3")(x, train))
        x = nn.relu(SepConvBN(1536, dilation=exit_dil[1], dtype=dt,
                              name="conv4")(x, train))
        x = nn.relu(SepConvBN(2048, dilation=exit_dil[1], dtype=dt,
                              name="conv5")(x, train))
        out["out"] = x
        return out
