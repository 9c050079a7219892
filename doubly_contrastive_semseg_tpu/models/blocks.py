"""Shared model blocks (TPU-native re-design of reference ``network/utils.py``).

Everything is NHWC (the TPU-friendly layout), bfloat16-capable (params stay
fp32; ``dtype`` controls compute), with *explicit* symmetric padding so that
stride-2 windows land on the same pixels as torch's ``padding=k//2`` (XLA's
'SAME' pads asymmetrically for even inputs, which would shift every stride-2
feature map by one pixel relative to the reference).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import adaptive_avg_pool, resize_bilinear

Dtype = Any

# torch BatchNorm momentum m updates running <- (1-m)*running + m*batch;
# flax momentum μ updates running <- μ*running + (1-μ)*batch, so μ = 1 - m.
# Reference uses m=0.1 everywhere that matters (nn.BatchNorm2d default in the
# backbone; _BNReluConv default bn_momentum=0.1, network/utils.py:36).
TORCH_BN_MOMENTUM = 0.1


def batch_norm(
    dtype: Dtype,
    name: Optional[str] = None,
    momentum: float = TORCH_BN_MOMENTUM,
) -> nn.BatchNorm:
    """BatchNorm with torch-compatible momentum/eps semantics.

    ``use_running_average`` is threaded per-call. Under a batch-sharded jit
    the batch moments are computed over the *global* batch — XLA GSPMD inserts
    the cross-replica reduction automatically, which subsumes the reference's
    entire hand-rolled ``sync_batchnorm/`` package
    (``network/backbone/sync_batchnorm/batchnorm.py:38-281``).
    """
    return nn.BatchNorm(
        momentum=1.0 - momentum,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def conv_kxk(
    features: int,
    k: int = 3,
    stride: int = 1,
    dilation: int = 1,
    bias: bool = False,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """k×k conv, torch ``padding=k//2`` semantics (explicit symmetric pad)."""
    pad = dilation * (k // 2)
    return nn.Conv(
        features,
        (k, k),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        name=name,
    )


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(kernel=3, stride=2, padding=1)`` (explicit pad)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class SeparableConv(nn.Module):
    """Depthwise k×k + pointwise 1×1 (reference ``network/utils.py:22-33``)."""

    features: int
    k: int = 3
    stride: int = 1
    dilation: int = 1
    bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        pad = self.dilation * (self.k // 2)
        x = nn.Conv(
            c_in,
            (self.k, self.k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=c_in,
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise",
        )(x)
        return x


class BNReluConv(nn.Module):
    """BN → ReLU → conv, the SwiftNet pre-activation unit
    (reference ``network/utils.py:35-49``). Also the segmentation head when
    ``k=1, bias=True`` (reference ``network/weathernet.py:61-62``)."""

    features: int
    k: int = 3
    batch_norm: bool = True
    bias: bool = False
    dilation: int = 1
    bn_momentum: float = TORCH_BN_MOMENTUM
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        if self.batch_norm:
            x = batch_norm(self.dtype, momentum=self.bn_momentum, name="norm")(
                x, use_running_average=not train
            )
        x = nn.relu(x)
        if self.separable:
            x = SeparableConv(self.features, k=self.k, dilation=self.dilation,
                              bias=self.bias, dtype=self.dtype, name="conv")(x)
        else:
            x = conv_kxk(self.features, k=self.k, dilation=self.dilation,
                         bias=self.bias, dtype=self.dtype, name="conv")(x)
        return x


class UpsampleBlend(nn.Module):
    """Bilinear-upsample to the skip's resolution, add skip, 3×3 BNReluConv
    (reference ``_UpsampleBlend``, ``network/utils.py:79-102``)."""

    features: int
    use_bn: bool = True
    use_skip: bool = True
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, *, train: bool) -> jax.Array:
        x = resize_bilinear(x, (skip.shape[-3], skip.shape[-2]))
        if self.use_skip:
            x = x + skip
        x = BNReluConv(self.features, k=self.k, batch_norm=self.use_bn,
                       dtype=self.dtype, name="blend_conv")(x, train=train)
        return x


class Upsample(nn.Module):
    """Skip-bottleneck variant used by the single-scale SwiftNet decoders
    (reference ``_Upsample``, ``network/utils.py:52-77``)."""

    num_maps_in: int
    features: int
    use_bn: bool = True
    k: int = 3
    use_skip: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, *, train: bool) -> jax.Array:
        skip = BNReluConv(self.num_maps_in, k=1, batch_norm=self.use_bn,
                          dtype=self.dtype, name="bottleneck")(skip, train=train)
        x = resize_bilinear(x, (skip.shape[-3], skip.shape[-2]))
        if self.use_skip:
            x = x + skip
        x = BNReluConv(self.features, k=self.k, batch_norm=self.use_bn,
                       dtype=self.dtype, name="blend_conv")(x, train=train)
        return x


class SpatialPyramidPooling(nn.Module):
    """SwiftNet SPP with aspect-aware grids (reference ``network/utils.py:105-156``).

    Grid levels pool to ``(g, max(1, round(ar*g)))`` where ``ar = W/H`` of the
    incoming feature map, then 1×1 BNReluConv, bilinear-up to input size,
    concat, fuse.
    """

    num_levels: int = 3
    bt_size: int = 512
    level_size: int = 128
    out_size: int = 128
    grids: Tuple[int, ...] = (6, 3, 2, 1)
    square_grid: bool = False
    bn_momentum: float = TORCH_BN_MOMENTUM
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        target_hw = (x.shape[-3], x.shape[-2])
        ar = target_hw[1] / target_hw[0]
        x = BNReluConv(self.bt_size, k=1, batch_norm=self.use_bn,
                       bn_momentum=self.bn_momentum, dtype=self.dtype,
                       name="spp_bn")(x, train=train)
        levels = [x]
        for i in range(self.num_levels):
            g = self.grids[i]
            grid = (g, g) if self.square_grid else (g, max(1, round(ar * g)))
            pooled = adaptive_avg_pool(x, grid)
            lvl = BNReluConv(self.level_size, k=1, batch_norm=self.use_bn,
                             bn_momentum=self.bn_momentum, dtype=self.dtype,
                             name=f"spp{i}")(pooled, train=train)
            levels.append(resize_bilinear(lvl, target_hw))
        x = jnp.concatenate(levels, axis=-1)
        x = BNReluConv(self.out_size, k=1, batch_norm=self.use_bn,
                       bn_momentum=self.bn_momentum, dtype=self.dtype,
                       name="spp_fuse")(x, train=train)
        return x
