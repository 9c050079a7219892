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

# torch BatchNorm momentum m updates running <- (1-m)*running + m*batch.
# Reference uses m=0.1 everywhere that matters (nn.BatchNorm2d default in the
# backbone; _BNReluConv default bn_momentum=0.1, network/utils.py:36).
TORCH_BN_MOMENTUM = 0.1


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact *training* semantics.

    flax ``nn.BatchNorm`` folds the **biased** batch variance into the
    running stats; torch folds the **unbiased** one (``var * n/(n-1)``,
    torch ``_BatchNorm.forward``). Both normalize activations with the biased
    variance, so eval forwards agree — but running stats drift apart at a
    steady-state relative offset of ``1/(n-1)``, which at the pyramid's
    deepest level (6×6 spatial at 768² crops) is ~0.3%: visible at the
    0.1 %p mIoU parity bar and caught by ``tests/test_train_oracle.py``.

    Variable names/collections match flax ``nn.BatchNorm`` exactly
    (``params/{scale,bias}``, ``batch_stats/{mean,var}``) so checkpoints and
    the torch converter are unaffected.

    Under a batch-sharded jit the batch moments are computed over the
    *global* batch — XLA GSPMD inserts the cross-replica reduction
    automatically, which subsumes the reference's entire hand-rolled
    ``sync_batchnorm/`` package (``batchnorm.py:38-281``); ``n`` below is the
    global element count since jit traces global shapes.
    """

    momentum_torch: float = TORCH_BN_MOMENTUM
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    use_running_average: Optional[bool] = None
    # torch's reentrant gradient checkpointing re-runs the wrapped BN during
    # backward, folding the SAME batch moments into the running stats a second
    # time (reference do_efficient_fwd, resnet_pyramid.py:39-44 — every
    # BasicBlock bn1/bn2 when efficient=True). update_passes=2 reproduces
    # that, including the recompute ORDER for the pyramid's shared trunk: the
    # forward loop updates with per-level moments m_0..m_{L-1} and autograd's
    # backward recomputes in reverse level order, so the torch sequence per BN
    # is [m_0..m_{L-1}, m_{L-1}..m_0]. Given the call index l and total L via
    # __call__, the sequential-equivalent update is
    #   ra <- A_l * ra + B_l * m_l,
    #   A_l = (1-m)^{2L} for l=0 else 1,  B_l = m((1-m)^{2L-1-l} + (1-m)^l).
    update_passes: int = 1

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None,
                 use_running_average: Optional[bool] = None,
                 shared_idx: int = 0, shared_total: int = 1,
                 features: Optional[int] = None):
        feats = features if x is None else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feats,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feats,))
        if x is None:
            # raw access (fused Pallas stem callers): declare the variables,
            # return them untouched — same tree paths as a normal call
            return scale, bias, ra_mean.value, ra_var.value
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            # biased; clamp ≥0 — the one-pass E[x²]−E[x]² form can go
            # slightly negative under f32 cancellation (|mean| ≫ std),
            # where rsqrt(var+eps) would emit NaN. torch's true variance
            # is non-negative by construction, so clamping only ever
            # moves us TOWARD the reference.
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // feats
                m = self.momentum_torch
                var_unbiased = var * (n / max(n - 1, 1))
                if self.update_passes == 2:
                    ll, tt = shared_idx, shared_total
                    a = (1.0 - m) ** (2 * tt) if ll == 0 else 1.0
                    bcoef = m * ((1.0 - m) ** (2 * tt - 1 - ll) + (1.0 - m) ** ll)
                    ra_mean.value = a * ra_mean.value + bcoef * mean
                    ra_var.value = a * ra_var.value + bcoef * var_unbiased
                else:
                    ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                    ra_var.value = (1.0 - m) * ra_var.value + m * var_unbiased
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        y = (x - mean) * inv + bias
        return y.astype(self.dtype or x.dtype)


def batch_norm(
    dtype: Dtype,
    name: Optional[str] = None,
    momentum: float = TORCH_BN_MOMENTUM,
    epsilon: float = 1e-5,
) -> TorchBatchNorm:
    """BatchNorm with torch-compatible momentum/eps/running-stat semantics;
    ``use_running_average`` is threaded per-call."""
    return TorchBatchNorm(
        momentum_torch=momentum,
        epsilon=epsilon,
        dtype=dtype,
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


class RawBatchNorm(nn.Module):
    """BatchNorm whose scale/bias/mean/var are readable for fused Pallas
    paths; variable names/paths match ``flax.linen.BatchNorm`` so checkpoints
    and the torch converter are unaffected."""

    features: int
    momentum: float = 1.0 - TORCH_BN_MOMENTUM
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x=None, *, train: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        if x is None:  # raw access
            return scale, bias, ra_mean.value, ra_var.value
        if train:
            mean = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
            var = jnp.var(x.astype(jnp.float32), axis=(0, 1, 2))
            if not self.is_initializing():
                # torch folds the UNBIASED batch var into the running stats
                n = x.size // x.shape[-1]
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + \
                    (1 - self.momentum) * var * (n / max(n - 1, 1))
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var.astype(jnp.float32) + 1e-5).astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class PreActConv(nn.Module):
    """BN→ReLU→conv with raw-readable parameters (param paths identical to
    ``BNReluConv``: ``norm/{scale,bias,mean,var}``, ``conv/kernel``)."""

    features: int
    k: int = 3
    dtype: Dtype = jnp.float32

    def _parts(self):
        norm = RawBatchNorm(self.features, dtype=self.dtype, name="norm")
        kernel_holder = _ConvKernel((self.k, self.k, self.features, self.features),
                                    name="conv")
        return norm, kernel_holder

    @nn.compact
    def __call__(self, x=None, *, train: bool = False):
        norm, kh = self._parts()
        kernel = kh()
        if x is None:
            s, b, m, v = norm(None)
            return kernel, s, b, m, v
        y = nn.relu(norm(x, train=train))
        p = self.k // 2
        return jax.lax.conv_general_dilated(
            y, kernel.astype(y.dtype), (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _ConvKernel(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            self.shape, jnp.float32)


class UpsampleBlend(nn.Module):
    """Bilinear-upsample to the skip's resolution, add skip, 3×3 BNReluConv
    (reference ``_UpsampleBlend``, ``network/utils.py:79-102``).

    A fused Pallas kernel for the whole step exists (``ops/blend_pallas.py``,
    2× faster than the *standalone* XLA blend) but measured slightly slower
    in-context — XLA already fuses the upsample/add/BN/ReLU into the conv —
    so ``fuse_inference`` defaults to False."""

    features: int
    use_bn: bool = True
    use_skip: bool = True
    k: int = 3
    fuse_inference: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, *, train: bool) -> jax.Array:
        hh, ww, c = skip.shape[-3], skip.shape[-2], skip.shape[-1]
        fusable = (self.fuse_inference and self.use_bn and self.use_skip
                   and self.k == 3
                   and x.shape[-3] * 2 == hh and x.shape[-2] * 2 == ww)
        if fusable and not train and not self.is_initializing() \
                and jax.default_backend() != "cpu" and hh >= 64:
            from ..ops.blend_pallas import blend_kernel_supported, fused_upsample_blend

            if blend_kernel_supported(hh, ww, c):
                pre = PreActConv(self.features, k=3, dtype=self.dtype,
                                 name="blend_conv")
                kernel, s, b, m, v = pre(None)
                return fused_upsample_blend(x, skip, kernel, s, b, m, v,
                                            out_dtype=self.dtype)
        if self.use_bn and self.k == 3:
            x = resize_bilinear(x, (hh, ww))
            if self.use_skip:
                x = x + skip
            return PreActConv(self.features, k=3, dtype=self.dtype,
                              name="blend_conv")(x, train=train)
        x = resize_bilinear(x, (hh, ww))
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
