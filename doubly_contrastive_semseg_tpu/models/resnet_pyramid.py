"""SwiftNet pyramid ResNet backbone — the flagship encoder/decoder.

TPU-native re-design of reference ``network/backbone/resnet_pyramid.py:55-417``:

- a 3-level input image pyramid (bicubic /2, lowered to stride-2 depthwise
  convs — see ``ops/interpolate.py``) feeds a *shared* ResNet-18/34 trunk;
- the stem BatchNorm is per-pyramid-level (``bn1_0/1/2``, reference
  ``resnet_pyramid.py:159-165``) while every other parameter is shared;
- each stage's output passes a 1×1 bottleneck to ``num_features`` (128)
  channels and is accumulated into a resolution-indexed skip list
  (``skips[idx + stage]``, reference ``resnet_pyramid.py:345-348``);
- the decoder walks 5 ``UpsampleBlend`` steps from the coarsest skip sum up
  to 1/4 input resolution (reference ``resnet_pyramid.py:372-376``).

Layout is NHWC; compute dtype is configurable (bf16 on TPU); optional
``efficient`` rematerialization mirrors the reference's
``torch.utils.checkpoint`` wrapping (``resnet_pyramid.py:39-44``) via
``flax.linen.remat``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BNReluConv, UpsampleBlend, batch_norm, conv_kxk, max_pool_3x3_s2

Dtype = Any

# ImageNet-scale normalization constants the reference bakes into the backbone
# (network/weathernet.py:37-38, passed into ResNet at resnet_pyramid.py:142-143).
IMAGENET_MEAN = (73.15, 82.90, 72.3)
IMAGENET_STD = (47.67, 48.49, 47.73)


class _StemKernel(nn.Module):
    """Holds the s2d stem conv kernel at the checkpoint path
    ``feature_extractor/conv1/kernel`` (instantiated with name='conv1').

    The stored 4×4×12 form covers an 8×8 dense footprint; the 15 slots per
    (in, out) pair outside the dense 7×7 (reference ``resnet.py`` conv1) are
    structurally zero. They are zeroed at init AND multiplied out in the
    forward pass so their gradients vanish identically — otherwise training
    would grow taps the torch reference cannot represent (caught by the SGD
    train-step oracle)."""

    shape: Tuple[int, int, int, int] = (4, 4, 12, 64)

    @nn.compact
    def __call__(self) -> jax.Array:
        from ..ops.input_pipeline import stem_s2d_mask

        mask = jnp.asarray(stem_s2d_mask(7))
        base = nn.initializers.variance_scaling(2.0, "fan_out",
                                                "truncated_normal")

        def init(key, shape, dtype):
            return base(key, shape, dtype) * mask

        return self.param("kernel", init, self.shape, jnp.float32) * mask


class _StemBN(nn.Module):
    """BatchNorm whose raw scale/bias/mean/var are readable for the fused
    Pallas stem; variable names/paths match ``flax.linen.BatchNorm`` so
    checkpoints and the torch converter are unaffected."""

    momentum: float = 0.9  # flax convention (torch m=0.1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, *, train: bool = False):
        features = 64
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        if x is None:  # raw access for the fused kernel
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


class BasicBlock(nn.Module):
    """Pre-norm ResNet basic block (reference ``resnet_pyramid.py:55-89``):
    conv3x3(s)→BN→ReLU→conv3x3→BN, projection shortcut on stride/width change,
    add, ReLU."""

    planes: int
    stride: int = 1
    use_bn: bool = True
    # 2 when gradient checkpointing is on: torch's reentrant checkpoint
    # re-runs (conv,bn) pairs during backward, folding the same batch moments
    # into bn1/bn2's running stats twice (do_efficient_fwd,
    # resnet_pyramid.py:39-44); the un-checkpointed downsample BN updates once
    bn_update_passes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, level: int = 0,
                 num_levels: int = 1) -> jax.Array:
        from .blocks import TorchBatchNorm

        residual = x
        out = conv_kxk(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        if self.use_bn:
            out = TorchBatchNorm(dtype=self.dtype, name="bn1",
                                 update_passes=self.bn_update_passes)(
                out, use_running_average=not train,
                shared_idx=level, shared_total=num_levels)
        out = nn.relu(out)
        out = conv_kxk(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out)
        if self.use_bn:
            out = TorchBatchNorm(dtype=self.dtype, name="bn2",
                                 update_passes=self.bn_update_passes)(
                out, use_running_average=not train,
                shared_idx=level, shared_total=num_levels)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                               name="downsample_conv")(x)
            if self.use_bn:
                residual = batch_norm(self.dtype, name="downsample_bn")(
                    residual, use_running_average=not train)
        return nn.relu(out + residual)


class PyramidResNet(nn.Module):
    """Shared-trunk pyramid ResNet; returns (decoded 128-ch features @ 1/4 res,
    additional dict with the coarsest skip)."""

    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    num_features: int = 128
    pyramid_levels: int = 3
    use_bn: bool = True
    k_bneck: int = 1
    k_upsample: int = 3
    efficient: bool = False
    output_stride: int = 4
    # eval-only fused Pallas stem (ops/stem_pallas.py): measured 1.45x the
    # XLA conv+bn+relu+pool at the 2048x1024 serving shape; falls back to
    # XLA whenever unsupported (CPU backend, training, odd shapes)
    fuse_stem: bool = True
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    dtype: Dtype = jnp.float32

    @property
    def num_skip_levels(self) -> int:
        import math

        num_bn_remove = max(0, int(math.log2(self.output_stride) - 2))
        return self.pyramid_levels + 3 - num_bn_remove

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        from ..ops.input_pipeline import (fused_pyramid_s2d,
                                          s2d_stem_geometry,
                                          stem_kernel_for_level0)

        # normalization + bicubic pyramid + s2d(2) collapse into one strided
        # conv per level (composed filters; see ops/input_pipeline.py) and
        # the stem becomes an s2d 4×4/s1 conv — C=3 NHWC elementwise work
        # starves the TPU vector lanes. Reference semantics are preserved
        # (normalization: resnet_pyramid.py:296-304, pyramid: :306-314,
        # stem: :139; weights convertible bit-exactly from the dense form).
        pyramid = fused_pyramid_s2d(image, self.pyramid_levels,
                                    self.mean, self.std, self.dtype)

        block_cls = BasicBlock
        if self.efficient:
            # rematerialize each block's activations in backward, mirroring the
            # reference's torch.utils.checkpoint use (resnet_pyramid.py:39-44)
            block_cls = nn.remat(BasicBlock, static_argnums=(2, 3, 4))

        # shared trunk modules (weight sharing across pyramid levels comes from
        # calling the same module instances on every level)
        k_s2d, pad_s2d = s2d_stem_geometry(7)
        stem_kernel = _StemKernel((k_s2d, k_s2d, 12, 64), name="conv1")()
        # level 0 arrives dy-major for NHWC/planar inputs (c-major for
        # host-packed s2d); levels >= 1 are level-kernel OUTPUTS, always
        # c-major — so only the level-0 stem absorbs the permutation
        stem_kernel_l0 = stem_kernel_for_level0(stem_kernel, image)
        stem_bns = [_StemBN(dtype=self.dtype, name=f"bn1_{i}")
                    for i in range(self.pyramid_levels)]
        stage_planes = (64, 128, 256, 512)
        stages = []
        for si, (planes, n_blocks) in enumerate(zip(stage_planes, self.layers)):
            blocks = []
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(block_cls(planes=planes, stride=stride, use_bn=self.use_bn,
                                        bn_update_passes=2 if self.efficient else 1,
                                        dtype=self.dtype, name=f"layer{si + 1}_{bi}"))
            stages.append(blocks)

        bnecks = [
            conv_kxk(self.num_features, k=self.k_bneck, dtype=self.dtype,
                     name=f"upsample_bottlenecks{j + 1}")
            for j in range(4)
        ]

        num_skips = self.num_skip_levels
        skips: Dict[int, list] = {lvl: [] for lvl in range(num_skips)}
        additional: Dict[str, Any] = {"pyramid": pyramid}

        for idx, p in enumerate(pyramid):  # p is already the s2d stem input
            # Stem kernel history (measured; see also ops/stem_pallas.py):
            # (a) fused Pallas stem (round 1) and (b) W-folded MXU form
            # (round 2) tie-or-lose to XLA; (c) phase-expanded stride-2 form
            # + slice-max pool (round 3): conv wins isolated but the pool's
            # padded slice-maxes don't fuse — 190 vs 209 fps. (d) The
            # row-quad Pallas kernel with in-register pool epilogue (below)
            # is the first WIN: 6.5 vs 9.4 ms isolated at L0 — used at eval
            # on TPU; training and CPU keep the plain-XLA form.
            from ..ops import stem_pallas

            # not during init: bench/trainer init on the host CPU device
            # (jax.default_device(cpu)) where Mosaic cannot lower; the XLA
            # branch creates the identical param/stat tree
            use_fused = (not train and self.fuse_stem
                         and not self.is_initializing()
                         and stem_pallas.supports(p)
                         and (jax.default_backend() not in ("cpu",)
                              or os.environ.get("DCSS_STEM_INTERPRET")))
            k_lvl = stem_kernel_l0 if idx == 0 else stem_kernel
            if use_fused:
                bn_scale, bn_bias, bn_mean, bn_var = stem_bns[idx]()
                inv = jax.lax.rsqrt(bn_var + 1e-5)
                x = stem_pallas.fused_stem_pool(
                    p, k_lvl, bn_scale * inv,
                    bn_bias - bn_mean * bn_scale * inv,
                    interpret=bool(os.environ.get("DCSS_STEM_INTERPRET")))
            else:
                x = jax.lax.conv_general_dilated(
                    p, k_lvl.astype(p.dtype), (1, 1), [pad_s2d, pad_s2d],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = stem_bns[idx](x, train=train)
                x = nn.relu(x)
                x = max_pool_3x3_s2(x)
            for j, blocks in enumerate(stages):
                for blk in blocks:
                    x = blk(x, train, idx, len(pyramid))
                skips[idx + j].append(bnecks[j](x))

        # reverse: skips_r[0] is the coarsest level (reference resnet_pyramid.py:361)
        skips_r = [skips[lvl] for lvl in reversed(range(num_skips))]
        x = skips_r[0][0]
        additional["skips_0"] = x  # (B, h/128, w/128, 128) coarse global feature

        for i in range(1, num_skips):
            skip_sum = skips_r[i][0]
            for s in skips_r[i][1:]:
                skip_sum = skip_sum + s
            x = UpsampleBlend(self.num_features, use_bn=self.use_bn, k=self.k_upsample,
                              dtype=self.dtype, name=f"upsample_blends{i}")(
                x, skip_sum, train=train)

        return x, additional


def resnet18_pyramid(dtype: Dtype = jnp.float32, efficient: bool = False, **kw) -> PyramidResNet:
    """SwiftNet-RN18 (reference ``resnet_pyramid.py:397-405``; ImageNet init is
    loaded separately via ``utils/torch_convert.py``)."""
    return PyramidResNet(layers=(2, 2, 2, 2), dtype=dtype, efficient=efficient, **kw)


def resnet34_pyramid(dtype: Dtype = jnp.float32, efficient: bool = False, **kw) -> PyramidResNet:
    return PyramidResNet(layers=(3, 4, 6, 3), dtype=dtype, efficient=efficient, **kw)
