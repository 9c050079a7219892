"""Older pyramid-ResNet revision ("back"): per-level BN in EVERY block.

Reference ``network/backbone/resnet_pyramid_back.py`` (294 LoC): identical to
the flagship pyramid except each ``BasicBlock`` carries a BatchNorm
ModuleList indexed by the pyramid level (``bn1/bn2 = ModuleList(...)``,
``forward(x, level)``, resnet_pyramid_back.py:55-89) — so trunk statistics
don't mix across pyramid scales. The newer revision (our
``resnet_pyramid.py``) dropped that in favor of per-level BN on the stem
only. Kept for inventory parity; the flagship supersedes it in the published
workflow.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import UpsampleBlend, batch_norm, conv_kxk, max_pool_3x3_s2
from .resnet_pyramid import IMAGENET_MEAN, IMAGENET_STD, _StemBN, _StemKernel

Dtype = Any


class BasicBlockPerLevelBN(nn.Module):
    """BasicBlock whose BNs are per-pyramid-level (reference
    ``resnet_pyramid_back.py:55-89``: ``forward(x, level)``)."""

    planes: int
    stride: int = 1
    levels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, level: int) -> jax.Array:
        residual = x
        out = conv_kxk(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(self.dtype, name=f"bn1_{level}")(
            out, use_running_average=not train)
        out = nn.relu(out)
        out = conv_kxk(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(self.dtype, name=f"bn2_{level}")(
            out, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="downsample_conv")(x)
            residual = batch_norm(self.dtype, name=f"downsample_bn_{level}")(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


class PyramidResNetBack(nn.Module):
    """The "back" revision of the pyramid encoder/decoder: same harness as
    ``PyramidResNet`` but all trunk BNs are per-level."""

    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    num_features: int = 128
    pyramid_levels: int = 3
    k_bneck: int = 1
    k_upsample: int = 3
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    dtype: Dtype = jnp.float32

    @property
    def num_skip_levels(self) -> int:
        return self.pyramid_levels + 3

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        from ..ops.input_pipeline import (fused_pyramid_s2d,
                                          s2d_stem_geometry,
                                          stem_kernel_for_level0)

        pyramid = fused_pyramid_s2d(image, self.pyramid_levels,
                                    self.mean, self.std, self.dtype)

        k_s2d, pad_s2d = s2d_stem_geometry(7)
        stem_kernel = _StemKernel((k_s2d, k_s2d, 12, 64), name="conv1")()
        # level 0 is dy-major for NHWC/planar inputs (see fused_pyramid_s2d)
        stem_kernel_l0 = stem_kernel_for_level0(stem_kernel, image)
        stem_bns = [_StemBN(dtype=self.dtype, name=f"bn1_{i}")
                    for i in range(self.pyramid_levels)]

        stage_planes = (64, 128, 256, 512)
        stages = []
        for si, (planes, n_blocks) in enumerate(zip(stage_planes, self.layers)):
            blocks = []
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(BasicBlockPerLevelBN(
                    planes=planes, stride=stride, levels=self.pyramid_levels,
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

        for idx, p in enumerate(pyramid):
            k_lvl = stem_kernel_l0 if idx == 0 else stem_kernel
            x = jax.lax.conv_general_dilated(
                p, k_lvl.astype(p.dtype), (1, 1), [pad_s2d, pad_s2d],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = stem_bns[idx](x, train=train)
            x = nn.relu(x)
            x = max_pool_3x3_s2(x)
            for j, blocks in enumerate(stages):
                for blk in blocks:
                    x = blk(x, train, idx)
                skips[idx + j].append(bnecks[j](x))

        skips_r = [skips[lvl] for lvl in reversed(range(num_skips))]
        x = skips_r[0][0]
        additional["skips_0"] = x
        for i in range(1, num_skips):
            skip_sum = skips_r[i][0]
            for s in skips_r[i][1:]:
                skip_sum = skip_sum + s
            x = UpsampleBlend(self.num_features, k=self.k_upsample,
                              dtype=self.dtype, name=f"upsample_blends{i}")(
                x, skip_sum, train=train)
        return x, additional


def resnet18_pyramid_back(dtype: Dtype = jnp.float32, **kw) -> PyramidResNetBack:
    return PyramidResNetBack(layers=(2, 2, 2, 2), dtype=dtype, **kw)
