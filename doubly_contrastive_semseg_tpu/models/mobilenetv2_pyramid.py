"""Pyramid MobileNetV2 backbone (legacy SwiftNet variant).

TPU-native re-design of reference
``network/backbone/mobilenetv2_pyramid.py:132-364``: the SwiftNet pyramid
harness (3-level bicubic /2 image pyramid → shared trunk with per-level stem
BN → per-stage 1×1 bottlenecks to 128 ch accumulated by resolution → 5
UpsampleBlend decoder steps) wrapped around a MobileNetV2 inverted-residual
trunk instead of ResNet. Skip taps follow the reference's stage split
(``forward_down``, mnv2_pyramid.py:278-297): 16 ch @ 1/4, 24 ch @ 1/8,
32 ch @ 1/16, 320 ch @ 1/32.

Differences from the reference, by design:
- returns the standard ``(features, additional)`` 2-tuple — the reference
  returns a 3-tuple ``(x, x_disp, additional)`` whose extra disparity decoder
  crashes WeatherNet's 2-way unpack (same defect family as the EfficientNet
  pyramid, SURVEY §2.4); the RODSNet-era disparity decoder lives in
  ``models/stereo.py`` instead;
- the dense 7×7/s2 stem conv is an s2d(2) 4×4/s1 conv over the fused
  normalize+pyramid inputs (``ops/input_pipeline.py``), same as the flagship;
- normalization constants are the mnv2-specific ones the reference bakes in
  (mnv2_pyramid.py:154-155).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import UpsampleBlend, batch_norm, conv_kxk, max_pool_3x3_s2
from .backbones.mobilenetv2 import InvertedResidual

Dtype = Any

# reference mobilenetv2_pyramid.py:154-155 (differ from the ResNet pyramid's)
MNV2_MEAN = (73.1584, 82.9090, 72.3924)
MNV2_STD = (44.9149, 46.1529, 45.3192)

# (expand t, channels c, repeats n, stride s, dilation d). With the
# reference's output_stride=16 bookkeeping (mnv2_pyramid.py:172-216) the
# 160-group becomes stride-1/dilation-2; combined with the extra maxpool in
# forward_down (:281) the stage outputs land at 1/4, 1/8, 1/16, 1/32.
_STAGES = (
    # skip stage 0: features[1] → 16 ch @ 1/4
    ((1, 16, 1, 1, 1),),
    # skip stage 1: features[2:4] → 24 ch @ 1/8
    ((6, 24, 2, 2, 1),),
    # skip stage 2: features[4:7] → 32 ch @ 1/16
    ((6, 32, 3, 2, 1),),
    # skip stage 3: features[7:-1] → 64/96/160/320 @ 1/32
    ((6, 64, 4, 2, 1), (6, 96, 3, 1, 1), (6, 160, 3, 1, 2), (6, 320, 1, 1, 2)),
)


class PyramidMobileNetV2(nn.Module):
    """Shared-trunk pyramid MobileNetV2; returns (128-ch features @ 1/4 res,
    additional dict with the coarsest skip)."""

    num_features: int = 128
    pyramid_levels: int = 3
    k_bneck: int = 1
    k_upsample: int = 3
    use_bn: bool = True
    mean: Tuple[float, float, float] = MNV2_MEAN
    std: Tuple[float, float, float] = MNV2_STD
    dtype: Dtype = jnp.float32

    @property
    def num_skip_levels(self) -> int:
        return self.pyramid_levels + 3

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        from ..ops.input_pipeline import (
            fused_pyramid_s2d, s2d_stem_geometry, stem_kernel_for_level0)

        pyramid = fused_pyramid_s2d(image, self.pyramid_levels,
                                    self.mean, self.std, self.dtype)

        # 7×7/s2 32-ch stem (mnv2_pyramid.py:164) in s2d form, shared weights,
        # per-pyramid-level BN (the bn1 ModuleList, mnv2_pyramid.py:229)
        k_s2d, pad_s2d = s2d_stem_geometry(7)
        stem_kernel = self.param(
            "conv1_kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k_s2d, k_s2d, 12, 32), jnp.float32)
        # level 0 is dy-major for NHWC/planar inputs (see fused_pyramid_s2d)
        stem_kernel_l0 = stem_kernel_for_level0(stem_kernel, image)
        stem_bns = [batch_norm(self.dtype, name=f"bn1_{i}")
                    for i in range(self.pyramid_levels)]

        # shared inverted-residual trunk, grouped by skip stage
        stages = []
        for si, group in enumerate(_STAGES):
            blocks = []
            in_ch = 32 if si == 0 else _STAGES[si - 1][-1][1]
            for t, c, n, s, dil in group:
                for bi in range(n):
                    blocks.append(InvertedResidual(
                        features=c, stride=s if bi == 0 else 1,
                        dilation=dil, expand_ratio=t, dtype=self.dtype,
                        name=f"ir{si}_{c}_{bi}"))
                    in_ch = c
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
            x = stem_bns[idx](x, use_running_average=not train)
            x = nn.relu(x)
            x = max_pool_3x3_s2(x)
            for j, blocks in enumerate(stages):
                for blk in blocks:
                    x = blk(x, train)
                skips[idx + j].append(bnecks[j](x))

        skips_r = [skips[lvl] for lvl in reversed(range(num_skips))]
        x = skips_r[0][0]
        additional["skips_0"] = x

        for i in range(1, num_skips):
            skip_sum = skips_r[i][0]
            for s in skips_r[i][1:]:
                skip_sum = skip_sum + s
            x = UpsampleBlend(self.num_features, use_bn=self.use_bn,
                              k=self.k_upsample, dtype=self.dtype,
                              name=f"upsample_blends{i}")(x, skip_sum, train=train)

        return x, additional


def mobilenetv2_pyramid(dtype: Dtype = jnp.float32, **kw) -> PyramidMobileNetV2:
    return PyramidMobileNetV2(dtype=dtype, **kw)
