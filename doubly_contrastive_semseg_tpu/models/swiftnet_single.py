"""Single-scale SwiftNet variants (reference ``network/backbone/resnet_18.py``,
809 LoC): ``ResNet_swift`` — one ResNet-18 pass + SwiftNet SPP at 1/32 + a
skip-bottleneck upsample ladder; and the RGB-D two-branch variant with
attention-gated depth fusion. These are the RODSNet-era single-scale
backbones kept reachable by flags in the reference."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import SpatialPyramidPooling, Upsample, batch_norm, conv_kxk, max_pool_3x3_s2
from .resnet_pyramid import IMAGENET_MEAN, IMAGENET_STD, BasicBlock

Dtype = Any


class _Trunk(nn.Module):
    """Plain ResNet-18 trunk emitting per-stage skips."""

    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> List[jax.Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = batch_norm(self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        skips = []
        for si, (planes, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(planes=planes, stride=stride, dtype=self.dtype,
                               name=f"layer{si + 1}_{bi}")(x, train)
            skips.append(x)
        return skips


class SingleScaleSwiftNet(nn.Module):
    """ResNet-18 → SPP(1/32) → 3 skip-bottleneck Upsample steps → 128 ch @ 1/4
    (reference ``ResNet_swift``, ``resnet_18.py:600-809``)."""

    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = ((image - mean) / std).astype(self.dtype)
        skips = _Trunk(dtype=self.dtype, name="trunk")(x, train)
        spp = SpatialPyramidPooling(out_size=self.num_features, dtype=self.dtype,
                                    name="spp")(skips[-1], train=train)
        y = spp
        for i, skip in enumerate(reversed(skips[:-1])):  # 256, 128, 64 ch
            y = Upsample(self.num_features, self.num_features, dtype=self.dtype,
                         name=f"upsample{i}")(y, skip, train=train)
        additional = {"skips_0": spp}
        return y, additional


class HourglassSwiftNet(nn.Module):
    """Stacked-hourglass SwiftNet (reference ``ResNet_hourglass``,
    ``resnet_18.py``): the single-scale decoder output feeds a second
    down-up hourglass whose output refines the first additively."""

    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        base, additional = SingleScaleSwiftNet(
            self.num_features, dtype=self.dtype, name="stage1")(image, train=train)
        # second hourglass over the 128-ch features: 2 stride-2 blocks down,
        # SPP bottleneck, 2 skip-upsamples back
        x = base
        skips = []
        for i in range(2):
            skips.append(x)
            x = BasicBlock(planes=self.num_features, stride=2, dtype=self.dtype,
                           name=f"hg_down{i}")(x, train)
        x = SpatialPyramidPooling(out_size=self.num_features, dtype=self.dtype,
                                  name="hg_spp")(x, train=train)
        for i, skip in enumerate(reversed(skips)):
            x = Upsample(self.num_features, self.num_features, dtype=self.dtype,
                         name=f"hg_up{i}")(x, skip, train=train)
        return base + x, additional


class RGBDSwiftNet(nn.Module):
    """Two-branch RGB + depth SwiftNet with attention-gated fusion per stage
    (reference ``ResNet`` in ``resnet_18.py:206-500``): the depth branch's
    stage features gate the RGB features through a squeeze-excite attention
    before being summed in."""

    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, depth: jax.Array, *,
                 train: bool = False):
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = ((image - mean) / std).astype(self.dtype)
        d = depth.astype(self.dtype)
        if d.ndim == 3:
            d = d[..., None]
        d = jnp.broadcast_to(d, d.shape[:-1] + (3,))  # depth as 3-ch input

        rgb_skips = _Trunk(dtype=self.dtype, name="rgb_trunk")(x, train)
        dep_skips = _Trunk(dtype=self.dtype, name="depth_trunk")(d, train)

        fused = []
        for i, (r, dd) in enumerate(zip(rgb_skips, dep_skips)):
            gate = jnp.mean(dd, axis=(-3, -2))
            gate = nn.Dense(r.shape[-1] // 4, dtype=self.dtype,
                            name=f"att{i}_fc1")(gate)
            gate = nn.relu(gate)
            gate = nn.Dense(r.shape[-1], dtype=self.dtype, name=f"att{i}_fc2")(gate)
            gate = jax.nn.sigmoid(gate)[:, None, None, :]
            fused.append(r + dd * gate)

        spp = SpatialPyramidPooling(out_size=self.num_features, dtype=self.dtype,
                                    name="spp")(fused[-1], train=train)
        y = spp
        for i, skip in enumerate(reversed(fused[:-1])):
            y = Upsample(self.num_features, self.num_features, dtype=self.dtype,
                         name=f"upsample{i}")(y, skip, train=train)
        return y, {"skips_0": spp}
