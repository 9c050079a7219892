"""Single-scale SwiftNet variants (reference ``network/backbone/resnet_18.py``,
809 LoC): ``ResNet_swift`` — one ResNet-18 pass + SwiftNet SPP at 1/32 + a
skip-bottleneck upsample ladder; ``ResNet`` — the RGB-D two-branch variant
with per-stage channel-attention fusion; and ``ResNet_hourglass`` — the same
trunk plus a GANet-style two-pass disparity hourglass. These are the
RODSNet-era single-scale backbones kept reachable by flags in the reference.

Layer-matched to the reference so trained torch weights import exactly
(``tests/test_backbone_oracles.py``). Skip semantics: the reference block
returns ``(relu, out)`` where ``relu = nn.ReLU(inplace=True)(out)`` — the
in-place relu makes the two returns ALIAS the same storage
(``resnet_18.py:100-103``), so the "pre-relu" skips ``forward_resblock``
collects (:332-338) are in fact the post-relu stage outputs. The decoders
here therefore skip from the post-relu stream.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import SpatialPyramidPooling, Upsample, batch_norm, max_pool_3x3_s2
from .resnet_pyramid import BasicBlock
from .stereo_extras import _BasicConv, _Conv2x

Dtype = Any

# ResNet_swift's own normalization constants (resnet_18.py:659-660) — NOT the
# WeatherNet pyramid's (73.15, 82.90, 72.3)/(47.67, 48.49, 47.73)
SWIFT_MEAN = (73.1584, 82.9090, 72.3924)
SWIFT_STD = (44.9149, 46.1529, 45.3192)


class _Stem(nn.Module):
    """conv7×7/2 → BN → ReLU → maxpool3×3/2 (``resnet_18.py:672-676``)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = batch_norm(self.dtype, name="bn1")(x, use_running_average=not train)
        return max_pool_3x3_s2(nn.relu(x))


class _TrunkLayers(nn.Module):
    """The four ResNet-18 stages; ``run_stage`` is callable stage-by-stage
    (the RGB-D variant interleaves fusion between stages). The per-stage skip
    IS the post-relu stage output (see module docstring: the reference's
    in-place relu aliases its "pre-relu" skip to the relu'd stream)."""

    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32

    def setup(self):
        for si in range(4):
            planes = (64, 128, 256, 512)[si]
            for bi in range(self.layers[si]):
                stride = 2 if (si > 0 and bi == 0) else 1
                setattr(self, f"layer{si + 1}_{bi}",
                        BasicBlock(planes=planes, stride=stride,
                                   dtype=self.dtype))

    def run_stage(self, x: jax.Array, si: int, train: bool) -> jax.Array:
        for bi in range(self.layers[si]):
            x = getattr(self, f"layer{si + 1}_{bi}")(x, train)
        return x

    def __call__(self, x: jax.Array, train: bool):
        skips = []
        for si in range(4):
            x = self.run_stage(x, si, train)
            skips.append(x)
        return x, skips


def _swift_spp(num_features: int, dtype, name: str = "spp") -> SpatialPyramidPooling:
    """The trio's shared SPP config (``resnet_18.py:706-715``): 3 levels of
    the (8, 4, 2, 1) grid list, bt_size = out = num_features,
    level_size = num_features // 3, bn momentum 0.01/2."""
    return SpatialPyramidPooling(
        num_levels=3, bt_size=num_features, level_size=num_features // 3,
        out_size=num_features, grids=(8, 4, 2, 1), bn_momentum=0.005,
        dtype=dtype, name=name)


class SingleScaleSwiftNet(nn.Module):
    """ResNet-18 → SPP(1/32) → 3 skip-bottleneck Upsample steps → 128 ch @ 1/4
    (reference ``ResNet_swift``, ``resnet_18.py:653-795``). Skips and the SPP
    input are the post-relu stage outputs (in-place-relu aliasing, see module
    docstring); normalization uses the class's own mean/std buffers
    (``:659-660``)."""

    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        mean = jnp.asarray(SWIFT_MEAN, jnp.float32)
        std = jnp.asarray(SWIFT_STD, jnp.float32)
        x = ((image - mean) / std).astype(self.dtype)
        x = _Stem(dtype=self.dtype, name="stem")(x, train)
        x, skips = _TrunkLayers(dtype=self.dtype, name="trunk")(x, train)
        spp = _swift_spp(self.num_features, self.dtype)(skips[-1], train=train)
        y = spp
        for i, skip in enumerate(reversed(skips[:-1])):  # 256, 128, 64 ch
            y = Upsample(self.num_features, self.num_features, dtype=self.dtype,
                         name=f"upsample{i}")(y, skip, train=train)
        return y, {"skips_0": spp}


class HourglassSwiftNet(nn.Module):
    """SwiftNet trunk + SPP/upsample semantic path + the GANet-style two-pass
    disparity hourglass (reference ``ResNet_hourglass``,
    ``resnet_18.py:449-651``): conv4a takes the (post-relu) layer4 output
    down to 1/64, a deconv chain climbs back to 1/4, a conv chain descends again and
    a final deconv chain emits 64-ch disparity features @ 1/4
    (``forward_up_for_disp`` :600-646). The reference's ``conv_final`` is
    constructed but never called — omitted here. No input normalization
    (``forward_down`` :569 operates on the raw RGB)."""

    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        dt = self.dtype
        x = _Stem(dtype=dt, name="stem")(image.astype(dt), train)
        x, skips = _TrunkLayers(dtype=dt, name="trunk")(x, train)
        l1, l2, l3, l4 = skips  # post-relu stage outputs
        spp = _swift_spp(self.num_features, dt)(l4, train=train)

        x_sem = spp
        for i, skip in enumerate((l3, l2, l1)):
            x_sem = Upsample(self.num_features, self.num_features, dtype=dt,
                             name=f"upsample{i}")(x_sem, skip, train=train)

        # disparity feature extractor (rem indices per :600-646)
        x = _BasicConv(1024, stride=2, dtype=dt, name="conv4a")(l4, train)
        rem4 = x
        rems_a: List[jax.Array] = []
        for feats, rem, nm in ((512, l4, "deconv4a"), (256, l3, "deconv3a"),
                               (128, l2, "deconv2a"), (64, l1, "deconv1a")):
            x = _Conv2x(feats, deconv=True, dtype=dt, name=nm)(x, rem, train)
            rems_a.append(x)
        rems_b: List[jax.Array] = []
        for feats, rem, nm in ((128, rems_a[2], "conv1b"),
                               (256, rems_a[1], "conv2b"),
                               (512, rems_a[0], "conv3b"),
                               (1024, rem4, "conv4b")):
            x = _Conv2x(feats, dtype=dt, name=nm)(x, rem, train)
            rems_b.append(x)
        for feats, rem, nm in ((512, rems_b[2], "deconv4b"),
                               (256, rems_b[1], "deconv3b"),
                               (128, rems_b[0], "deconv2b"),
                               (64, rems_a[3], "deconv1b")):
            x = _Conv2x(feats, deconv=True, dtype=dt, name=nm)(x, rem, train)

        return x_sem, {"skips_0": spp, "disp_feat": x}


class RGBDSwiftNet(nn.Module):
    """Two-branch RGB + depth SwiftNet (reference ``ResNet``,
    ``resnet_18.py:206-447``, ``forward_down_fusion``): after every stage each
    branch is scaled by its own channel attention (GAP → 1×1 conv with bias →
    sigmoid) and summed into the RGB stream, which feeds the next RGB stage;
    the depth stream continues from its attenuated features. Decoder skips
    are the RGB stage outputs BEFORE attention/fusion; the SPP input is the
    FUSED post-attention layer-4 sum. Depth enters as a single channel
    (``:363 depth.unsqueeze(1)``); no input normalization."""

    num_features: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, depth: jax.Array, *,
                 train: bool = False):
        dt = self.dtype
        d = depth.astype(dt)
        if d.ndim == 3:
            d = d[..., None]  # (B, H, W) → 1-channel NHWC

        x = _Stem(dtype=dt, name="stem")(image.astype(dt), train)
        y = _Stem(dtype=dt, name="stem_d")(d, train)
        rgb = _TrunkLayers(dtype=dt, name="trunk")
        dep = _TrunkLayers(dtype=dt, name="trunk_d")

        def attend(v: jax.Array, name: str) -> jax.Array:
            g = jnp.mean(v, axis=(-3, -2), keepdims=True)
            g = nn.Conv(v.shape[-1], (1, 1), use_bias=True, dtype=dt,
                        param_dtype=jnp.float32, name=name)(g)
            return v * jax.nn.sigmoid(g)

        skips = []
        for si in range(4):
            x = rgb.run_stage(x, si, train)
            y = dep.run_stage(y, si, train)
            skips.append(x)  # pre-attention RGB stage output
            # both streams are attenuated (forward_down_fusion :370-379):
            # the NEXT depth stage consumes the attenuated y
            x = attend(x, f"attention_{si + 1}")
            y = attend(y, f"attention_{si + 1}_d")
            x = x + y

        spp = _swift_spp(self.num_features, dt)(x, train=train)
        out = spp
        for i, skip in enumerate(reversed(skips[:-1])):
            out = Upsample(self.num_features, self.num_features, dtype=dt,
                           name=f"upsample{i}")(out, skip, train=train)
        return out, {"skips_0": spp}
