"""Legacy stereo feature extractors (reference ``network/feature.py:36-1163``).

The RODSNet-era model zoo shipped one feature net per stereo method —
StereoNet, PSMNet, GANet, GCNet — plus an AANet feature pyramid, a standard
FPN, and MobileNetV2 trunk variants. All are L-status (not in the published
doubly-contrastive workflow) but remain part of the capability surface.
TPU-native notes: NHWC layouts, ``_BasicConv``/``_Conv2x`` shared with the
refinement heads (``stereo_extras.py``), deformable convs from
``ops/deform_conv.py`` instead of the CUDA extension, and the three
MobileNetV2 copies (``MobileNetV2``/``MobileNetV2_New``/``MobileHourglass``,
feature.py:217-497) expressed as ONE module with a ``decoder`` switch.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import DeformConv2d
from ..ops.interpolate import resize_bilinear
from .backbones.mobilenetv2 import ConvBNReLU6, InvertedResidual
from .blocks import batch_norm
from .stereo_extras import _BasicConv, _Conv2x

Dtype = Any


class _ConvBNReLU(nn.Module):
    """k×k conv → BN → ReLU (reference ``conv5x5``/``convbn`` helpers)."""

    features: int
    k: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        p = self.dilation * (self.k // 2)
        x = nn.Conv(self.features, (self.k, self.k),
                    strides=(self.stride,) * 2, padding=[(p, p), (p, p)],
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = batch_norm(self.dtype, name="bn")(x, use_running_average=not train)
        return nn.relu(x) if self.relu else x


class _ResBlock(nn.Module):
    """Plain 2-conv residual block with optional dilation and projection
    shortcut (reference ``BasicBlock``/``PSMNetBasicBlock``,
    feature.py:709-744, 790-814)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        r = x
        out = _ConvBNReLU(self.planes, 3, self.stride, self.dilation,
                          dtype=self.dtype, name="conv1")(x, train)
        out = _ConvBNReLU(self.planes, 3, 1, self.dilation, relu=False,
                          dtype=self.dtype, name="conv2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            r = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="downsample")(x)
            r = batch_norm(self.dtype, name="downsample_bn")(
                r, use_running_average=not train)
        return nn.relu(out + r)


class StereoNetFeature(nn.Module):
    """N stride-2 5×5 convs → 6 residual blocks → bare 3×3
    (reference feature.py:746-781). Out: 32 ch @ 1/2^N."""

    num_downsample: int = 3
    channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, *, train: bool = False) -> jax.Array:
        x = img.astype(self.dtype)
        for i in range(self.num_downsample):
            x = _ConvBNReLU(self.channels, 5, 2, dtype=self.dtype,
                            name=f"down{i}")(x, train)
        for i in range(6):
            x = _ResBlock(self.channels, dtype=self.dtype, name=f"res{i}")(x, train)
        return nn.Conv(self.channels, (3, 3), padding=1, use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="final")(x)


class PSMNetFeature(nn.Module):
    """PSMNet feature net: 3-conv /2 stem, res layers (16-deep layer2 at /4,
    dilated layer4), 4-scale SPP branches, 320→128→32 fuse
    (reference feature.py:908-986). Out: 32 ch @ 1/4."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, *, train: bool = False) -> jax.Array:
        dt = self.dtype
        x = img.astype(dt)
        x = _ConvBNReLU(32, 3, 2, dtype=dt, name="firstconv0")(x, train)
        x = _ConvBNReLU(32, 3, 1, dtype=dt, name="firstconv1")(x, train)
        x = _ConvBNReLU(32, 3, 1, dtype=dt, name="firstconv2")(x, train)
        for i in range(3):
            x = _ResBlock(32, dtype=dt, name=f"layer1_{i}")(x, train)
        for i in range(16):
            x = _ResBlock(64, stride=2 if i == 0 else 1, dtype=dt,
                          name=f"layer2_{i}")(x, train)
        out_raw = x
        for i in range(3):
            x = _ResBlock(128, dtype=dt, name=f"layer3_{i}")(x, train)
        for i in range(3):
            x = _ResBlock(128, dilation=2, dtype=dt, name=f"layer4_{i}")(x, train)
        out_skip = x

        h, w = x.shape[-3], x.shape[-2]
        branches = []
        for j, pool in enumerate((64, 32, 16, 8)):
            # fixed-window average pools (PSMNet SPP); window capped at the
            # feature size so small eval shapes stay valid
            ph, pw = min(pool, h), min(pool, w)
            b = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            b = _ConvBNReLU(32, 1, dtype=dt, name=f"branch{j}")(b, train)
            branches.append(resize_bilinear(b, (h, w)).astype(dt))
        cat = jnp.concatenate([out_raw, out_skip, *branches[::-1]], axis=-1)
        cat = _ConvBNReLU(128, 3, dtype=dt, name="lastconv0")(cat, train)
        return nn.Conv(32, (1, 1), use_bias=False, dtype=dt,
                       param_dtype=jnp.float32, name="lastconv1")(cat)


class GCNetFeature(nn.Module):
    """5×5/s2 → 8 residual blocks → 3×3 (reference feature.py:1132-1162).
    Out: 32 ch @ 1/2."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, *, train: bool = False) -> jax.Array:
        x = _ConvBNReLU(32, 5, 2, dtype=self.dtype, name="conv1")(
            img.astype(self.dtype), train)
        for i in range(8):
            x = _ResBlock(32, dtype=self.dtype, name=f"res{i}")(x, train)
        return nn.Conv(32, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv3")(x)


class GANetFeature(nn.Module):
    """GANet two-pass U-net feature extractor (reference
    feature.py:1044-1130): 3×3 + 5×5/s3 stem (input /3), 4 stride-2 encoders
    (top two optionally deformable), twin decoder/encoder passes with
    ``_Conv2x`` skip fusion. Returns the reference's 6-element feature list."""

    feature_mdconv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, *, train: bool = False) -> List[jax.Array]:
        dt = self.dtype
        x = _BasicConv(32, dtype=dt, name="conv_start0")(img.astype(dt), train)
        # 5×5/s3 (GANet's /3 trunk); flax pad 2 each side
        x = nn.Conv(32, (5, 5), strides=(3, 3), padding=[(2, 2), (2, 2)],
                    use_bias=False, dtype=dt, param_dtype=jnp.float32,
                    name="conv_start1")(x)
        x = batch_norm(dt, name="conv_start1_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        if self.feature_mdconv:
            x = DeformConv2d(32, dtype=dt, name="conv_start2")(x)
        else:
            x = _BasicConv(32, dtype=dt, name="conv_start2")(x, train)

        rem0a = x
        x = _BasicConv(48, stride=2, dtype=dt, name="conv1a")(x, train); rem1a = x
        x = _BasicConv(64, stride=2, dtype=dt, name="conv2a")(x, train); rem2a = x
        if self.feature_mdconv:
            x = DeformConv2d(96, stride=2, dtype=dt, name="conv3a")(x); rem3a = x
            x = DeformConv2d(128, stride=2, dtype=dt, name="conv4a")(x); rem4a = x
        else:
            x = _BasicConv(96, stride=2, dtype=dt, name="conv3a")(x, train); rem3a = x
            x = _BasicConv(128, stride=2, dtype=dt, name="conv4a")(x, train); rem4a = x

        x = _Conv2x(96, deconv=True, dtype=dt, name="deconv4a")(x, rem3a, train); rem3da = x
        x = _Conv2x(64, deconv=True, dtype=dt, name="deconv3a")(x, rem2a, train); rem2da = x
        x = _Conv2x(48, deconv=True, dtype=dt, name="deconv2a")(x, rem1a, train); rem1da = x
        x = _Conv2x(32, deconv=True, dtype=dt, name="deconv1a")(x, rem0a, train); rem0da = x

        x = _Conv2x(48, dtype=dt, name="conv1b")(x, rem1da, train); rem1b = x
        x = _Conv2x(64, dtype=dt, name="conv2b")(x, rem2da, train); rem2b = x
        x = _Conv2x(96, mdconv=self.feature_mdconv, dtype=dt,
                    name="conv3b")(x, rem3da, train); rem3b = x
        x = _Conv2x(128, mdconv=self.feature_mdconv, dtype=dt,
                    name="conv4b")(x, rem4a, train); rem4b = x

        x = _Conv2x(96, deconv=True, dtype=dt, name="deconv4b")(x, rem3b, train)
        x = _Conv2x(64, deconv=True, dtype=dt, name="deconv3b")(x, rem2b, train)
        x = _Conv2x(48, deconv=True, dtype=dt, name="deconv2b")(x, rem1b, train)
        out = _Conv2x(32, deconv=True, dtype=dt, name="deconv1b")(x, rem0da, train)
        return [rem2a, rem4a, rem0da, rem2b, rem4b, out]


class FeaturePyramid(nn.Module):
    """AANet feature pyramid: ×2-channel stride-2 conv pairs
    (reference ``FeaturePyrmaid`` [sic], feature.py:816-853).
    In: (B, H, W, C) → [x, 2C @ /2, 4C @ /4]."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> List[jax.Array]:
        dt = self.dtype
        c = x.shape[-1]
        outs = [x]
        for i, mult in enumerate((2, 4)):
            y = nn.Conv(c * mult, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, dtype=dt, param_dtype=jnp.float32,
                        name=f"out{i}_conv0")(outs[-1].astype(dt))
            y = batch_norm(dt, name=f"out{i}_bn0")(y, use_running_average=not train)
            y = nn.leaky_relu(y, 0.2)
            y = nn.Conv(c * mult, (1, 1), use_bias=False, dtype=dt,
                        param_dtype=jnp.float32, name=f"out{i}_conv1")(y)
            y = batch_norm(dt, name=f"out{i}_bn1")(y, use_running_average=not train)
            outs.append(nn.leaky_relu(y, 0.2))
        return outs


class FeaturePyramidNetwork(nn.Module):
    """Standard FPN: 1×1 laterals + top-down ×2 upsample adds + 3×3 fpn
    convs (reference feature.py:855-906)."""

    out_channels: int = 128
    num_levels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], *,
                 train: bool = False) -> List[jax.Array]:
        dt = self.dtype
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                    param_dtype=jnp.float32, name=f"lateral{i}")(f.astype(dt))
            for i, f in enumerate(feats[:self.num_levels])
        ]
        for i in range(self.num_levels - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], laterals[i - 1].shape[-3:-1]).astype(dt)
        outs = []
        for i, lat in enumerate(laterals):
            y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        dtype=dt, param_dtype=jnp.float32, name=f"fpn{i}")(lat)
            y = batch_norm(dt, name=f"fpn{i}_bn")(y, use_running_average=not train)
            outs.append(nn.relu(y))
        return outs


class MobileNetV2Feature(nn.Module):
    """MobileNetV2 stereo trunk (reference feature.py:217-497 — the
    ``MobileNetV2``/``MobileNetV2_New``/``MobileHourglass`` trio, which are
    one architecture with different decoder tails). Emits the 6-stage
    feature list [input-res conv, 16 @ /2, 24 @ /4, 32 @ /8, 96 @ /16,
    320 @ /16-dilated]; ``decoder='hourglass'`` appends the inverted-residual
    deconv tail back to /4."""

    decoder: str = "none"  # none | hourglass
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, *, train: bool = False) -> List[jax.Array]:
        dt = self.dtype
        x0 = ConvBNReLU6(16, k=3, stride=1, pad=1, dtype=dt, name="conv_in")(
            img.astype(dt), train)  # input-res skip (deconv0's partner)
        x = ConvBNReLU6(32, k=3, stride=2, pad=1, dtype=dt, name="stem")(x0, train)
        feats = [x0]
        schedule = [  # (t, c, n, s); dilate past /16 like the deeplab trunk
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
            (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 1), (6, 320, 1, 1),
        ]
        taps = {0: None, 1: 1, 3: 2, 4: 3, 6: 4}
        for gi, (t, c, n, s) in enumerate(schedule):
            for bi in range(n):
                x = InvertedResidual(
                    features=c, stride=s if bi == 0 else 1,
                    dilation=2 if gi >= 5 else 1, expand_ratio=t, dtype=dt,
                    name=f"ir{gi}_{bi}")(x, train)
            if gi in (0, 1, 2, 4, 6):
                feats.append(x)
        if self.decoder == "hourglass":
            # MobileHourglass tail (feature.py:410-497): deconv back through
            # the /8 and /4 skips
            y = _Conv2x(32, deconv=True, dtype=dt, name="up1")(
                feats[-1], feats[3], train)
            y = _Conv2x(24, deconv=True, dtype=dt, name="up2")(y, feats[2], train)
            feats.append(y)
        return feats


def make_stereo_feature(kind: str, dtype: Dtype = jnp.float32, **kw) -> nn.Module:
    """Factory over the legacy stereo feature extractors."""
    table = {
        "stereonet": StereoNetFeature,
        "psmnet": PSMNetFeature,
        "gcnet": GCNetFeature,
        "ganet": GANetFeature,
        "mobilenetv2": MobileNetV2Feature,
    }
    if kind not in table:
        raise NotImplementedError(f"stereo feature {kind}")
    return table[kind](dtype=dtype, **kw)
