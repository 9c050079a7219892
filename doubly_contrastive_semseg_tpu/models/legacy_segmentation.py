"""Legacy RODSNet-era segmentation heads (reference
``network/segmentation.py:9-457``).

These predate the SwiftNet/DeepLab heads of the published workflow: ASPP over
a MobileNetV2-style 6-stage feature list with a transpose-conv decoder
(``SegmentationBranches`` / ``SegmentationDeeplabV3``), three "simple" conv
heads (``SimpleSegmentation1/2/3`` — one skeleton with a depth switch), and
``DisparityFeature`` (the ASPP decoder driven all the way to full resolution,
then re-encoded by the GANet two-pass U-net to produce disparity features).
The ASPP/DeepLabHeadV3Plus duplicates in that file are the live versions in
``models/deeplab.py``; the AtrousSeparableConvolution converter is
``--separable_conv`` there.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from .blocks import batch_norm
from .deeplab import ASPP
from .stereo_extras import _BasicConv

Dtype = Any


class DeConv2D(nn.Module):
    """×2 transposed conv + skip concat + 3×3 fuse (reference
    ``segmentation.py:63-80``)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool) -> jax.Array:
        dt = self.dtype
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False, dtype=dt,
                             param_dtype=jnp.float32, name="deconv")(x)
        x = batch_norm(dt, name="bn0")(x, use_running_average=not train)
        x = nn.relu(x)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=dt,
                    param_dtype=jnp.float32, name="fuse")(x)
        x = batch_norm(dt, name="bn1")(x, use_running_average=not train)
        return nn.relu(x)


class SegmentationBranches(nn.Module):
    """ASPP on the deepest stage + 3 DeConv2D skip steps + 1×1 classifier
    (reference ``segmentation.py:119-151``); expects the 6-stage MobileNetV2
    feature list (``stereo_features.MobileNetV2Feature``). Out: classes @ 1/2."""

    num_classes: int = 19
    aspp_dilate: Sequence[int] = (12, 24, 36)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], *,
                 train: bool = False) -> jax.Array:
        x4 = ASPP(tuple(self.aspp_dilate), dtype=self.dtype, name="aspp")(
            features[5], train=train)
        x = DeConv2D(32, dtype=self.dtype, name="deconv3")(x4, features[3], train)
        x = DeConv2D(24, dtype=self.dtype, name="deconv2")(x, features[2], train)
        x = DeConv2D(16, dtype=self.dtype, name="deconv1")(x, features[1], train)
        return nn.Conv(self.num_classes, (1, 1), use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="classifier")(x).astype(jnp.float32)


class SegmentationDeeplabV3(nn.Module):
    """ASPP + single 1×1 classifier upsampled to a target size (reference
    ``segmentation.py:82-117``)."""

    num_classes: int = 19
    aspp_dilate: Sequence[int] = (12, 24, 36)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, out_hw, *, train: bool = False) -> jax.Array:
        x = ASPP(tuple(self.aspp_dilate), dtype=self.dtype, name="aspp")(
            feat, train=train)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="classifier")(x)
        return resize_bilinear(x.astype(jnp.float32), out_hw)


class SimpleSegmentation(nn.Module):
    """The SimpleSegmentation1/2/3 family (reference
    ``segmentation.py:153-268``): a small conv stack straight over 32-ch
    stereo features. ``depth`` selects the variant: 1 = conv3×3→BN→ReLU→1×1;
    2/3 add one/two extra 3×3 stages (the reference's copies differ only in
    that and in channel width)."""

    num_classes: int = 19
    depth: int = 1
    width: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, *, train: bool = False) -> jax.Array:
        x = feat.astype(self.dtype)
        for i in range(self.depth - 1):
            x = _BasicConv(self.width, dtype=self.dtype, name=f"conv{i}")(x, train)
        x = nn.Conv(self.num_classes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="pre")(x)
        x = batch_norm(self.dtype, name="pre_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="classifier")(x).astype(jnp.float32)


class DisparityFeature(nn.Module):
    """ASPP decoder to full resolution, re-encoded by the GANet two-pass
    U-net (reference ``segmentation.py:304-392``); returns the 32-ch
    disparity feature map at the U-net's base (1/3) resolution."""

    aspp_dilate: Sequence[int] = (12, 24, 36)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], *,
                 train: bool = False) -> jax.Array:
        dt = self.dtype
        x = ASPP(tuple(self.aspp_dilate), dtype=dt, name="aspp")(
            features[5], train=train)
        x = DeConv2D(32, dtype=dt, name="deconv3")(x, features[3], train)
        x = DeConv2D(24, dtype=dt, name="deconv2")(x, features[2], train)
        x = DeConv2D(16, dtype=dt, name="deconv1")(x, features[1], train)
        x = DeConv2D(3, dtype=dt, name="deconv0")(x, features[0], train)

        from .stereo_features import GANetFeature

        return GANetFeature(feature_mdconv=True, dtype=dt, name="unet")(
            x, train=train)[-1]
