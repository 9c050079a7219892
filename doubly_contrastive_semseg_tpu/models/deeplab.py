"""DeepLabV3 / V3+ family (reference ``network/_deeplab.py:28-185`` +
``network/modeling.py:44-231`` + ``network/utils.py:159-194``).

Model contract matches ``_SimpleSegmentationModel.forward``:
  seg          — logits at input resolution
  seg_beforeup — head output (1/4 res for V3+, 1/output_stride for V3)
  fine_feat    — backbone 'out' features, both views (2048/320 ch)
  fine_feat0   — first view, bilinearly resized to seg_beforeup's resolution
ASPP rates: [6,12,18] @ os16, [12,24,36] @ os8 (``modeling.py:46-52``).
``separable_conv`` converts head 3×3 convs to atrous-separable
(``_deeplab.py:92-116`` / ``convert_to_separable_conv``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from .backbones.mobilenetv2 import MobileNetV2
from .backbones.resnet import resnet50, resnet101
from .blocks import SeparableConv, batch_norm
from .weathernet import ProjectionHead, WeatherClassifier

Dtype = Any


class ConvBNReLU(nn.Module):
    features: int
    k: int = 3
    dilation: int = 1
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        p = self.dilation * (self.k // 2)
        if self.separable and self.k > 1:
            x = SeparableConv(self.features, k=self.k, dilation=self.dilation,
                              dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.k, self.k), padding=[(p, p), (p, p)],
                        kernel_dilation=(self.dilation,) * 2, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = batch_norm(self.dtype, name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class ASPP(nn.Module):
    """1×1 + three dilated 3×3 + image pooling → concat → 1×1 project +
    dropout 0.1 (reference ``_deeplab.py:140-168``)."""

    atrous_rates: Tuple[int, int, int]
    out_channels: int = 256
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        hw = (x.shape[-3], x.shape[-2])
        branches = [ConvBNReLU(self.out_channels, k=1, dtype=self.dtype,
                               name="conv1x1")(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(ConvBNReLU(self.out_channels, k=3, dilation=rate,
                                       separable=self.separable, dtype=self.dtype,
                                       name=f"aspp_conv{i}")(x, train))
        pooled = jnp.mean(x, axis=(-3, -2), keepdims=True)
        pooled = ConvBNReLU(self.out_channels, k=1, dtype=self.dtype,
                            name="image_pool")(pooled, train)
        branches.append(jnp.broadcast_to(
            pooled, x.shape[:-1] + (self.out_channels,)))
        out = jnp.concatenate(branches, axis=-1)
        out = ConvBNReLU(self.out_channels, k=1, dtype=self.dtype,
                         name="project")(out, train)
        out = nn.Dropout(0.1, deterministic=not train, name="drop")(out)
        return out


class DeepLabHeadV3Plus(nn.Module):
    """low-level 1×1→48 projection ‖ upsampled ASPP → 3×3 256 → 1×1 classes
    (reference ``_deeplab.py:28-66``)."""

    num_classes: int
    atrous_rates: Tuple[int, int, int]
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], train: bool) -> jax.Array:
        low = ConvBNReLU(48, k=1, dtype=self.dtype, name="project")(
            features["low_level"], train)
        aspp = ASPP(self.atrous_rates, separable=self.separable,
                    dtype=self.dtype, name="aspp")(features["out"], train)
        aspp = resize_bilinear(aspp, (low.shape[-3], low.shape[-2]))
        x = jnp.concatenate([low, aspp], axis=-1)
        x = ConvBNReLU(256, k=3, separable=self.separable, dtype=self.dtype,
                       name="fuse")(x, train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="classifier")(x)
        return x.astype(jnp.float32)


class DeepLabHead(nn.Module):
    """ASPP → 3×3 256 → 1×1 classes (reference ``_deeplab.py:68-90``)."""

    num_classes: int
    atrous_rates: Tuple[int, int, int]
    separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], train: bool) -> jax.Array:
        x = ASPP(self.atrous_rates, separable=self.separable, dtype=self.dtype,
                 name="aspp")(features["out"], train)
        x = ConvBNReLU(256, k=3, separable=self.separable, dtype=self.dtype,
                       name="fuse")(x, train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="classifier")(x)
        return x.astype(jnp.float32)


BACKBONES = {
    "resnet50": resnet50,
    "resnet101": resnet101,
}


class DeepLabDCSS(nn.Module):
    """DeepLabV3/V3+ + weather classifier + projection head with the
    doubly-contrastive output contract (``network/utils.py:166-194``)."""

    arch: str = "deeplabv3plus"  # or deeplabv3
    backbone: str = "resnet50"   # resnet50 | resnet101 | mobilenetv2
    num_classes: int = 19
    weather_num: int = 4
    output_stride: int = 16
    separable: bool = False
    # the reference's deeplab path feeds RAW 0-255 pixels into the trunk
    # (no in-model normalization, network/utils.py:166-194 — unlike
    # WeatherNet). We normalize by default (the sane fix) but imported
    # reference-trained deeplab checkpoints need normalize_input=False to
    # reproduce their training-time input statistics.
    normalize_input: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False,
                 return_supcon_feature: bool = False) -> Dict[str, jax.Array]:
        if self.output_stride == 8:
            rsd, rates = (False, True, True), (12, 24, 36)
        else:
            rsd, rates = (False, False, True), (6, 12, 18)
        if self.backbone.startswith("hrnetv2"):
            # reference _segm_hrnet pins [12, 24, 36] independent of
            # output_stride (modeling.py:20)
            rates = (12, 24, 36)

        if self.normalize_input:
            # same constants the SwiftNet path bakes in
            mean = jnp.asarray([73.15, 82.90, 72.3], jnp.float32)
            std = jnp.asarray([47.67, 48.49, 47.73], jnp.float32)
            x = ((image - mean) / std).astype(self.dtype)
        else:
            x = image.astype(self.dtype)

        from .backbones.resnet import DilatedResNet

        if self.backbone == "mobilenetv2":
            bb = MobileNetV2(output_stride=self.output_stride, dtype=self.dtype,
                             name="backbone")
        elif self.backbone == "resnet50":
            bb = DilatedResNet((3, 4, 6, 3), rsd, self.dtype, name="backbone")
        elif self.backbone == "resnet101":
            bb = DilatedResNet((3, 4, 23, 3), rsd, self.dtype, name="backbone")
        elif self.backbone.startswith("hrnetv2"):
            from .backbones.hrnetv2 import HRNetV2

            width = int(self.backbone.rsplit("_", 1)[-1])
            bb = HRNetV2(width=width, dtype=self.dtype, name="backbone")
        elif self.backbone == "xception":
            from .backbones.xception import AlignedXception

            bb = AlignedXception(output_stride=self.output_stride,
                                 dtype=self.dtype, name="backbone")
        else:
            raise NotImplementedError(f"backbone {self.backbone}")
        features = bb(x, train=train)

        fine_feat = features["out"]
        if return_supcon_feature:
            bsz = fine_feat.shape[0] // 2
            features = {k: v[:bsz] for k, v in features.items()}
            fine_feat0 = features["out"]
        else:
            fine_feat0 = fine_feat

        if self.arch == "deeplabv3plus":
            head = DeepLabHeadV3Plus(self.num_classes, rates, self.separable,
                                     self.dtype, name="classifier")
        else:
            head = DeepLabHead(self.num_classes, rates, self.separable,
                               self.dtype, name="classifier")
        seg_beforeup = head(features, train)

        # fine_feat0 resized to the head output resolution (utils.py:190)
        fine_feat0 = resize_bilinear(
            fine_feat0, (seg_beforeup.shape[-3], seg_beforeup.shape[-2]))
        seg = resize_bilinear(seg_beforeup, (image.shape[-3], image.shape[-2]))

        out = {
            "seg": seg,
            "seg_beforeup": seg_beforeup,
            "fine_feat": fine_feat,
            "fine_feat0": fine_feat0,
        }
        clf = WeatherClassifier(self.weather_num, dtype=self.dtype,
                                name="weather_clf")
        out["weather_logits"] = clf(fine_feat0)
        if return_supcon_feature:
            pooled = jnp.mean(fine_feat, axis=(-3, -2))
            bsz = pooled.shape[0] // 2
            two_view = jnp.stack([pooled[:bsz], pooled[bsz:]], axis=1)
            out["supcon_proj"] = ProjectionHead(dtype=self.dtype,
                                                name="projection")(two_view)
        return out


def build_deeplab_dcss(cfg, dtype) -> DeepLabDCSS:
    """Factory for ``--model deeplabv3[plus]_<backbone>`` names
    (reference ``network/modeling.py:132-231``)."""
    name = cfg.model
    if name.startswith("deeplabv3plus_"):
        arch, backbone = "deeplabv3plus", name[len("deeplabv3plus_"):]
    elif name.startswith("deeplabv3_"):
        arch, backbone = "deeplabv3", name[len("deeplabv3_"):]
    else:
        raise NotImplementedError(f"deeplab model {name}")
    if backbone == "mobilenet":
        backbone = "mobilenetv2"
    return DeepLabDCSS(arch=arch, backbone=backbone, num_classes=cfg.num_classes,
                       weather_num=cfg.weather_num, output_stride=cfg.output_stride,
                       separable=cfg.separable_conv, dtype=dtype)
