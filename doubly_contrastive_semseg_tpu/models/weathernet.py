"""WeatherNet facade + weather classifier + SupCon projection head.

TPU-native re-design of reference ``network/weathernet.py:14-105``,
``network/classifier.py:6-32`` and the projection head the reference hides
inside ``SupConLoss`` (``utils/loss.py:104-109``).

Key structural change vs the reference: ALL trainable tensors live in one
Flax parameter pytree (backbone + seg head + weather classifier + projection
head). The reference constructs the classifier and projection head outside
``self.model`` so their parameters never reach the optimizer — they stay at
their random initialization for the whole run (see
``utils/init_trainer.py:160-177``: only ``self.model`` params are optimized).
We reproduce that *behavior* with optimizer param-group labels
(``train/optimizer.py``) instead of reproducing the structure.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from .blocks import BNReluConv
from .resnet_pyramid import resnet18_pyramid, resnet34_pyramid

Dtype = Any


class WeatherClassifier(nn.Module):
    """GAP → Linear(C → weather_num) monitoring head
    (reference ``network/classifier.py:6-32``). Its cross-entropy is logged but
    excluded from the total loss (reference ``trainer.py:205-206``)."""

    weather_num: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        x = jnp.mean(feats, axis=(-3, -2))  # NHWC global average pool
        x = nn.Dense(self.weather_num, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc")(x)
        return x.astype(jnp.float32)


class ProjectionHead(nn.Module):
    """Linear → ReLU → Linear projection for image-level contrast
    (reference ``utils/loss.py:104-109``; dim_in=128 for SwiftNet, 2048 for
    DeepLab; feat_dim=128)."""

    feat_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_in = x.shape[-1]
        x = nn.Dense(d_in, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.feat_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        return x.astype(jnp.float32)


class WeatherNet(nn.Module):
    """SwiftNet wrapper: pyramid backbone → 1×1 BNReluConv seg head → bilinear
    upsample to input resolution (reference ``network/weathernet.py:60-98``).

    Returns the reference 4-tuple as a dict:
      ``seg``          (B, H, W, num_classes)   — upsampled logits (fp32)
      ``seg_beforeup`` (B, H/4, W/4, num_classes)
      ``fine_feat``    (2B or B, H/4, W/4, 128) — contrast features, both views
      ``fine_feat0``   (B, H/4, W/4, 128)       — first view only
    In supcon mode the incoming batch is the two-view concat [2B, H, W, 3];
    only the first view feeds the segmentation head
    (reference ``weathernet.py:76-85``).
    """

    backbone: str = "resnet18"
    num_classes: int = 19
    # reference hard-codes efficient=True (gradient checkpointing,
    # weathernet.py:43,48) — remat + torch's double BN-stat update quirk
    efficient: bool = True
    fuse_stem: bool = True  # eval-only Pallas stem on the pyramid backbones
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False,
                 return_supcon_feature: bool = False,
                 depth: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        if self.backbone == "resnet18":
            fe = resnet18_pyramid(dtype=self.dtype, efficient=self.efficient,
                                  fuse_stem=self.fuse_stem,
                                  name="feature_extractor")
        elif self.backbone == "resnet34":
            fe = resnet34_pyramid(dtype=self.dtype, efficient=self.efficient,
                                  fuse_stem=self.fuse_stem,
                                  name="feature_extractor")
        elif self.backbone == "efficientnetb0":
            from .efficientnet_pyramid import PyramidEfficientNet

            fe = PyramidEfficientNet(dtype=self.dtype, name="feature_extractor")
        elif self.backbone == "mobilenetv2":
            from .mobilenetv2_pyramid import PyramidMobileNetV2

            fe = PyramidMobileNetV2(dtype=self.dtype, name="feature_extractor")
        elif self.backbone == "resnet18_back":
            from .resnet_pyramid_back import resnet18_pyramid_back

            fe = resnet18_pyramid_back(dtype=self.dtype, name="feature_extractor")
        elif self.backbone == "resnet18_single":
            from .swiftnet_single import SingleScaleSwiftNet

            fe = SingleScaleSwiftNet(dtype=self.dtype, name="feature_extractor")
        elif self.backbone == "resnet18_hourglass":
            from .swiftnet_single import HourglassSwiftNet

            fe = HourglassSwiftNet(dtype=self.dtype, name="feature_extractor")
        elif self.backbone == "resnet18_rgbd":
            from .swiftnet_single import RGBDSwiftNet

            fe = RGBDSwiftNet(dtype=self.dtype, name="feature_extractor")
        else:
            raise NotImplementedError(f"backbone {self.backbone}")

        if self.backbone == "resnet18_rgbd":
            # depth-gated two-branch variant (reference resnet_18.py:206-500);
            # without a depth channel in the batch, gate on a zero depth map
            d = depth if depth is not None else jnp.zeros(image.shape[:-1])
            fine_feat, additional = fe(image, d, train=train)
        else:
            fine_feat, additional = fe(image, train=train)

        if return_supcon_feature:
            bsz = fine_feat.shape[0] // 2
            fine_feat0 = fine_feat[:bsz]
        else:
            fine_feat0 = fine_feat

        from ..ops.input_pipeline import image_hw

        seg_beforeup = BNReluConv(self.num_classes, k=1, batch_norm=True, bias=True,
                                  dtype=self.dtype, name="segmentation")(
            fine_feat0, train=train)
        seg_beforeup = seg_beforeup.astype(jnp.float32)
        seg = resize_bilinear(seg_beforeup, image_hw(image))

        return {
            "seg": seg,
            "seg_beforeup": seg_beforeup,
            "fine_feat": fine_feat,
            "fine_feat0": fine_feat0,
            "skips_0": additional["skips_0"],
        }


class DCSSModel(nn.Module):
    """Top-level module bundling WeatherNet + weather classifier + projection
    head so that one ``init`` produces the full parameter pytree and one
    ``apply`` serves a whole train step.

    ``outputs['weather_logits']`` uses ``fine_feat0`` in training
    (reference ``trainer.py:110``) and the full ``fine_feat`` at validation
    (``trainer.py:346``) — identical tensors when not in supcon mode.
    ``outputs['supcon_proj']`` is the (B, 2, feat_dim) projected two-view
    embedding consumed by the SupCon/SimCLR loss.
    """

    backbone: str = "resnet18"
    num_classes: int = 19
    weather_num: int = 4
    efficient: bool = True  # reference default (weathernet.py:43)
    fuse_stem: bool = True  # eval-only Pallas stem (--no_fuse_stem disables)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False,
                 return_supcon_feature: bool = False,
                 depth: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        net = WeatherNet(backbone=self.backbone, num_classes=self.num_classes,
                         efficient=self.efficient, fuse_stem=self.fuse_stem,
                         dtype=self.dtype, name="net")
        out = net(image, train=train, return_supcon_feature=return_supcon_feature,
                  depth=depth)

        clf = WeatherClassifier(self.weather_num, dtype=self.dtype, name="weather_clf")
        out["weather_logits"] = clf(out["fine_feat0"])

        if return_supcon_feature:
            # GAP → split two views → project (reference utils/loss.py:114-120)
            pooled = jnp.mean(out["fine_feat"], axis=(-3, -2))  # (2B, 128)
            bsz = pooled.shape[0] // 2
            two_view = jnp.stack([pooled[:bsz], pooled[bsz:]], axis=1)  # (B, 2, 128)
            proj = ProjectionHead(dtype=self.dtype, name="projection")(two_view)
            out["supcon_proj"] = proj
        return out


def build_model(cfg) -> nn.Module:
    """Model factory mirroring reference ``utils/init_trainer.py:97-111``."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.deeplab or cfg.model.startswith("deeplabv3"):
        from .deeplab import build_deeplab_dcss  # noqa: deferred heavy import

        return build_deeplab_dcss(cfg, dtype)
    if cfg.model == "enet":
        from .enet import build_enet_dcss

        return build_enet_dcss(cfg, dtype)
    if cfg.model in ("resnet18", "resnet34", "efficientnetb0", "mobilenetv2",
                     "resnet18_single", "resnet18_hourglass", "resnet18_rgbd",
                     "resnet18_back"):
        return DCSSModel(backbone=cfg.model, num_classes=cfg.num_classes,
                         weather_num=cfg.weather_num,
                         efficient=getattr(cfg, "efficient", True),
                         fuse_stem=getattr(cfg, "fuse_stem", True), dtype=dtype)
    raise NotImplementedError(f"model {cfg.model}")
