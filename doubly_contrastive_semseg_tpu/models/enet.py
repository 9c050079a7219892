"""ENet (Paszke et al. 2016) — TPU-native re-design of reference
``network/enet.py:5-641``.

Architecture parity: InitialBlock (13-ch conv ‖ 3-ch maxpool), encoder stages
1-3 (downsampling + regular/dilated/asymmetric bottlenecks with the
reference's dilation/dropout schedule), decoder stages 4-5 with max-unpooling,
final 2× transposed conv. Supcon two-view split happens at the stage-3
bottleneck exactly like the reference (``enet.py:584-641``).

TPU-native choices:
- torch ``MaxPool2d(return_indices=True)`` + ``MaxUnpool2d`` have no XLA
  primitive; the 2×2/stride-2 case is expressed as a reshape-to-windows
  argmax (pool) and a one-hot scatter into the 2×2 window (unpool) — fully
  static, vectorized, and fusable.
- ``Dropout2d`` → flax Dropout broadcast over the spatial dims.
- the final ``ConvTranspose2d(output_size=input)`` → SAME-padded transposed
  conv producing exactly 2× (same learned-upsample capacity).

Deviation (documented): the reference interpolates the pixel-contrast feature
map to FULL output resolution (``enet.py:639``), making hard-anchor sampling
run over ~590k pixels/image; here ``fine_feat0`` is interpolated to 1/4 input
resolution, matching the WeatherNet contract (``weathernet.py:84``) and
keeping the contrastive stage's cost uniform across model families.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from .blocks import batch_norm
from .weathernet import ProjectionHead, WeatherClassifier

Dtype = Any


def _prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, alpha * x)


class Act(nn.Module):
    """PReLU (encoder default) or ReLU (decoder default), torch-style single
    shared slope parameter."""

    relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.relu:
            return nn.relu(x)
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        return _prelu(x, alpha.astype(x.dtype))


def max_pool_2x2_with_indices(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2×2/стride-2 max pool returning per-window argmax indices (0..3).
    Replaces ``MaxPool2d(return_indices=True)``."""
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    windows = xr.reshape(b, h // 2, w // 2, 4, c)
    idx = jnp.argmax(windows, axis=3).astype(jnp.int32)
    pooled = jnp.max(windows, axis=3)
    return pooled, idx


def max_unpool_2x2(y: jax.Array, idx: jax.Array) -> jax.Array:
    """Scatter y back into the argmax position of each 2×2 window
    (``MaxUnpool2d`` replacement)."""
    b, h2, w2, c = y.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=y.dtype, axis=3)       # (B,h,w,4,C)
    scattered = y[:, :, :, None, :] * onehot                      # (B,h,w,4,C)
    scattered = scattered.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return scattered.reshape(b, h2 * 2, w2 * 2, c)


class InitialBlock(nn.Module):
    """3×3/s2 conv (out-3 ch) ‖ 2×2 maxpool (3 ch) → concat → BN → act."""

    out_channels: int = 16
    relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        main = nn.Conv(self.out_channels - 3, (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)], use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32, name="main")(x)
        # reference enet.py:53: MaxPool2d(3, stride=2, padding=1) — a 3x3
        # window, NOT the 2x2 of the downsampling bottlenecks; -inf padding
        # matches torch's
        ext = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        out = jnp.concatenate([main, ext], axis=-1)
        out = batch_norm(self.dtype, name="bn")(out, use_running_average=not train)
        return Act(self.relu, self.dtype, name="act")(out)


class RegularBottleneck(nn.Module):
    """1×1 reduce → (3×3 | dilated 3×3 | asymmetric 5×1+1×5) → 1×1 expand,
    spatial dropout, residual add (reference ``enet.py`` RegularBottleneck)."""

    channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    dilation: int = 1
    asymmetric: bool = False
    dropout_prob: float = 0.0
    relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        inter = self.channels // self.internal_ratio
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        ext = nn.Conv(inter, (1, 1), **conv_kw, name="ext_conv1")(x)
        ext = batch_norm(self.dtype, name="ext_bn1")(ext, use_running_average=not train)
        ext = Act(self.relu, self.dtype, name="ext_act1")(ext)

        k, d = self.kernel_size, self.dilation
        if self.asymmetric:
            p = k // 2
            ext = nn.Conv(inter, (k, 1), padding=[(p, p), (0, 0)], **conv_kw,
                          name="ext_conv2a")(ext)
            ext = batch_norm(self.dtype, name="ext_bn2a")(ext, use_running_average=not train)
            ext = Act(self.relu, self.dtype, name="ext_act2a")(ext)
            ext = nn.Conv(inter, (1, k), padding=[(0, 0), (p, p)], **conv_kw,
                          name="ext_conv2b")(ext)
        else:
            p = d * (k // 2)
            ext = nn.Conv(inter, (k, k), padding=[(p, p), (p, p)],
                          kernel_dilation=(d, d), **conv_kw, name="ext_conv2")(ext)
        ext = batch_norm(self.dtype, name="ext_bn2")(ext, use_running_average=not train)
        ext = Act(self.relu, self.dtype, name="ext_act2")(ext)

        ext = nn.Conv(self.channels, (1, 1), **conv_kw, name="ext_conv3")(ext)
        ext = batch_norm(self.dtype, name="ext_bn3")(ext, use_running_average=not train)
        # reference enet.py:186-192: ext_conv3 is Sequential(conv, BN,
        # activation()) — the activation BEFORE dropout is part of the branch
        ext = Act(self.relu, self.dtype, name="ext_act3")(ext)
        ext = nn.Dropout(self.dropout_prob, broadcast_dims=(1, 2),
                         deterministic=not train, name="ext_drop")(ext)
        return Act(self.relu, self.dtype, name="out_act")(x + ext)


class DownsamplingBottleneck(nn.Module):
    """Main: 2×2 maxpool (indices kept) + channel zero-pad; ext: 2×2/s2 conv
    bottleneck; add."""

    in_channels: int
    out_channels: int
    internal_ratio: int = 4
    dropout_prob: float = 0.0
    relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool):
        inter = self.in_channels // self.internal_ratio
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        main, idx = max_pool_2x2_with_indices(x)
        pad = self.out_channels - self.in_channels
        main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))

        ext = nn.Conv(inter, (2, 2), strides=(2, 2), **conv_kw, name="ext_conv1")(x)
        ext = batch_norm(self.dtype, name="ext_bn1")(ext, use_running_average=not train)
        ext = Act(self.relu, self.dtype, name="ext_act1")(ext)
        ext = nn.Conv(inter, (3, 3), padding=[(1, 1), (1, 1)], **conv_kw,
                      name="ext_conv2")(ext)
        ext = batch_norm(self.dtype, name="ext_bn2")(ext, use_running_average=not train)
        ext = Act(self.relu, self.dtype, name="ext_act2")(ext)
        ext = nn.Conv(self.out_channels, (1, 1), **conv_kw, name="ext_conv3")(ext)
        ext = batch_norm(self.dtype, name="ext_bn3")(ext, use_running_average=not train)
        # reference enet.py:304-311: Sequential(conv, BN, activation())
        ext = Act(self.relu, self.dtype, name="ext_act3")(ext)
        ext = nn.Dropout(self.dropout_prob, broadcast_dims=(1, 2),
                         deterministic=not train, name="ext_drop")(ext)
        out = Act(self.relu, self.dtype, name="out_act")(main + ext)
        return out, idx


class UpsamplingBottleneck(nn.Module):
    """Main: 1×1 conv + BN + max-unpool; ext: transposed-conv bottleneck; add."""

    out_channels: int
    internal_ratio: int = 4
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, idx: jax.Array, *, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        inter = in_ch // self.internal_ratio
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        main = nn.Conv(self.out_channels, (1, 1), **conv_kw, name="main_conv")(x)
        main = batch_norm(self.dtype, name="main_bn")(main, use_running_average=not train)
        main = max_unpool_2x2(main, idx)

        ext = nn.Conv(inter, (1, 1), **conv_kw, name="ext_conv1")(x)
        ext = batch_norm(self.dtype, name="ext_bn1")(ext, use_running_average=not train)
        ext = Act(self.relu, self.dtype, name="ext_act1")(ext)
        # reference enet.py:426-431: ConvTranspose2d(kernel_size=2, stride=2)
        # — each input pixel expands to a disjoint 2x2 block (VALID, no crop)
        ext = nn.ConvTranspose(inter, (2, 2), strides=(2, 2), padding="VALID",
                               **conv_kw, name="ext_tconv")(ext)
        ext = batch_norm(self.dtype, name="ext_bn2")(ext, use_running_average=not train)
        ext = Act(self.relu, self.dtype, name="ext_act2")(ext)
        ext = nn.Conv(self.out_channels, (1, 1), **conv_kw, name="ext_conv2")(ext)
        ext = batch_norm(self.dtype, name="ext_bn3")(ext, use_running_average=not train)
        ext = nn.Dropout(self.dropout_prob, broadcast_dims=(1, 2),
                         deterministic=not train, name="ext_drop")(ext)
        return Act(self.relu, self.dtype, name="out_act")(main + ext)


class ENet(nn.Module):
    """Full ENet with the doubly-contrastive output contract."""

    num_classes: int = 19
    encoder_relu: bool = False
    decoder_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 return_supcon_feature: bool = False) -> Dict[str, jax.Array]:
        er, dr, dt = self.encoder_relu, self.decoder_relu, self.dtype
        input_hw = (x.shape[-3], x.shape[-2])
        x = x.astype(dt)

        x = InitialBlock(16, er, dt, name="initial_block")(x, train=train)

        # Stage 1
        x, idx1 = DownsamplingBottleneck(16, 64, dropout_prob=0.01, relu=er,
                                         dtype=dt, name="downsample1_0")(x, train=train)
        for i in range(1, 5):
            x = RegularBottleneck(64, dropout_prob=0.01, relu=er, dtype=dt,
                                  name=f"regular1_{i}")(x, train=train)

        # Stage 2
        x, idx2 = DownsamplingBottleneck(64, 128, dropout_prob=0.1, relu=er,
                                         dtype=dt, name="downsample2_0")(x, train=train)
        stage23 = [
            ("regular2_1", dict()),
            ("dilated2_2", dict(dilation=2)),
            ("asymmetric2_3", dict(kernel_size=5, asymmetric=True)),
            ("dilated2_4", dict(dilation=4)),
            ("regular2_5", dict()),
            ("dilated2_6", dict(dilation=8)),
            ("asymmetric2_7", dict(kernel_size=5, asymmetric=True)),
            ("dilated2_8", dict(dilation=16)),
            # Stage 3 (no downsample)
            ("regular3_0", dict()),
            ("dilated3_1", dict(dilation=2)),
            ("asymmetric3_2", dict(kernel_size=5, asymmetric=True)),
            ("dilated3_3", dict(dilation=4)),
            ("regular3_4", dict()),
            ("dilated3_5", dict(dilation=8)),
            ("asymmetric3_6", dict(kernel_size=5, asymmetric=True)),
            ("dilated3_7", dict(dilation=16)),
        ]
        for name, kw in stage23:
            x = RegularBottleneck(128, dropout_prob=0.1, relu=er, dtype=dt,
                                  name=name, **kw)(x, train=train)

        fine_feat = x  # (2B or B, H/8, W/8, 128) — reference enet.py:622
        if return_supcon_feature:
            bsz = fine_feat.shape[0] // 2
            feat0 = fine_feat[:bsz]
            idx1 = idx1[:bsz]
            idx2 = idx2[:bsz]
        else:
            feat0 = fine_feat

        # Stage 4 - Decoder
        x = UpsamplingBottleneck(64, dropout_prob=0.1, relu=dr, dtype=dt,
                                 name="upsample4_0")(feat0, idx2, train=train)
        x = RegularBottleneck(64, dropout_prob=0.1, relu=dr, dtype=dt,
                              name="regular4_1")(x, train=train)
        x = RegularBottleneck(64, dropout_prob=0.1, relu=dr, dtype=dt,
                              name="regular4_2")(x, train=train)

        # Stage 5 - Decoder
        x = UpsamplingBottleneck(16, dropout_prob=0.1, relu=dr, dtype=dt,
                                 name="upsample5_0")(x, idx1, train=train)
        x = RegularBottleneck(16, dropout_prob=0.1, relu=dr, dtype=dt,
                              name="regular5_1")(x, train=train)
        # reference enet.py:576-583: ConvTranspose2d(k=3, s=2, p=1) with
        # output_size=input → torch takes rows/cols 1..2H of the full
        # (2H+1)-sized fractionally-strided conv; VALID + [1:] slice is
        # bit-equal (see torch_convert._tconv_kernel)
        seg = nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                               padding="VALID", use_bias=False, dtype=dt,
                               param_dtype=jnp.float32, name="transposed_conv")(x)
        seg = seg[:, 1:, 1:, :].astype(jnp.float32)

        # fine_feat0 at 1/4 input resolution (deviation from enet.py:639 —
        # see module docstring)
        feat_hw = (input_hw[0] // 4, input_hw[1] // 4)
        fine_feat0 = resize_bilinear(feat0, feat_hw)

        return {
            "seg": seg,
            "seg_beforeup": seg,  # reference returns (x, x, ...) — enet.py:641
            "fine_feat": fine_feat,
            "fine_feat0": fine_feat0,
        }


class ENetDCSS(nn.Module):
    """ENet + weather classifier + projection head, same contract as DCSSModel."""

    num_classes: int = 19
    weather_num: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False,
                 return_supcon_feature: bool = False) -> Dict[str, jax.Array]:
        net = ENet(num_classes=self.num_classes, dtype=self.dtype, name="net")
        out = net(image, train=train, return_supcon_feature=return_supcon_feature)
        clf = WeatherClassifier(self.weather_num, dtype=self.dtype, name="weather_clf")
        out["weather_logits"] = clf(out["fine_feat0"])
        if return_supcon_feature:
            pooled = jnp.mean(out["fine_feat"], axis=(-3, -2))
            bsz = pooled.shape[0] // 2
            two_view = jnp.stack([pooled[:bsz], pooled[bsz:]], axis=1)
            out["supcon_proj"] = ProjectionHead(dtype=self.dtype, name="projection")(two_view)
        return out


def build_enet_dcss(cfg, dtype) -> ENetDCSS:
    return ENetDCSS(num_classes=cfg.num_classes, weather_num=cfg.weather_num,
                    dtype=dtype)
