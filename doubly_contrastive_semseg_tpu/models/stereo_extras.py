"""Legacy stereo aggregation + refinement surface (RODSNet era), complete.

TPU-native re-design of the remaining reference stereo components:

- 3D-conv cost aggregation family (reference ``network/aggregation.py``):
  ``StereoNetAggregation`` (:70-92), ``PSMNetBasicAggregation`` (:94-145),
  ``PSMNetHGAggregation`` + hourglass (:147-258), ``GCNetAggregation``
  (:260-311). Volumes are channels-last 5-D ``(B, D, H, W, C)`` so XLA maps
  the 3-D convolutions onto the MXU with C in the lanes (the reference's
  NCDHW order is a CUDA convention, not a requirement).
- the refinement-head family (reference ``network/refinement.py:62-1093``):
  ``StereoDRNetRefinement``, ``HourglassRefinement`` (deform-conv U-net on
  warp error), and the ``Refine_disp_sem`` / ``Refine_New1..12`` series.

The reference's eight ``Refine_New*`` classes are copy-paste mutations of one
skeleton (stem → three input encoders → hourglass U-net → disp + sem heads)
that differ only in encoder width, sum-vs-concat input fusion, input channel
attention, where the semantic head taps, and an optional second U-net pass.
Here that skeleton is ONE module (``SemRefine``) with those differences as
config fields; ``REFINE_NEW_VARIANTS`` instantiates each published variant
(same capability surface, no duplicated code).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import DeformConv2d
from ..ops.interpolate import resize_bilinear
from ..ops.warp import disp_warp
from .blocks import batch_norm, conv_kxk

Dtype = Any


class _ImageStem7x7(nn.Module):
    """7×7/s2 image-stem conv kernel at checkpoint path ``<name>/kernel``
    (dense (7, 7, 3, 64) — the torch-convert source of truth). Applies the
    dense stride-2 form on NHWC input, or the equivalent folded 4×4/s1 s2d
    form when the host loader feeds space-to-depth-packed batches (the same
    algebra the main trunk stem uses; see ``ops/input_pipeline.py``)."""

    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, left: jax.Array, fused_bn=None) -> jax.Array:
        from ..ops.input_pipeline import (is_s2d_image, s2d_stem_geometry,
                                          stem_s2d_fold)

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features), jnp.float32)
        x = left.astype(self.dtype)
        if is_s2d_image(left):
            folded = stem_s2d_fold(kernel).astype(self.dtype)
            if fused_bn is not None:
                # serving fast path: the caller passes folded BN scale/bias
                # and receives conv+BN+ReLU+maxpool from the trunk's fused
                # Pallas stem kernel (ops/stem_pallas.py) — same shape/math
                # as the 7×7/s2 stem, measured 9.9 → 6.5 ms at 2048×1024
                from ..ops import stem_pallas

                return stem_pallas.fused_stem_pool(
                    x, folded, fused_bn[0], fused_bn[1],
                    interpret=bool(os.environ.get("DCSS_STEM_INTERPRET")))
            _, pad = s2d_stem_geometry(7)
            return jax.lax.conv_general_dilated(
                x, folded, (1, 1),
                [pad, pad], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# 3-D conv helpers (channels-last, (B, D, H, W, C))
# ---------------------------------------------------------------------------


class Conv3D(nn.Module):
    """conv3d → BN → activation (reference ``aggregation.py:8-21`` helpers:
    ``conv3d`` uses LeakyReLU(0.2), ``convbn_3d`` has no activation,
    ``conv3x3_3d`` uses ReLU)."""

    features: int
    stride: int = 1
    act: Optional[str] = "leaky"  # leaky | relu | None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(self.features, (3, 3, 3), strides=(self.stride,) * 3,
                    padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = batch_norm(self.dtype, name="bn")(x, use_running_average=not train)
        if self.act == "leaky":
            x = nn.leaky_relu(x, 0.2)
        elif self.act == "relu":
            x = nn.relu(x)
        return x


class TransConv3D(nn.Module):
    """stride-2 transposed conv3d → BN → optional ReLU (reference
    ``trans_conv3x3_3d``, ``aggregation.py:61-68``)."""

    features: int
    act: bool = True
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1) keeps rows
        # 1..2N of the full (2N+1)-wide fractionally-strided conv; VALID +
        # [1:] slice per spatial dim is bit-equal (same rule as the ENet
        # k=3 deconv, torch_convert._tconv_kernel) — SAME crops the other
        # side and misaligns by one
        x = nn.ConvTranspose(self.features, (3, 3, 3), strides=(2, 2, 2),
                             padding="VALID", use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv")(x)
        x = x[:, 1:, 1:, 1:, :]
        if self.use_bn:
            x = batch_norm(self.dtype, name="bn")(x, use_running_average=not train)
        if self.act:
            x = nn.relu(x)
        return x


def volume_to_ndhwc(vol_bhwdc: jax.Array) -> jax.Array:
    """(B, H, W, D, C) cost volume (ops/cost_volume.py) → (B, D, H, W, C)."""
    return jnp.transpose(vol_bhwdc, (0, 3, 1, 2, 4))


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


class StereoNetAggregation(nn.Module):
    """Four 3-D convs + 1-ch head over a (difference) cost volume
    (reference ``aggregation.py:70-92``). In: (B, D, H, W, C);
    out: (B, H, W, D) matching-similarity volume."""

    channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vol: jax.Array, train: bool) -> jax.Array:
        x = vol
        for i in range(4):
            x = Conv3D(self.channels, act="leaky", dtype=self.dtype,
                       name=f"agg{i}")(x, train)
        x = nn.Conv(1, (3, 3, 3), padding=1, use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="final")(x)
        return jnp.transpose(x[..., 0], (0, 2, 3, 1)).astype(jnp.float32)


class PSMNetBasicAggregation(nn.Module):
    """PSMNet "basic": 12 3-D convs with residual pairs over the concat
    volume (reference ``aggregation.py:94-145``); output upsampled ×4
    trilinear to full resolution. Out: (B, H, W, D) cost (negate for
    soft-argmin: these are matching costs, not similarities)."""

    channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vol: jax.Array, train: bool) -> jax.Array:
        x = Conv3D(self.channels, act="relu", dtype=self.dtype, name="dres0_0")(vol, train)
        x = Conv3D(self.channels, act="relu", dtype=self.dtype, name="dres0_1")(x, train)
        for i in range(1, 5):
            r = Conv3D(self.channels, act="relu", dtype=self.dtype,
                       name=f"dres{i}_0")(x, train)
            r = Conv3D(self.channels, act=None, dtype=self.dtype,
                       name=f"dres{i}_1")(r, train)
            x = x + r
        x = Conv3D(self.channels, act="relu", dtype=self.dtype, name="classify0")(x, train)
        x = nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="classify1")(x)
        return _upsample_volume_4x(x[..., 0])


class PSMNetHourglass(nn.Module):
    """3-D hourglass: /2 → /4 → ×2 → ×4 with pre/post skip fusion
    (reference ``aggregation.py:147-192``)."""

    channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool):
        c = self.channels
        out = Conv3D(2 * c, stride=2, act="relu", dtype=self.dtype, name="conv1")(x, train)
        pre = Conv3D(2 * c, act=None, dtype=self.dtype, name="conv2")(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)
        out = Conv3D(2 * c, stride=2, act="relu", dtype=self.dtype, name="conv3")(pre, train)
        out = Conv3D(2 * c, act="relu", dtype=self.dtype, name="conv4")(out, train)
        up = TransConv3D(2 * c, act=False, dtype=self.dtype, name="conv5")(out, train)
        post = nn.relu(up + (presqu if presqu is not None else pre))
        out = TransConv3D(c, act=False, dtype=self.dtype, name="conv6")(post, train)
        return out, pre, post


class PSMNetHGAggregation(nn.Module):
    """PSMNet stacked-hourglass ("22 conv") aggregation (reference
    ``aggregation.py:194-258``): 3 chained hourglasses with skip reuse and 3
    intermediate classifiers (all three returned in train mode for the
    deep-supervision loss). Out: list of (B, H, W, D) costs at full res."""

    channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vol: jax.Array, train: bool):
        c = self.channels
        x = Conv3D(c, act="relu", dtype=self.dtype, name="dres0_0")(vol, train)
        x = Conv3D(c, act="relu", dtype=self.dtype, name="dres0_1")(x, train)
        r = Conv3D(c, act="relu", dtype=self.dtype, name="dres1_0")(x, train)
        cost0 = x + Conv3D(c, act=None, dtype=self.dtype, name="dres1_1")(r, train)

        out1, pre1, post1 = PSMNetHourglass(c, dtype=self.dtype, name="hg1")(
            cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = PSMNetHourglass(c, dtype=self.dtype, name="hg2")(
            out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, _, _ = PSMNetHourglass(c, dtype=self.dtype, name="hg3")(
            out2, pre1, post2, train)
        out3 = out3 + cost0

        costs = []
        prev = None
        for i, o in enumerate((out1, out2, out3), start=1):
            h = Conv3D(c, act="relu", dtype=self.dtype, name=f"classif{i}_0")(o, train)
            h = nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"classif{i}_1")(h)[..., 0]
            h = h if prev is None else h + prev
            prev = h
            costs.append(h)
        if train:
            return [_upsample_volume_4x(cst) for cst in costs]
        return [_upsample_volume_4x(costs[-1])]


class GCNetAggregation(nn.Module):
    """GCNet encoder-decoder 3-D aggregation (reference
    ``aggregation.py:260-311``): 4 stride-2 encoder stages with parallel
    refits, 5 transposed-conv decoder stages with additive skips. Expects a
    half-resolution concat volume; emits full resolution."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vol: jax.Array, train: bool) -> jax.Array:
        dt = self.dtype
        conv1 = Conv3D(32, act="relu", dtype=dt, name="conv1_0")(vol, train)
        conv1 = Conv3D(32, act="relu", dtype=dt, name="conv1_1")(conv1, train)
        conv2a = Conv3D(64, stride=2, act="relu", dtype=dt, name="conv2a")(vol, train)
        conv2b = Conv3D(64, act="relu", dtype=dt, name="conv2b_0")(conv2a, train)
        conv2b = Conv3D(64, act="relu", dtype=dt, name="conv2b_1")(conv2b, train)
        conv3a = Conv3D(64, stride=2, act="relu", dtype=dt, name="conv3a")(conv2a, train)
        conv3b = Conv3D(64, act="relu", dtype=dt, name="conv3b_0")(conv3a, train)
        conv3b = Conv3D(64, act="relu", dtype=dt, name="conv3b_1")(conv3b, train)
        conv4a = Conv3D(64, stride=2, act="relu", dtype=dt, name="conv4a")(conv3a, train)
        conv4b = Conv3D(64, act="relu", dtype=dt, name="conv4b_0")(conv4a, train)
        conv4b = Conv3D(64, act="relu", dtype=dt, name="conv4b_1")(conv4b, train)
        conv5a = Conv3D(128, stride=2, act="relu", dtype=dt, name="conv5a")(conv4a, train)
        conv5b = Conv3D(128, act="relu", dtype=dt, name="conv5b_0")(conv5a, train)
        conv5b = Conv3D(128, act="relu", dtype=dt, name="conv5b_1")(conv5b, train)

        t1 = TransConv3D(64, dtype=dt, name="trans1")(conv5b, train)
        t2 = TransConv3D(64, dtype=dt, name="trans2")(t1 + conv4b, train)
        t3 = TransConv3D(64, dtype=dt, name="trans3")(t2 + conv3b, train)
        t4 = TransConv3D(32, dtype=dt, name="trans4")(t3 + conv2b, train)
        # the reference's final ConvTranspose3d(k=3, s=2, p=1) without
        # output_padding yields 2n−1 (an off-by-one legacy defect); SAME
        # padding gives the intended 2n full-resolution volume
        t5 = nn.ConvTranspose(1, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                              use_bias=False, dtype=dt, param_dtype=jnp.float32,
                              name="trans5")(t4 + conv1)
        return jnp.transpose(t5[..., 0], (0, 2, 3, 1)).astype(jnp.float32)


def _upsample_volume_4x(vol_ndhw: jax.Array) -> jax.Array:
    """(B, D, H, W) → (B, 4H, 4W, 4D) trilinear ×4, returned as (B, H', W', D')
    (reference PSMNet: ``F.interpolate(cost, scale_factor=4, 'trilinear')``)."""
    v = jnp.transpose(vol_ndhw, (0, 2, 3, 1))  # (B, H, W, D)
    b, h, w, d = v.shape
    v = resize_bilinear(v, (4 * h, 4 * w))
    # depth axis: linear interp along D (align_corners=False, scale 4)
    pos = (jnp.arange(4 * d, dtype=jnp.float32) + 0.5) / 4.0 - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, d - 1)
    hi = jnp.clip(lo + 1, 0, d - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)
    return v[..., lo] * (1 - frac) + v[..., hi] * frac


# ---------------------------------------------------------------------------
# Refinement family
# ---------------------------------------------------------------------------


class _BasicConv(nn.Module):
    """conv(stride) → BN → ReLU (reference GANet ``BasicConv``)."""

    features: int
    stride: int = 1
    deconv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.deconv:
            # SAME ≙ torch ConvTranspose2d(k=4, s=2, p=1): out = 2·in
            x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="conv")(x)
        else:
            x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                        padding=1, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(x)
        x = batch_norm(self.dtype, name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class _ConvBNLRelu(nn.Module):
    """3×3 conv → BN → LeakyReLU(0.2) — the ``conv2d`` helper every
    refinement head uses for its input encoders (``refinement.py:12-17``)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = conv_kxk(self.features, 3, dtype=self.dtype, name="conv")(x)
        x = batch_norm(self.dtype, name="bn")(x, use_running_average=not train)
        return nn.leaky_relu(x, 0.2)


class _Conv2x(nn.Module):
    """GANet ``Conv2x``: stride-2 conv (or ×2 deconv), concat with the skip,
    then a fusing conv — the U-net step used throughout the refinement heads
    (reference ``refinement.py`` via ``network/feature.py:1009-1041``).

    The reference's ``mdconv`` flag is accepted but NEVER used — ``conv2`` is
    always a plain BasicConv (``feature.py:1020-1028``), so the "deformable"
    b-pass of HourglassRefinement is in fact ordinary convs. Reproduced
    verbatim (the flag is kept for call-site parity) so trained reference
    weights import exactly (``tests/test_stereo_oracle.py``)."""

    features: int
    deconv: bool = False
    mdconv: bool = False  # accepted-and-ignored, like the reference
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool) -> jax.Array:
        x = _BasicConv(self.features, stride=2, deconv=self.deconv,
                       dtype=self.dtype, name="conv1")(x, train)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return _BasicConv(self.features, dtype=self.dtype, name="conv2")(x, train)


def _upsample_disp(disp: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """(B, h, w) → (B, H, W, 1) bilinear with width-proportional value scale
    (reference refinement upsample-and-scale rule)."""
    scale = hw[1] / disp.shape[-1]
    return resize_bilinear(disp[..., None].astype(jnp.float32), hw) * scale


class StereoDRNetRefinement(nn.Module):
    """Warp-error-driven refinement (reference ``refinement.py:62-108``):
    conv(error‖left) + conv(disp) → dilated residual blocks → Δdisp."""

    channels: int = 16
    dilations: Tuple[int, ...] = (1, 2, 4, 8, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, disp: jax.Array, left: jax.Array, right: jax.Array,
                 train: bool) -> jax.Array:
        hw = (left.shape[-3], left.shape[-2])
        d = _upsample_disp(disp, hw)
        warped, _ = disp_warp(right.astype(jnp.float32), d[..., 0])
        error = warped - left.astype(jnp.float32)
        c1 = conv_kxk(self.channels, 3, dtype=self.dtype, name="conv1")(
            jnp.concatenate([error, left.astype(jnp.float32)], axis=-1))
        c2 = conv_kxk(self.channels, 3, dtype=self.dtype, name="conv2")(d)
        x = jnp.concatenate([c1, c2], axis=-1)
        for i, dil in enumerate(self.dilations):
            r = conv_kxk(2 * self.channels, 3, dilation=dil, dtype=self.dtype,
                         name=f"res{i}_conv")(nn.relu(x))
            r = batch_norm(self.dtype, name=f"res{i}_bn")(r, use_running_average=not train)
            x = x + r
        delta = conv_kxk(1, 3, bias=True, dtype=self.dtype, name="final")(nn.relu(x))
        return nn.relu(d + delta)[..., 0]


class HourglassRefinement(nn.Module):
    """Two-pass deformable U-net over warp error (reference
    ``refinement.py:111-204``): encoders 32→48→64→96→128 (top two levels
    deformable), twin decoder passes with ``Conv2x`` skip fusion."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, disp: jax.Array, left: jax.Array, right: jax.Array,
                 train: bool) -> jax.Array:
        dt = self.dtype
        hw = (left.shape[-3], left.shape[-2])
        d = _upsample_disp(disp, hw)
        warped, _ = disp_warp(right.astype(jnp.float32), d[..., 0])
        error = warped - left.astype(jnp.float32)
        c1 = _ConvBNLRelu(16, dtype=dt, name="conv1")(
            jnp.concatenate([error, left.astype(jnp.float32)], axis=-1), train)
        c2 = _ConvBNLRelu(16, dtype=dt, name="conv2")(d, train)
        x = jnp.concatenate([c1, c2], axis=-1)

        x = DeformConv2d(32, dtype=dt, name="conv_start")(x)
        rem0 = x
        x = _BasicConv(48, stride=2, dtype=dt, name="conv1a")(x, train); rem1 = x
        x = _BasicConv(64, stride=2, dtype=dt, name="conv2a")(x, train); rem2 = x
        x = DeformConv2d(96, stride=2, dtype=dt, name="conv3a")(x)
        rem3 = x
        x = DeformConv2d(128, stride=2, dtype=dt, name="conv4a")(x)
        rem4 = x
        x = _Conv2x(96, deconv=True, dtype=dt, name="deconv4a")(x, rem3, train); rem3 = x
        x = _Conv2x(64, deconv=True, dtype=dt, name="deconv3a")(x, rem2, train); rem2 = x
        x = _Conv2x(48, deconv=True, dtype=dt, name="deconv2a")(x, rem1, train); rem1 = x
        x = _Conv2x(32, deconv=True, dtype=dt, name="deconv1a")(x, rem0, train); rem0 = x

        x = _Conv2x(48, dtype=dt, name="conv1b")(x, rem1, train); rem1 = x
        x = _Conv2x(64, dtype=dt, name="conv2b")(x, rem2, train); rem2 = x
        x = _Conv2x(96, mdconv=True, dtype=dt, name="conv3b")(x, rem3, train); rem3 = x
        x = _Conv2x(128, mdconv=True, dtype=dt, name="conv4b")(x, rem4, train)

        x = _Conv2x(96, deconv=True, dtype=dt, name="deconv4b")(x, rem3, train)
        x = _Conv2x(64, deconv=True, dtype=dt, name="deconv3b")(x, rem2, train)
        x = _Conv2x(48, deconv=True, dtype=dt, name="deconv2b")(x, rem1, train)
        x = _Conv2x(32, deconv=True, dtype=dt, name="deconv1b")(x, rem0, train)

        delta = conv_kxk(1, 3, bias=True, dtype=dt, name="final")(x)
        return nn.relu(d + delta)[..., 0]


def _composed_disp_head(chain, x: jax.Array) -> jax.Array:
    """Collapse a LINEAR ×4-upsampling disparity head — ``chain`` =
    3×3 conv(→1ch, bias) ∘ deconv4×4/s2 ∘ deconv4×4/s2, no nonlinearities —
    into one 3×3 conv producing the 16 output phases at input resolution,
    plus a depth-to-space.

    The composed kernel is extracted *exactly* by pushing per-channel
    impulses through ``chain`` itself (32 impulses batched; the response
    around the impulse IS the composed kernel, support 3×3 blocks), so this
    stays correct for any weights with zero per-layer bookkeeping. One
    subtlety: each deconv's SAME-crop drops virtual border rows, so the
    single composed conv (which zero-pads the *input*) disagrees within
    ~4 px of each image edge; those bands are recomputed with the original
    chain on 8-row/col strips and pasted over (strip-local crops equal the
    full image's on the outward edge; inner-edge artifacts stay outside the
    pasted 16-px band). Interior equality is exact in f32 and at the bf16
    rounding floor in bf16; measured 12.0 → 5.5 ms at (2, 256, 512, 32) on
    v5e — the full-res 32-channel deconv intermediates never exist."""
    b, h, w, cin = x.shape
    idx = jnp.arange(cin)
    imp = jnp.zeros((cin, 12, 12, cin), x.dtype).at[idx, 4, 4, idx].set(1.0)
    resp = chain(imp)[..., 0]                              # (cin, 48, 48)
    bias = chain(jnp.zeros((1, 12, 12, cin), x.dtype))[0, 20, 20, 0]
    r = resp - bias
    # K[jy, jx, ci, 4·py+px] = r[ci, 4·(5−jy)+py, 4·(5−jx)+px]: the impulse
    # sits at block (4, 4); out_ph[v] = Σ_j xpad[v+j]·K[j] puts block v=5−j
    # in K slot j (window starts one block above/left of the output block)
    blocks = r.reshape(cin, 12, 4, 12, 4)                  # [ci, vy, py, vx, px]
    sel = jnp.array([5, 4, 3])
    k = blocks[:, sel][:, :, :, sel]                       # (ci, 3, py, 3, px)
    k = k.transpose(1, 3, 0, 2, 4).reshape(3, 3, cin, 16)
    y = jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), k.astype(x.dtype),
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    full = y.reshape(b, h, w, 4, 4).transpose(0, 1, 3, 2, 4)
    full = full.reshape(b, 4 * h, 4 * w, 1) + bias
    top = chain(x[:, :8])
    full = full.at[:, :16].set(top[:, :16])
    bot = chain(x[:, -8:])
    full = full.at[:, -16:].set(bot[:, -16:])
    lft = chain(x[:, :, :8])
    full = full.at[:, :, :16].set(lft[:, :, :16])
    rgt = chain(x[:, :, -8:])
    full = full.at[:, :, -16:].set(rgt[:, :, -16:])
    return full


class SemRefine(nn.Module):
    """The ``Refine_disp_sem`` / ``Refine_New*`` skeleton, parameterized
    (reference ``refinement.py:207-1093``): 7×7/s2+maxpool stem over the left
    image, three encoders (image features, low-res disparity, semantic
    features), fused sum-or-concat, a 4-level ``_BasicConv``/``_Conv2x``
    U-net, optional second (deformable) U-net pass, disp head deconvolved to
    full resolution + 128-ch semantic head.

    Variant map (reference class → fields): see ``REFINE_NEW_VARIANTS``.
    ``disp_in_channels``: 1 for raw disparity maps, >1 when fed disparity
    *features* (the New5/9/12 variants take 48-ch inputs).
    """

    enc_ch: int = 16                    # input encoder width (16/32/48)
    combine: str = "concat"             # concat | sum
    input_attention: bool = False       # SE gates on disp + sem inputs (New9/12)
    sem_head_full_res: bool = True      # False: sem head taps at 1/4 (New4/5/9/12)
    second_pass: bool = False           # extra deformable U-net pass (New10)
    disp_in_channels: int = 1
    sem_channels: int = 128
    # New5/New9/New12 comment out the entire residual+relu+scale epilogue
    # (reference refinement.py:752-757, 858-862, 1085-1089) and return the
    # raw learned map; we keep the (B, H, W) contract (the reference leaves
    # theirs un-squeezed at [B, 1, H, W], which no caller normalizes)
    raw_disp_head: bool = False
    dtype: Dtype = jnp.float32

    def _se_gate(self, x: jax.Array, name: str) -> jax.Array:
        # reference ``attention``: AdaptiveAvgPool2d(1) → 1×1 conv → sigmoid
        # (refinement.py:809-814); a Dense over pooled features IS that 1×1
        # conv (converter squeezes the spatial dims)
        g = jnp.mean(x, axis=(-3, -2))
        g = nn.Dense(x.shape[-1], dtype=self.dtype, name=name)(g)
        return x * jax.nn.sigmoid(g)[:, None, None, :]

    @nn.compact
    def __call__(self, low_disp: jax.Array, left: jax.Array,
                 left_sem: jax.Array, train: bool):
        from ..ops.input_pipeline import image_hw

        dt = self.dtype
        hw = image_hw(left)
        if low_disp.ndim == 3:
            low_disp = low_disp[..., None]
        scale = hw[1] / low_disp.shape[-2]

        # stem: 7×7/s2 → BN → ReLU → maxpool (refinement.py:216-220);
        # accepts NHWC or host-packed s2d input (folded kernel, same math)
        from ..ops import stem_pallas
        from ..ops.input_pipeline import is_s2d_image
        from .blocks import max_pool_3x3_s2

        stem = _ImageStem7x7(dtype=dt, name="conv0")
        bn0 = batch_norm(dt, name="bn0")
        use_fused_stem = (not train and not self.is_initializing()
                          and is_s2d_image(left) and stem_pallas.supports(left)
                          and (jax.default_backend() not in ("cpu",)
                               or os.environ.get("DCSS_STEM_INTERPRET")))
        if use_fused_stem:
            sc, bi, mu, var = bn0(features=64)
            inv = jax.lax.rsqrt(var + 1e-5)
            f = stem(left, fused_bn=(sc * inv, bi - mu * sc * inv))
        else:
            f = stem(left)
            f = bn0(f, use_running_average=not train)
            f = max_pool_3x3_s2(nn.relu(f))

        sem_in = left_sem.astype(dt)
        disp_in = low_disp.astype(dt)
        if self.input_attention:  # New9/12: gate raw inputs first
            sem_in = self._se_gate(sem_in, "sem_att")
            disp_in = self._se_gate(disp_in, "disp_att")

        e1 = _ConvBNLRelu(self.enc_ch, dtype=dt, name="enc_img")(f, train)
        e2 = _ConvBNLRelu(self.enc_ch, dtype=dt, name="enc_disp")(disp_in, train)
        e3 = _ConvBNLRelu(self.enc_ch, dtype=dt, name="enc_sem")(sem_in, train)
        if self.combine == "concat":
            x = jnp.concatenate([e1, e2, e3], axis=-1)
        else:
            x = e1 + e2 + e3
        x = _BasicConv(32, dtype=dt, name="conv_start")(x, train)

        rem0 = x
        x = _BasicConv(48, stride=2, dtype=dt, name="conv1a")(x, train); rem1 = x
        x = _BasicConv(64, stride=2, dtype=dt, name="conv2a")(x, train); rem2 = x
        x = _BasicConv(96, stride=2, dtype=dt, name="conv3a")(x, train); rem3 = x
        x = _BasicConv(128, stride=2, dtype=dt, name="conv4a")(x, train); rem4 = x
        x = _Conv2x(96, deconv=True, dtype=dt, name="deconv4a")(x, rem3, train); rem3 = x
        x = _Conv2x(64, deconv=True, dtype=dt, name="deconv3a")(x, rem2, train); rem2 = x
        x = _Conv2x(48, deconv=True, dtype=dt, name="deconv2a")(x, rem1, train); rem1 = x
        x = _Conv2x(32, deconv=True, dtype=dt, name="deconv1a")(x, rem0, train); rem0 = x

        if self.second_pass:  # New10: b-pass with deformable top levels
            x = _Conv2x(48, dtype=dt, name="conv1b")(x, rem1, train); rem1 = x
            x = _Conv2x(64, dtype=dt, name="conv2b")(x, rem2, train); rem2 = x
            x = _Conv2x(96, mdconv=True, dtype=dt, name="conv3b")(x, rem3, train); rem3 = x
            x = _Conv2x(128, mdconv=True, dtype=dt, name="conv4b")(x, rem4, train)
            x = _Conv2x(96, deconv=True, dtype=dt, name="deconv4b")(x, rem3, train)
            x = _Conv2x(64, deconv=True, dtype=dt, name="deconv3b")(x, rem2, train)
            x = _Conv2x(48, deconv=True, dtype=dt, name="deconv2b")(x, rem1, train)
            x = _Conv2x(32, deconv=True, dtype=dt, name="deconv1b")(x, rem0, train)

        # plain ×2 transposed convs, NO bn/relu (the heads' deconv1/deconv2
        # are bare ConvTranspose2d(32, 32, 4, 2, 1), refinement.py:336-345)
        def _make_deconv(name):
            return nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME",
                                    use_bias=False, dtype=dt,
                                    param_dtype=jnp.float32, name=name)

        # semantic head (full-res variants deconv twice first, New1 style)
        if self.sem_head_full_res:
            s = _make_deconv("deconv1_sem")(x)
            s = _make_deconv("deconv2_sem")(s)
        else:
            s = x
        sem = conv_kxk(self.sem_channels, 3, bias=True, dtype=dt,
                       name="final_sem")(s).astype(jnp.float32)

        # disparity head: ×2 deconv twice → Δ + upsampled low disp. The three
        # ops are LINEAR (bare deconvs, then a biased 3×3 conv), so at eval
        # the whole ×4-upsampling chain collapses into one 3×3 16-phase conv
        # at 1/4 resolution + a depth-to-space — the full-res 32-channel
        # intermediates never exist (12.0 → 5.5 ms at 2048×1024 batch 2,
        # exact incl. borders; see _composed_disp_head)
        d1, d2m = _make_deconv("deconv1"), _make_deconv("deconv2")
        fdisp = conv_kxk(1, 3, bias=True, dtype=dt, name="final_disp")

        def disp_chain(v):
            return fdisp(d2m(d1(v)))

        if (not train and not self.is_initializing()
                and x.shape[1] >= 16 and x.shape[2] >= 16):
            delta = _composed_disp_head(disp_chain, x)
        else:
            delta = disp_chain(x)
        if self.raw_disp_head:
            return delta.astype(jnp.float32)[..., 0], sem
        base = resize_bilinear(low_disp[..., :1].astype(jnp.float32), hw)
        disp = nn.relu(delta.astype(jnp.float32) + base)[..., 0] * scale
        return disp, sem


# reference class → SemRefine configuration (refinement.py:207-1093).
# New2 (ECA/key-conv attention) and New3 (Nystrom attention on sem features)
# keep the skeleton; their attention flavor maps onto input_attention here
# (channel gating) — the Nystromformer dependency is external to the
# reference too (unvendored import) and is intentionally not replicated.
REFINE_NEW_VARIANTS: Dict[str, Dict] = {
    "disp_sem": dict(enc_ch=16, combine="concat", sem_head_full_res=False),
    "new1": dict(enc_ch=16, combine="concat", sem_head_full_res=True),
    "new2": dict(enc_ch=16, combine="concat", sem_head_full_res=True,
                 input_attention=True),
    "new3": dict(enc_ch=16, combine="concat", sem_head_full_res=True,
                 input_attention=True),
    "new4": dict(enc_ch=16, combine="sum", sem_head_full_res=False),
    "new5": dict(enc_ch=48, combine="concat", sem_head_full_res=False,
                 disp_in_channels=48, raw_disp_head=True),
    "new9": dict(enc_ch=48, combine="sum", sem_head_full_res=False,
                 input_attention=True, disp_in_channels=48,
                 raw_disp_head=True),
    "new10": dict(enc_ch=32, combine="sum", sem_head_full_res=False,
                  second_pass=True),
    "new12": dict(enc_ch=48, combine="concat", sem_head_full_res=False,
                  input_attention=True, disp_in_channels=48,
                  raw_disp_head=True),
}


def make_refinement(kind: str, dtype: Dtype = jnp.float32, **kw) -> nn.Module:
    """Factory over the full reference refinement surface."""
    if kind == "stereonet":
        from .stereo import StereoNetRefinement

        return StereoNetRefinement(dtype=dtype, **kw)
    if kind == "stereodrnet":
        return StereoDRNetRefinement(dtype=dtype, **kw)
    if kind == "hourglass":
        return HourglassRefinement(dtype=dtype, **kw)
    if kind in REFINE_NEW_VARIANTS:
        return SemRefine(dtype=dtype, **{**REFINE_NEW_VARIANTS[kind], **kw})
    raise NotImplementedError(f"refinement {kind}")


def make_aggregation(kind: str, max_disp: int, dtype: Dtype = jnp.float32,
                     **kw) -> nn.Module:
    """Factory over the aggregation family (reference ``aggregation.py``;
    'adaptive' lives in ``models/stereo.py``)."""
    if kind == "stereonet":
        return StereoNetAggregation(dtype=dtype, **kw)
    if kind == "psmnet_basic":
        return PSMNetBasicAggregation(dtype=dtype, **kw)
    if kind == "psmnet_hg":
        return PSMNetHGAggregation(dtype=dtype, **kw)
    if kind == "gcnet":
        return GCNetAggregation(dtype=dtype, **kw)
    if kind == "adaptive":
        from .stereo import AdaptiveAggregation

        return AdaptiveAggregation(dtype=dtype, **kw)
    raise NotImplementedError(f"aggregation {kind}")
