"""Modulated deformable convolution, TPU-native.

Replaces the reference's 1.7K-line CUDA extension
(``network/deform_conv_torch1.10/src/*.cu``, dispatcher
``deform_conv_ext.cpp:12-164``) with the formulation SURVEY.md §2.5
prescribes: sampling coordinates = base grid + learned offsets, bilinear
gather into an im2col buffer, then one MXU matmul with the filter. The
backward pass falls out of autodiff — a gather's VJP is exactly the
``col2im`` scatter-add the CUDA code hand-writes, and the coordinate
gradient (``col2im_coord``) is the derivative of the bilinear weights.

Semantics match torch deform conv v2 (Zhu et al.): zero padding outside the
input, per-deformable-group offsets/masks, channel layout
offset[..., g, k, (y, x)] / mask[..., g, k].
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _bilinear_gather(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample x (B, H, W, C) at fractional (ys, xs) of shape (B, P) each →
    (B, P, C), zero outside the image (deformable-im2col border rule)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    x_flat = x.reshape(b, h * w, c)

    out = 0.0
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yy = y0 + dy
        xx = x0 + dx
        weight = ((1 - wy) if dy == 0 else wy) * ((1 - wx) if dx == 0 else wx)
        valid = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        idx = (jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)).astype(jnp.int32)
        vals = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
        out = out + jnp.where(valid[..., None], weight[..., None] * vals, 0.0)
    return out


def modulated_deform_conv(
    x: jax.Array,             # (B, H, W, Cin)
    offset: jax.Array,        # (B, Ho, Wo, G*K*2), layout [g, k, (y, x)]
    mask: Optional[jax.Array],  # (B, Ho, Wo, G*K) or None (plain deform conv)
    kernel: jax.Array,        # (kh, kw, Cin, Cout)
    bias: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
) -> jax.Array:
    """Deformable conv v2 forward (v1 when mask is None)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    k = kh * kw
    g = deform_groups
    cg = cin // g

    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    p = ho * wo

    # base sampling grid per output pixel and tap
    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ty = jnp.arange(kh) * dilation
    tx = jnp.arange(kw) * dilation
    base_y = (oy[:, None, None, None] + ty[None, None, :, None])   # (Ho,1,kh,1)
    base_x = (ox[None, :, None, None] + tx[None, None, None, :])   # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(p, k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(p, k)

    off = offset.reshape(b, p, g, k, 2)
    ys = base_y[None, :, None, :] + off[..., 0]                     # (B,P,G,K)
    xs = base_x[None, :, None, :] + off[..., 1]

    cols = []
    for gi in range(g):  # deform groups are few (reference uses 2)
        xg = x[..., gi * cg:(gi + 1) * cg]
        sampled = _bilinear_gather(
            xg, ys[:, :, gi, :].reshape(b, p * k), xs[:, :, gi, :].reshape(b, p * k))
        cols.append(sampled.reshape(b, p, k, cg))
    # group gi owns channels [gi*cg:(gi+1)*cg], each sampled with its own
    # coordinates — concat restores the full Cin order
    col = cols[0] if g == 1 else jnp.concatenate(cols, axis=-1)     # (B,P,K,Cin)

    if mask is not None:
        m = mask.reshape(b, p, g, k)
        if g == 1:
            m = m[:, :, 0, :, None]                                 # (B,P,K,1)
        else:
            # (B,P,K,G) → per-group mask repeated over its cg channels
            m = jnp.repeat(m.transpose(0, 1, 3, 2), cg, axis=3)     # (B,P,K,Cin)
        col = col * m

    # im2col (B, P, K*Cin) @ W (K*Cin, Cout) on the MXU
    lhs = col.reshape(b, p, k * cin)
    rhs = kernel.reshape(k * cin, cout)
    out = jnp.einsum("bpi,io->bpo", lhs, rhs,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out.reshape(b, ho, wo, cout)


class DeformConv2d(nn.Module):
    """Offset(+mask) conv (zero-init → starts as a regular conv) feeding the
    modulated deformable conv, incl. the reference's ``double_mask`` trick
    (sigmoid × 2 so the mask initializes to 1) — ``network/deform.py:17-91``."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 2
    dilation: int = 2
    deformable_groups: int = 2
    modulation: bool = True
    double_mask: bool = True
    bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks, g = self.kernel_size, self.deformable_groups
        k = ks * ks
        n_off = g * k * (3 if self.modulation else 2)
        p = self.padding
        offset_mask = nn.Conv(
            n_off, (ks, ks), strides=(self.stride,) * 2,
            padding=[(p, p), (p, p)], kernel_dilation=(self.dilation,) * 2,
            feature_group_count=g, use_bias=True,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="offset_conv")(x)

        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (ks, ks, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
                if self.bias else None)

        if self.modulation:
            off_ch = g * k * 2
            # grouped offset conv emits [g, (offsets then masks)] per group
            om = offset_mask.reshape(*offset_mask.shape[:-1], g, 3 * k)
            offset = om[..., : 2 * k].reshape(*offset_mask.shape[:-1], g * k * 2)
            mask = jax.nn.sigmoid(om[..., 2 * k:]).reshape(
                *offset_mask.shape[:-1], g * k)
            if self.double_mask:
                mask = mask * 2.0  # initializes to 1 → regular conv (deform.py:85-88)
        else:
            offset = offset_mask
            mask = None

        return modulated_deform_conv(
            x.astype(self.dtype), offset.astype(jnp.float32),
            None if mask is None else mask.astype(self.dtype),
            kernel.astype(self.dtype), bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            deform_groups=g)
