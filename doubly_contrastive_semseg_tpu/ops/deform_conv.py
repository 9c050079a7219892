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


def _hat_weights(frac: jax.Array, radius: int) -> jax.Array:
    """Per-axis bilinear weights over the integer window [-radius, radius]:
    ``w_j = relu(1 - |frac - j|)``. For ``frac = n + f`` this is ``1-f`` at
    ``j=n`` and ``f`` at ``j=n+1``, zero elsewhere — exactly the bilinear
    hat, computed densely so no gather is needed. Shape: frac (...,) →
    (..., 2*radius+1).

    The window stops at ``+radius`` (not ``+radius+1``): the caller clamps
    ``frac`` to ``[-radius, radius]``, so the ``radius+1`` tap's weight
    ``relu(1 - |frac - radius - 1|)`` is identically zero (``|·| ≥ 1``) —
    dropping it shrinks the 2-D blend from ``(2r+2)²`` to ``(2r+1)²`` terms
    (36 → 25 at the default r=2; measured 10.1 → 6.6 ms per aggregation
    deform conv) with bit-identical results."""
    taps = jnp.arange(-radius, radius + 1, dtype=frac.dtype)
    return jax.nn.relu(1.0 - jnp.abs(frac[..., None] - taps))


def modulated_deform_conv_window(
    x: jax.Array,             # (B, H, W, Cin)
    offset: jax.Array,        # (B, H, W, G*K*2), layout [g, k, (y, x)]
    mask: Optional[jax.Array],  # (B, H, W, G*K) or None
    kernel: jax.Array,        # (kh, kw, Cin, Cout)
    bias: Optional[jax.Array] = None,
    *,
    padding: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
    radius: int = 2,
) -> jax.Array:
    """Deformable conv v2 as a dense local window — the TPU-native fast path.

    The gather formulation (``modulated_deform_conv``) is exact but gathers
    are a serial slow path on TPU (measured 257 ms for one (2,256,512,48)
    deform conv — 40% of the whole StereoDCSS forward). Here the bilinear
    sample at ``base + offset`` is rewritten as a separable sum over the
    integer window ``[-radius, radius]²`` around each tap with per-axis
    hat weights (``_hat_weights``): every term is a *static* shift of ``x``
    times a per-pixel scalar field — pure VPU FMAs XLA fuses freely, then
    one MXU matmul with the filter. No gather anywhere, autodiff gives the
    backward for free.

    Deviation from the CUDA reference semantics (documented): offsets are
    clamped to ``[-radius, radius]`` pixels. Inside the clamp range results
    match ``modulated_deform_conv`` exactly (same bilinear rule, zero
    outside the image — asserted in tests); offsets that trained beyond the
    radius saturate at the window edge instead of sampling further away.
    The aggregation-network offsets this replaces are zero-initialised local
    refinements (reference ``network/deform.py:66-70``), so a few-pixel
    radius at 1/4 resolution covers the trained regime.

    Requires stride 1 (the only form the aggregation/refinement stacks use).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    k = kh * kw
    g = deform_groups
    cg = cin // g
    r = radius
    win = 2 * r + 1                     # the +r+1 tap is dead post-clamp

    if offset.shape[1] != h or offset.shape[2] != w:
        raise ValueError("window deform conv supports stride 1 only")

    # output pixel (row, col) with tap (ty, tx) samples
    #   y = row - padding + ty*dilation + oy   (same for x)
    # so relative displacement dy ∈ [tap_min - r, tap_max + r]; pad x so
    # every displacement is a static in-bounds slice. Zero-padding reproduces
    # the deformable-im2col border rule (outside the image reads 0).
    tap_lo = -padding
    tap_hi = -padding + (kh - 1) * dilation
    pad_lo = r - tap_lo                 # cover dy = tap_lo - r
    pad_hi = tap_hi + r
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))

    off = offset.reshape(b, h, w, g, k, 2)
    oy = jnp.clip(off[..., 0], -r, r)                       # (B,H,W,G,K)
    ox = jnp.clip(off[..., 1], -r, r)
    cy = _hat_weights(oy, r)                                # (B,H,W,G,K,win)
    cx = _hat_weights(ox, r)
    if mask is not None:
        m = mask.reshape(b, h, w, g, k)
        cy = cy * m[..., None]                              # fold mask into wy

    compute_dtype = x.dtype
    cy = cy.astype(compute_dtype)
    cx = cx.astype(compute_dtype)

    # accumulate per-(group, tap) matmuls instead of materializing the
    # (B, H, W, K·Cin) im2col stack (226 MB at the aggregation shapes —
    # writing + re-reading it costs more than the narrow K=cg contractions)
    k2d = kernel.reshape(k, cin, cout)
    out = jnp.zeros((b, h, w, cout), jnp.float32)
    for gi in range(g):
        xg = xp[..., gi * cg:(gi + 1) * cg]
        for kk in range(k):
            ty = tap_lo + (kk // kw) * dilation
            tx = tap_lo + (kk % kw) * dilation
            acc = jnp.zeros((b, h, w, cg), compute_dtype)
            for j in range(win):
                dy = pad_lo + ty + (j - r)
                wy = cy[:, :, :, gi, kk, j, None]
                row = jnp.zeros((b, h, w, cg), compute_dtype)
                for i in range(win):
                    dx = pad_lo + tx + (i - r)
                    wx = cx[:, :, :, gi, kk, i, None]
                    row = row + wx * xg[:, dy:dy + h, dx:dx + w, :]
                acc = acc + wy * row
            wk = k2d[kk, gi * cg:(gi + 1) * cg, :].astype(compute_dtype)
            out = out + jax.lax.dot_general(
                acc, wk, dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


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
    impl: str = "gather"   # "gather" (exact) | "window" (fast, clamped offsets)
    window_radius: int = 2
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
            # the reference splits the GROUPED conv's output globally at
            # 2/3 (deform.py:74-80): offset = first g·k·2 channels, mask =
            # the rest — which for deformable_groups>1 crosses group intent
            # (CUDA group 0's mask channels are produced by the conv's
            # group 1). Reproduced verbatim so trained reference offset
            # convs import exactly (tests/test_stereo_oracle.py).
            offset = offset_mask[..., :off_ch]
            mask = jax.nn.sigmoid(offset_mask[..., off_ch:])
            if self.double_mask:
                mask = mask * 2.0  # initializes to 1 → regular conv (deform.py:85-88)
        else:
            offset = offset_mask
            mask = None

        if self.impl == "window" and self.stride == 1:
            return modulated_deform_conv_window(
                x.astype(self.dtype), offset.astype(jnp.float32),
                None if mask is None else mask.astype(self.dtype),
                kernel.astype(self.dtype), bias,
                padding=self.padding, dilation=self.dilation,
                deform_groups=g, radius=self.window_radius)
        return modulated_deform_conv(
            x.astype(self.dtype), offset.astype(jnp.float32),
            None if mask is None else mask.astype(self.dtype),
            kernel.astype(self.dtype), bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            deform_groups=g)
