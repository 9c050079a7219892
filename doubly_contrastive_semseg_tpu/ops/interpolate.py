"""Resize primitives matching the reference's interpolation semantics, TPU-first.

The reference leans on three torch resize flavours:

- bilinear, ``align_corners=False`` (``network/utils.py:8`` — the in-model
  upsample used by every decoder);
- nearest with *asymmetric* index mapping ``src = floor(dst * in/out)``
  (label downsampling in ``utils/loss.py:401``);
- bicubic (``pyramid_subsample`` in ``network/backbone/resnet_pyramid.py:313``,
  torch's Keys kernel with a = -0.75).

On TPU, gather-based resampling is slow; for the power-of-two scale factors the
model actually uses, every one of these is a *fixed small stencil*, so we
lower them to elementwise blends / strided depthwise convolutions that XLA can
fuse. General sizes fall back to ``jax.image.resize``.

All functions take NHWC (or NHW) arrays.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_2x(out_size: Tuple[int, int], in_size: Tuple[int, int]) -> bool:
    return out_size[0] == 2 * in_size[0] and out_size[1] == 2 * in_size[1]


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers (torch ``align_corners=False``).

    Equivalent to ``F.interpolate(x, size, mode='bilinear',
    align_corners=False)`` (reference ``network/utils.py:8``). Integer upsample
    factors (the decoder ladder's ×2 and the final ×4 to input resolution)
    lower to per-phase 2-tap blends + interleave — pure VPU work XLA fuses,
    no gathers; everything else goes through ``jax.image.resize`` (same
    half-pixel convention, antialias off — we only ever upsample here).
    """
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == tuple(size):
        return x
    if size[0] % h == 0 and size[1] % w == 0:
        return upsample_nx_bilinear(x, size[0] // h, size[1] // w)
    out_shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)


def upsample_nx_bilinear(x: jax.Array, ny: int, nx_: int) -> jax.Array:
    """Integer-factor bilinear upsample (align_corners=False) as static phase
    blends: output ``N·k + r`` reads source ``k + (r+0.5)/N − 0.5``, i.e. each
    of the N phases is a fixed 2-tap blend of adjacent source pixels."""

    def up_axis(v: jax.Array, axis: int, n: int) -> jax.Array:
        if n == 1:
            return v
        pad = [(0, 0)] * v.ndim
        pad[axis] = (1, 1)
        vp = jnp.pad(v, pad, mode="edge")
        m = v.shape[axis]
        prev = jax.lax.slice_in_dim(vp, 0, m, axis=axis)
        cur = jax.lax.slice_in_dim(vp, 1, m + 1, axis=axis)
        nxt = jax.lax.slice_in_dim(vp, 2, m + 2, axis=axis)
        phases = []
        for r in range(n):
            off = (r + 0.5) / n - 0.5
            if off < 0:
                phases.append((-off) * prev + (1.0 + off) * cur)
            else:
                phases.append((1.0 - off) * cur + off * nxt)
        stacked = jnp.stack(phases, axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = n * m
        return stacked.reshape(new_shape)

    x = up_axis(x, x.ndim - 3, ny)
    x = up_axis(x, x.ndim - 2, nx_)
    return x


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """×2 bilinear upsample (phase blends; see ``upsample_nx_bilinear``)."""
    return upsample_nx_bilinear(x, 2, 2)


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest resize with torch's asymmetric mapping ``src = floor(dst*in/out)``.

    Matches ``F.interpolate(mode='nearest')`` used to downsample label maps for
    the pixel-contrast loss (reference ``utils/loss.py:400-402``). Note this is
    NOT the half-pixel 'nearest' of ``jax.image.resize``.

    Works on (..., H, W) arrays (no channel dim needed) and on NHWC.
    """
    # 4-d arrays are NHWC; anything else treats the last two dims as (H, W)
    if x.ndim == 4:
        h_ax, w_ax = 1, 2
    else:
        h_ax, w_ax = x.ndim - 2, x.ndim - 1
    in_h, in_w = x.shape[h_ax], x.shape[w_ax]
    out_h, out_w = size
    rows = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    x = jnp.take(x, rows, axis=h_ax)
    x = jnp.take(x, cols, axis=w_ax)
    return x


# Keys cubic kernel with a = -0.75 (torch's bicubic), sampled at the fixed
# half-pixel offsets of an exact /2 downsample: source coord of output i is
# 2i + 0.5, so taps sit at distances (1.5, 0.5, 0.5, 1.5) from input centers.
_BICUBIC2X_TAPS = np.array([-0.09375, 0.59375, 0.59375, -0.09375], dtype=np.float32)


def downsample2x_bicubic(x: jax.Array) -> jax.Array:
    """Exact /2 bicubic downsample (torch kernel a=-0.75, align_corners=False).

    Matches ``F.interpolate(img, scale_factor=0.5, mode='bicubic')`` used to
    build the SwiftNet input pyramid (reference
    ``network/backbone/resnet_pyramid.py:313``) — as a separable 4-tap
    stride-2 depthwise convolution with edge-replicated borders, which XLA
    maps straight onto the conv units instead of emitting gathers.
    """
    dtype = x.dtype
    c = x.shape[-1]
    taps = jnp.asarray(_BICUBIC2X_TAPS, dtype=dtype)

    def conv_axis(v: jax.Array, axis_is_h: bool) -> jax.Array:
        pad = [(0, 0), (0, 0), (0, 0), (0, 0)]
        pad[1 if axis_is_h else 2] = (1, 1)
        vp = jnp.pad(v, pad, mode="edge")
        if axis_is_h:
            kernel = taps.reshape(4, 1, 1, 1)
            window_strides = (2, 1)
        else:
            kernel = taps.reshape(1, 4, 1, 1)
            window_strides = (1, 2)
        kernel = jnp.broadcast_to(kernel, kernel.shape[:2] + (1, c))
        return jax.lax.conv_general_dilated(
            vp,
            kernel,
            window_strides=window_strides,
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    squeeze = False
    if x.ndim == 3:
        x = x[None]
        squeeze = True
    y = conv_axis(x, True)
    y = conv_axis(y, False)
    return (y[0] if squeeze else y).astype(dtype)


def downsample_bicubic_direct(x: jax.Array, level: int) -> jax.Array:
    """Exact ``F.interpolate(x, scale_factor=2^-level, mode='bicubic')``:
    4-tap point-sampled cubic at stride 2^level, taps at source rows
    ``2^L·p + 2^{L-1} − 2 + e`` (torch's half-pixel mapping; verified
    tap-for-tap in tests). Only level 1 ever reads out of bounds (row −1 /
    row H), where torch clamps — levels ≥ 2 need no padding at all."""
    if level == 0:
        return x
    if level == 1:
        return downsample2x_bicubic(x)
    dtype = x.dtype
    c = x.shape[-1]
    s = 2 ** level
    off = 2 ** (level - 1) - 2
    n_h, n_w = x.shape[1], x.shape[2]
    taps = jnp.asarray(_BICUBIC2X_TAPS, dtype=dtype)

    def conv_axis(v, axis_is_h):
        n = n_h if axis_is_h else n_w
        p_l = -off
        p_r = (s * (n // s - 1) + off + 4) - n
        if axis_is_h:
            kernel = taps.reshape(4, 1, 1, 1)
            strides, padding = (s, 1), [(p_l, p_r), (0, 0)]
        else:
            kernel = taps.reshape(1, 4, 1, 1)
            strides, padding = (1, s), [(0, 0), (p_l, p_r)]
        kernel = jnp.broadcast_to(kernel, kernel.shape[:2] + (1, c))
        return jax.lax.conv_general_dilated(
            v, kernel, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    y = conv_axis(conv_axis(x, True), False)
    return (y[0] if squeeze else y).astype(dtype)


def pyramid_subsample(x: jax.Array, levels: int) -> Sequence[jax.Array]:
    """Input pyramid [x, x/2, x/4, ...], each level computed DIRECTLY from
    the full image exactly as the reference does
    (``resnet_pyramid.py:306-314``: ``F.interpolate(image, 1/2^l)``) — a
    repeated-/2 chain differs from level 2 on (wider effective kernel) and
    breaks checkpoint-import parity. Set ``levels=3`` for SwiftNet."""
    return [downsample_bicubic_direct(x, l) for l in range(levels)]


def adaptive_avg_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch ``adaptive_avg_pool2d`` on NHWC.

    Used by SwiftNet SPP grids (reference ``network/utils.py:146``). torch
    pools window ``[floor(i*H/o), ceil((i+1)*H/o))``; when ``H % o == 0`` this
    is a plain strided average pool, which is all the SPP grids need in
    practice — the general case falls back to the exact (unequal-window)
    computation.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(-3, -2), keepdims=True)
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        xr = x.reshape(x.shape[:-3] + (oh, kh, ow, kw, x.shape[-1]))
        return xr.mean(axis=(-4, -2))
    # exact adaptive pooling with unequal windows (rare path, small grids)
    row_starts = [int(np.floor(i * h / oh)) for i in range(oh)]
    row_ends = [int(np.ceil((i + 1) * h / oh)) for i in range(oh)]
    col_starts = [int(np.floor(j * w / ow)) for j in range(ow)]
    col_ends = [int(np.ceil((j + 1) * w / ow)) for j in range(ow)]
    rows = []
    for i in range(oh):
        cols = []
        band = jax.lax.slice_in_dim(x, row_starts[i], row_ends[i], axis=x.ndim - 3)
        for j in range(ow):
            cell = jax.lax.slice_in_dim(band, col_starts[j], col_ends[j], axis=x.ndim - 2)
            cols.append(cell.mean(axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)
