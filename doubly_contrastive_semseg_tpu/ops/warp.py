"""Disparity warping (reference ``network/warp.py:5-64``): sample the right
image at x - d to reconstruct the left view. The reference builds a
normalized meshgrid for ``F.grid_sample``; on TPU the horizontal-only warp is
a 1-D bilinear blend of two statically-gathered columns — no grid machinery.
Returns (warped, valid_mask) like the reference."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def disp_warp(right: jax.Array, disp: jax.Array,
              padding_mode: str = "zeros") -> Tuple[jax.Array, jax.Array]:
    """right (B, H, W, C), disp (B, H, W) ≥ 0 → left-view reconstruction."""
    b, h, w, c = right.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] - disp  # sample col
    x0 = jnp.floor(xs)
    frac = xs - x0
    inside = (xs >= 0) & (xs <= w - 1)

    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    # gather along width for every (b, h): take_along_axis over axis 2
    v0 = jnp.take_along_axis(right, x0c[..., None], axis=2)
    v1 = jnp.take_along_axis(right, x1c[..., None], axis=2)
    warped = (1.0 - frac)[..., None] * v0 + frac[..., None] * v1
    mask = inside[..., None].astype(right.dtype)
    if padding_mode == "zeros":
        warped = warped * mask
    return warped, jnp.broadcast_to(mask, warped.shape)
