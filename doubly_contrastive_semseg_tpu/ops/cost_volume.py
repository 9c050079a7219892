"""Stereo cost volumes + soft-argmin disparity estimation.

TPU-native re-design of reference ``network/cost.py:5-76`` (CostVolume /
CostVolumePyramid) and ``network/estimation.py:6-33`` (DisparityEstimation).
The reference builds volumes with a python loop writing into a zero tensor
per disparity; here each candidate disparity is a static shift (pad + slice —
XLA turns these into cheap strided views), stacked into one tensor, so the
whole volume is a single fused kernel. NHWC layout; the volume's disparity
axis is the trailing (lane) dimension.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _shift_right_img(right: jax.Array, d: int) -> jax.Array:
    """right features shifted by disparity d (zeros where x-d < 0)."""
    if d == 0:
        return right
    pad = jnp.pad(right, ((0, 0), (0, 0), (d, 0), (0, 0)))
    return pad[:, :, : right.shape[2], :]


def correlation_cost_volume(left: jax.Array, right: jax.Array,
                            max_disp: int) -> jax.Array:
    """(B, H, W, D): mean-over-channel dot of left and d-shifted right
    (reference ``cost.py:25-35``, 'correlation').

    Two equivalent formulations, picked by shape:

    - **MXU band** (default for D ≥ 16): one per-row Gram matmul
      ``G[x, y] = ⟨left_x, right_y⟩`` (a single big ``dot_general`` the MXU
      loves) followed by band extraction ``out[x, d] = G[x, x−d]`` expressed
      as the flat-reshape diagonal trick — reverse both axes, pad one
      element per row, reshape (W, W) → (W, W+1): row i of the new view IS
      diagonal i (flat index algebra: ``i·(W+1)+j = i·W + (i+j)``). No
      gather, no per-d slices; computes W/D× extra FLOPs but on the MXU at
      ~25× the VPU formulation's effective rate (measured 6.7 → ~1.5 ms at
      (2, 256, 512, 128), D=48).
    - **shift-and-reduce** (small D): per-d static shifts, elementwise
      mult + channel mean, one fused VPU kernel.
    """
    b, h, w, c = left.shape
    d = max_disp
    if d < 16 or d > w:
        slices = [jnp.mean(left * _shift_right_img(right, dd), axis=-1)
                  for dd in range(d)]
        return jnp.stack(slices, axis=-1)

    # G[b,h,x,y] = mean_c L·R — accumulate in f32 on the MXU
    g = jax.lax.dot_general(
        left, right,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) / c          # (B, H, W, W)
    # out[x, d] = G[x, x−d]; with both axes reversed the wanted band is the
    # upper diagonals: G[x, x−d] = Grev[x', x'+d] at x' = W−1−x
    grev = g[..., ::-1, ::-1]
    flat = grev.reshape(b, h, w * w)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, w)))
    band = flat.reshape(b, h, w, w + 1)[..., :d]          # Grev[x', x'+d]
    band = band[..., ::-1, :]                             # back to x order
    # x − d < 0 samples the zero-padded right image in the reference → 0
    x_idx = jnp.arange(w, dtype=jnp.int32)[:, None]
    d_idx = jnp.arange(d, dtype=jnp.int32)[None, :]
    out = jnp.where(d_idx <= x_idx, band, 0.0)
    return out.astype(left.dtype)


def difference_cost_volume(left: jax.Array, right: jax.Array,
                           max_disp: int) -> jax.Array:
    """(B, H, W, D, C): left - shifted right (reference 'difference')."""
    slices = [left - _shift_right_img(right, d) for d in range(max_disp)]
    return jnp.stack(slices, axis=-2)


def concat_cost_volume(left: jax.Array, right: jax.Array,
                       max_disp: int) -> jax.Array:
    """(B, H, W, D, 2C): concat(left, shifted right) (reference 'concat')."""
    slices = [jnp.concatenate([left, _shift_right_img(right, d)], axis=-1)
              for d in range(max_disp)]
    return jnp.stack(slices, axis=-2)


def cost_volume(left: jax.Array, right: jax.Array, max_disp: int,
                feature_similarity: str = "correlation") -> jax.Array:
    if feature_similarity == "correlation":
        return correlation_cost_volume(left, right, max_disp)
    if feature_similarity == "difference":
        return difference_cost_volume(left, right, max_disp)
    if feature_similarity == "concat":
        return concat_cost_volume(left, right, max_disp)
    raise NotImplementedError(feature_similarity)


def cost_volume_pyramid(left_feats: Sequence[jax.Array],
                        right_feats: Sequence[jax.Array],
                        max_disp: int,
                        feature_similarity: str = "correlation") -> List[jax.Array]:
    """Per-scale volumes with disparity range scaled by resolution
    (reference ``CostVolumePyramid``, ``cost.py:55-76``)."""
    out = []
    for i, (lf, rf) in enumerate(zip(left_feats, right_feats)):
        d = max_disp // (2 ** i)
        out.append(cost_volume(lf, rf, d, feature_similarity))
    return out


def soft_argmin_disparity(cost: jax.Array, match_similarity: bool = True) -> jax.Array:
    """Expected disparity under softmax(cost) (reference
    ``estimation.py:6-33``): similarity volumes softmax as-is, matching-cost
    volumes are negated first."""
    logits = cost if match_similarity else -cost
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    d = jnp.arange(cost.shape[-1], dtype=jnp.float32)
    return jnp.sum(prob * d, axis=-1)
