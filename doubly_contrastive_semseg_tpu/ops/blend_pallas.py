"""Fused UpsampleBlend Pallas kernel (inference path).

Computes ``conv3×3(relu(BN_eval(up2(x) + skip)))`` — one SwiftNet decoder
step (``models/blocks.py::UpsampleBlend``, reference
``network/utils.py:79-102``) — without materializing the upsampled tensor or
the pre-conv activation in HBM. NHWC decoder activations keep channels on the
lane axis, so the 3×3 contraction runs as 9 accumulated (N,128)·(128,128)
MXU dots over sublane/major-shifted views of the fused tile.

Layout rules baked in (same family as the retired Pallas stem):
- DMA row windows must be sublane-aligned → tiles are 8 output rows reading
  aligned (tile+8)-row skip slabs and (tile/2+8)-row x slabs of top-padded
  copies;
- W-halo columns ride inside the slab (skip/x are width-padded by 1 left,
  lane dim is channels so width is a *sublane* dim — offsets allowed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def blend_kernel_supported(out_h: int, w: int, c: int) -> bool:
    return out_h % 8 == 0 and c % 128 == 0 and w % 8 == 0


def _kernel(x_hbm, skip_hbm, w_ref, ab_ref, out_ref, xs_scr, sk_scr, sems,
            *, tile: int, w: int, c: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # exact halo'd slabs: skip rows [i·t − 1, i·t + t + 1) live at rows
    # [i·t, i·t + t + 2) of the 1-top-padded copy; x rows [i·t/2 − 1, …)
    # likewise. bf16 end-to-end — the XLA decoder step computes in bf16 too.
    cp1 = pltpu.make_async_copy(
        skip_hbm.at[b, pl.ds(i * tile, tile + 2)], sk_scr, sems.at[0])
    cp2 = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * (tile // 2), tile // 2 + 2)], xs_scr, sems.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    xs = xs_scr[:]                            # (t/2+2, w/2+2+pad, C) bf16
    sk = sk_scr[:]                            # (t+2, w+2+pad, C) bf16

    # ×2 bilinear phases (align_corners=False): out 2k = ¼x[k−1]+¾x[k],
    # out 2k+1 = ¾x[k]+¼x[k+1]. The slab's row s holds x row i·t/2−1+s, so
    # with A = slab[j], B = slab[j+1] the halo'd out rows [i·t−1, i·t+t+1)
    # interleave as pairs (odd_j = ¾A+¼B → out i·t−1+2j,
    # even_{j+1} = ¼A+¾B → out i·t+2j) for j ∈ [0, t/2].
    half = tile // 2 + 1
    a_r = xs[0:half, :, :]
    b_r = xs[1:half + 1, :, :]
    odd = 0.75 * a_r + 0.25 * b_r
    even = 0.25 * a_r + 0.75 * b_r
    uph = jnp.stack([odd, even], axis=1).reshape(2 * half, xs.shape[1], c)
    # same construction over W: padded-x col q = x col q−1, out cols [−1, w+1)
    a_c = uph[:, 0:w // 2 + 1, :]
    b_c = uph[:, 1:w // 2 + 2, :]
    oddc = 0.75 * a_c + 0.25 * b_c
    evenc = 0.25 * a_c + 0.75 * b_c
    up = jnp.stack([oddc, evenc], axis=2).reshape(2 * half, w + 2, c)

    pre = up[0:tile + 2, :, :] + sk[0:tile + 2, 0:w + 2, :]
    act = jnp.maximum(pre.astype(jnp.float32) * ab_ref[0, :] + ab_ref[1, :], 0.0)

    # conv zero-padding semantics: the activation outside the image is zero,
    # but up() carries edge-clamped values there — mask the frame
    n_tiles = pl.num_programs(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile + 2, w + 2, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile + 2, w + 2, 1), 1)
    top_bad = (row_ids == 0) & (i == 0)
    bot_bad = (row_ids == tile + 1) & (i == n_tiles - 1)
    side_bad = (col_ids == 0) | (col_ids == w + 1)
    act = jnp.where(top_bad | bot_bad | side_bad, 0.0, act).astype(jnp.bfloat16)

    # 3×3 conv as 9 accumulated K=128 dots over shifted views
    acc = None
    for ky in range(3):
        for kx in range(3):
            lhs = act[ky:ky + tile, kx:kx + w, :].reshape(tile * w, c)
            part = jax.lax.dot_general(
                lhs, w_ref[ky * 3 + kx, :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    out_ref[0, :, :, :] = acc.reshape(tile, w, c).astype(out_ref.dtype)


def fused_upsample_blend(
    x: jax.Array,        # (B, h, w/2… ) coarse input (B, H/2, W/2, C)
    skip: jax.Array,     # (B, H, W, C)
    conv_kernel: jax.Array,   # (3, 3, C, C)
    bn_scale, bn_bias, bn_mean, bn_var,
    *,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    b, hh, ww, c = skip.shape
    tile = 8  # 16 exceeds the 16 MB VMEM scoped limit at 512-wide shapes
    assert blend_kernel_supported(hh, ww, c)
    assert x.shape[1] * 2 == hh and x.shape[2] * 2 == ww

    a = (bn_scale / jnp.sqrt(bn_var + eps)).astype(jnp.float32)
    shift = (bn_bias - bn_mean * a).astype(jnp.float32)
    ab = jnp.stack([a, shift], axis=0)

    w9 = conv_kernel.astype(jnp.bfloat16).reshape(9, c, c)

    # top/left pad 1 (edge for x's bilinear clamp, zero halo for skip/conv),
    # bottom slack for aligned row reads, right pad to a 16-multiple width
    # (DMA'd widths must be sublane-aligned for bf16)
    def _wpad(width):
        return ((width + 15) // 16) * 16 - width

    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (1, 1 + _wpad(ww // 2 + 2)), (0, 0)),
                 mode="edge")
    skp = jnp.pad(skip.astype(jnp.bfloat16),
                  ((0, 0), (1, 1), (1, 1 + _wpad(ww + 2)), (0, 0)))

    kfun = functools.partial(_kernel, tile=tile, w=ww, c=c)
    out = pl.pallas_call(
        kfun,
        grid=(b, hh // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, c), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, ww, c), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile // 2 + 2, xp.shape[2], c), jnp.bfloat16),
            pltpu.VMEM((tile + 2, skp.shape[2], c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, skp, w9, ab)
    return out
