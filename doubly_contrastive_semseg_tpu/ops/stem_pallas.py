"""Fused ResNet stem — Pallas TPU kernel: s2d conv + BN + ReLU + maxpool.

The serving stem (reference ``resnet_pyramid.py:139`` conv7x7/s2 + BN + ReLU
+ maxpool3x3/s2, here already s2d-collapsed to a 4x4/s1 conv over 12
channels — ``ops/input_pipeline.py::stem_s2d_kernel_from_dense``) is the
single most expensive XLA segment at 2048x1024 serving: the 12->64-channel
conv cannot fill the MXU and XLA materializes the 536 MB pre-pool tensor to
HBM only for the pool to re-read it. This kernel computes the conv as clean
K=128 MXU matmuls and emits the POOLED output directly from registers, so
the pre-pool tensor never exists.

Formulation (v4 "row-quad" — the first of five measured variants to beat
XLA; see TODO.md for the losers):
- Fold W by 2 (free row-major reshape): input (H2, W2, 12) -> (H2, W2/2, 24),
  zero-padded to 32 channels for aligned lane groups.
- Per 68-row input block, build a row-quad scratch Q[c, w, 32r+ch] =
  x[c+r, w, ch] with FOUR bulk stores (per-piece assembly of an im2col
  matrix loses: 32-lane-offset register concats crash this Mosaic stack
  outright, and per-row scratch stores measured 11.5 ms vs XLA 9.4).
- One conv output row (both W-phases) = sum over 3 folded-column shifts s of
  Q[c, s:s+wf] @ W[128s:128s+128] — three (wf, 128) x (128, 128) MXU dots,
  output lanes [phase0 c0..63 | phase1 c0..63]. K-lane order 128s + 32ty +
  12*parity + c, where conv output real col 2j+ph tap tx reads folded col
  j+s-1 at parity (ph+tx)%2, s = (ph-2+tx)//2 + 1.
- The 3x3/s2 maxpool separates: W direction = max(ph0[j], ph1[j], ph1[j-1])
  — two lane-half slices plus a ``pltpu.roll`` (a sublane-shift CONCAT also
  crashes Mosaic; roll + iota mask lowers); H direction = rolling max over
  3 conv rows emitted at stride 2 by the row loop. Post-ReLU values are
  >= 0 so the pool's -inf padding is equivalently a 0-fill.
- Grid cell = (batch, row-block): 32 pooled rows from 65 conv rows out of a
  68-row input block; the 8.5%-overlap blocks are pre-gathered host-side
  (one fused XLA slice+stack) so BlockSpecs stay non-overlapping. The top
  block's phantom conv row -1 is masked (pool padding).

Measured at L0 serving shape (8, 512, 1024, 12) bf16 on v5e, isolated with
the bench fence protocol: XLA conv+bn+relu+pool 9.4 ms, this kernel 6.5 ms
(1.45x). End-to-end serving numbers in TODO.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P = 32  # pooled rows per grid cell


def _w384_from_stem(kernel: jax.Array) -> jax.Array:
    """(4, 4, 12, 64) s2d stem kernel -> (384, 128) row-quad weights.

    K lanes: 128*s + 32*ty + 12*parity + c ; out lanes: 64*ph + o."""
    w = jnp.zeros((384, 128), kernel.dtype)
    for ty in range(4):
        for tx in range(4):
            for ph in range(2):
                s = (ph - 2 + tx) // 2 + 1
                par = (ph + tx) % 2
                base = 128 * s + 32 * ty + 12 * par
                w = w.at[base:base + 12, 64 * ph:64 * ph + 64].add(
                    kernel[ty, tx])
    return w


def _stem_kernel(x_ref, w_ref, sb_ref, out_ref, q_scr, *, wf: int,
                 r_blocks: int):
    """One (batch, row-block) cell: 65 conv rows -> 32 pooled rows."""
    is_top = (pl.program_id(0) % r_blocks) == 0

    # row-quad build: Q[c, w, 32r+ch] = x[c+r, w, ch] — 4 bulk stores
    for r in range(4):
        q_scr[:, :, 32 * r:32 * r + 32] = x_ref[0, r:r + 65, :, :]

    def convw(k):
        row = None
        for s in range(3):
            d = jax.lax.dot_general(
                q_scr[k, s:s + wf, :], w_ref[128 * s:128 * s + 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = d if row is None else row + d
        row = jnp.maximum(row * sb_ref[0] + sb_ref[1], 0.0)
        # W-direction pool: pooled col j = max(ph0[j], ph1[j], ph1[j-1])
        ph0, ph1 = row[:, :64], row[:, 64:]
        rolled = pltpu.roll(ph1, shift=1, axis=0)
        rix = jax.lax.broadcasted_iota(jnp.int32, ph1.shape, 0)
        ph1s = jnp.where(rix == 0, 0.0, rolled)
        return jnp.maximum(jnp.maximum(ph0, ph1), ph1s)

    # rolling H-direction pool at stride 2: pooled p = max(rows 2p-1, 2p, 2p+1)
    carry = jnp.where(is_top, 0.0, convw(0))
    for p in range(_P):
        r1 = convw(2 * p + 1)
        r2 = convw(2 * p + 2)
        out_ref[0, p] = jnp.maximum(jnp.maximum(carry, r1), r2).astype(
            out_ref.dtype)
        carry = r2


def stem_pool_reference(x_s2d: jax.Array, kernel: jax.Array,
                        scale: jax.Array, bias: jax.Array) -> jax.Array:
    """Plain-XLA semantics the kernel must match: 4x4/s1 conv (pad (2,1)) ->
    affine -> ReLU -> maxpool 3x3/s2 (pad 1)."""
    y = jax.lax.conv_general_dilated(
        x_s2d, kernel.astype(x_s2d.dtype), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * scale.astype(y.dtype) + bias.astype(y.dtype), 0.0)
    from flax import linen as nn

    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def supports(x_s2d: jax.Array) -> bool:
    """Ragged heights are handled by padding to whole row-blocks and slicing
    the output (e.g. ACDC-native 1920x1080: 270 pooled rows -> 9 blocks)."""
    b, h2, w2, c = x_s2d.shape
    return c == 12 and w2 % 2 == 0 and h2 % 2 == 0 and h2 // 2 >= _P


def fused_stem_pool(
    x_s2d: jax.Array,     # (B, H2, W2, 12) s2d level input
    kernel: jax.Array,    # (4, 4, 12, 64) s2d stem conv kernel
    scale: jax.Array,     # (64,) folded BN scale  gamma / sqrt(var + eps)
    bias: jax.Array,      # (64,) folded BN bias   beta - mean * scale
    *,
    interpret: bool = False,
) -> jax.Array:
    """conv+BN+ReLU+maxpool -> (B, H2/2, W2/2, 64), pre-pool tensor never
    materialized. Requires ``supports(x_s2d)``; callers fall back to the
    plain XLA path otherwise."""
    b, h2, w2, _ = x_s2d.shape
    wf = w2 // 2
    pooled_h = h2 // 2
    r_blocks = -(-pooled_h // _P)  # ragged heights: pad up, slice output

    xf = x_s2d.reshape(b, h2, wf, 24)
    # rows: (3, 1) conv/pool padding plus zero rows up to whole 64-row
    # blocks — the garbage pooled rows they produce are sliced off below
    pad_bot = 1 + (64 * r_blocks + 4) - (h2 + 4)
    xp = jnp.pad(xf, ((0, 0), (3, pad_bot), (1, 1), (0, 8)))
    # overlapping 68-row blocks (stride 64), flattened to the grid dim
    xb = jnp.stack([xp[:, 64 * r:64 * r + 68] for r in range(r_blocks)], 1)
    xb = xb.reshape(b * r_blocks, 68, wf + 2, 32)

    w384 = _w384_from_stem(kernel).astype(x_s2d.dtype)
    sb = jnp.stack([jnp.tile(scale.astype(jnp.float32), 2),
                    jnp.tile(bias.astype(jnp.float32), 2)])

    out = pl.pallas_call(
        functools.partial(_stem_kernel, wf=wf, r_blocks=r_blocks),
        grid=(b * r_blocks,),
        in_specs=[
            pl.BlockSpec((1, 68, wf + 2, 32), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((384, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _P, wf, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * r_blocks, _P, wf, 64),
                                       x_s2d.dtype),
        scratch_shapes=[pltpu.VMEM((65, wf + 2, 128), x_s2d.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xb, w384, sb)
    return out.reshape(b, r_blocks * _P, wf, 64)[:, :pooled_h]
