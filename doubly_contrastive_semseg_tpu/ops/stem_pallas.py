"""Fused s2d-stem Pallas kernel: conv 4×4/s1 (12→64) + folded BN + ReLU.

XLA's conv with C_in = 12 feeds the MXU a 12-deep contraction (~12 TF/s
measured on v5e); this kernel rebuilds the contraction as K = 48 per kernel
row by stacking kb-shifted planar copies on sublanes and accumulating 4 MXU
dots per tile, with the eval-mode BatchNorm and ReLU folded in.

STATUS: correct (tested vs the XLA conv) but measured SLOWER end-to-end than
the XLA stem at SwiftNet shapes — 111 vs 158 fps total — because the 8-row
tile grid (512 programs, forced by DMA sublane alignment) plus the 4×
kb-copy read amplification outweigh the MXU win. Kept as a reference Pallas
implementation and for the Mosaic constraints it documents (unaligned DMA
slices, offset-layout reshapes, 16-bit rotates); the model uses the XLA conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int) -> int:
    """Row tile: DMA offsets must be sublane-aligned (8), so tiles are
    multiples of 8 and the kernel only supports h % 8 == 0 (callers fall back
    to XLA otherwise — e.g. 1080-high validation frames with H/2 = 540).
    Larger tiles amortize per-program overhead."""
    return 8 if h % 8 == 0 else 0


def stem_kernel_supported(h2: int) -> bool:
    return h2 % 8 == 0


def _kernel(x_hbm, w_ref, ab_ref, out_ref, scratch, sem,
            *, tile_h: int, w: int, w_pad: int, cin: int, cout: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # slab (4, 12, tile_h+8, w_pad): the 4 kb-shifted planar copies are
    # prebuilt in HBM (lane slices can't be DMA'd unaligned), rows read as an
    # aligned (tile_h+8)-row window covering the +3 halo
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, :, pl.ds(i * tile_h, tile_h + 8), :], scratch, sem)
    copy.start()
    copy.wait()

    xt = scratch[:]                                  # (4, 12, th+8, w_pad)
    # one (48, N)·(48, 64) bf16 dot per kernel row ka; the ka window is a
    # sublane-offset slice (reshape-safe, unlike lane offsets)
    out = None
    for ka in range(4):
        s = xt[:, :, ka:ka + tile_h, 0:w]            # (4, 12, th, w)
        col = s.reshape(4 * cin, tile_h * w)
        part = jax.lax.dot_general(
            col, w_ref[pl.ds(ka * 4 * cin, 4 * cin), :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (N, 64)
        out = part if out is None else out + part
    out = jnp.maximum(out * ab_ref[0, :] + ab_ref[1, :], 0.0)
    out_ref[0, :, :, :] = out.reshape(tile_h, w, cout).astype(out_ref.dtype)


def fused_stem(
    s2d_planar: jax.Array,   # (B, 12, H2, W2) — planar s2d stem input
    kernel: jax.Array,       # (4, 4, 12, 64)
    bn_scale: jax.Array, bn_bias: jax.Array,
    bn_mean: jax.Array, bn_var: jax.Array,
    *,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """(B, H2, W2, 64) = relu(BN_eval(conv(s2d, kernel, stride 1, pad (2,1))))."""
    b, cin, h, w = s2d_planar.shape
    kh, kw, _, cout = kernel.shape
    assert (kh, kw) == (4, 4) and cin == 12

    # fold BN: y = conv ⋅ a + shift
    a = (bn_scale / jnp.sqrt(bn_var + eps)).astype(jnp.float32)
    shift = (bn_bias - bn_mean * a).astype(jnp.float32)
    ab = jnp.stack([jnp.asarray(a), jnp.asarray(shift)], axis=0)  # (2, 64)

    # weights (4,4,12,64) → (192,64), row order (ka, kb, c)
    w2 = kernel.astype(jnp.bfloat16).reshape(16 * cin, cout)

    tile_h = _pick_tile(h)
    assert tile_h, f"h={h} must be divisible by 8 (see stem_kernel_supported)"
    w_pad = ((w + 3 + 127) // 128) * 128
    # conv zero pad: rows (2, 6) (bottom slack for the aligned reads); the 4
    # kb column shifts are prebuilt as stacked copies since lane slices can't
    # be DMA'd at unaligned offsets
    xbase = jnp.pad(s2d_planar.astype(jnp.bfloat16),
                    ((0, 0), (0, 0), (2, 6), (2, w_pad + 1 - w)))
    xkb = jnp.stack([xbase[:, :, :, kb:kb + w_pad] for kb in range(4)], axis=1)

    kfun = functools.partial(_kernel, tile_h=tile_h, w=w, w_pad=w_pad,
                             cin=cin, cout=cout)
    out = pl.pallas_call(
        kfun,
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16 * cin, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, cout), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((4, cin, tile_h + 8, w_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xkb, w2, ab)
    return out
