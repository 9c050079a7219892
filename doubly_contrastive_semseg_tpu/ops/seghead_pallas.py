"""Fused segmentation serving head — Pallas TPU kernel.

Computes, in one pass over the decoder features:
    labels = argmax_c( upsample×4_bilinear( conv1×1( relu( BN(x) ) ) ) )
i.e. the SwiftNet seg head (``network/weathernet.py:61-62``: BN→ReLU→1×1) +
the final bilinear upsample to input resolution (``weathernet.py:85``) +
the prediction argmax (``trainer.py:349``), without ever materializing the
full-resolution logits: at 2048×1024×19 those are ~640 MB of HBM traffic per
batch-8 inference that XLA writes and re-reads.

v2 (this file) vs the round-1 kernel:
- features stay **bfloat16** end-to-end (v1 pre-converted the whole map to
  f32 and pre-padded both axes in XLA — 4.3 ms of pure layout traffic at the
  headline shape);
- only the row axis is edge-padded in XLA (cheap, layout-preserving); the
  column halo is replicated inside the kernel (two (T+2, 128) VMEM copies);
- **any feature height** is supported — rows are padded up to a whole number
  of tiles and the extra output rows sliced off, so the 1080-high ACDC val
  frames (270 feature rows) take the fused path;
- the label map is emitted as **int8** (19 classes), quartering the output
  write traffic; caller-visible dtype is int8.

Grid: (batch, row-tiles). Each program DMAs its (TILE_H+2, W, 128) bf16
feature slab HBM→VMEM, folds BN into scale/shift, computes channel-planar
logits (C, ·) with one MXU contraction, expands the 4 bilinear phases per
axis, and argmaxes over the C planes. The 4 column phases write 4 outputs
that the caller lane-interleaves with one cheap int8 stack+reshape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8  # input rows per program (→ 32 output rows: one int8 sublane tile)


def _phases4(prev: jax.Array, cur: jax.Array, nxt: jax.Array):
    """The 4 half-pixel phases of a ×4 bilinear upsample along an axis."""
    out = []
    for r in range(4):
        off = (r + 0.5) / 4 - 0.5
        if off < 0:
            out.append((-off) * prev + (1.0 + off) * cur)
        else:
            out.append((1.0 - off) * cur + off * nxt)
    return out


def _kernel(feat_hbm, wt_ref, ab_ref, bias_ref,
            out0_ref, out1_ref, out2_ref, out3_ref, scratch, sem,
            *, tile_h: int, h: int, w: int, w_pad: int, c_pad: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = -(-h // tile_h)  # static

    # This tile wants feature rows [i·T − 1, i·T + T + 1) with edge
    # replication at the image border — no XLA pre-pad (that copy costs
    # ~0.8 ms at the headline shape). DMA T+2 rows from a clamped start and
    # fix the edge tiles up with static row moves:
    #   i == 0:       rows [0, T+2) land in scratch; shift down 1, replicate
    #                 row 0 on top (shift = −1, static);
    #   i == last:    rows [h−T−2, h) land; shift up by r+1 where
    #                 r = n·T − h is the ragged tail (static per shape).
    start = jnp.clip(i * tile_h - 1, 0, h - (tile_h + 2))
    copy = pltpu.make_async_copy(
        feat_hbm.at[b, pl.ds(start, tile_h + 2)],
        scratch.at[:, pl.ds(0, w), :], sem)
    copy.start()
    copy.wait()

    @pl.when(i == 0)
    def _fix_top():
        for k in range(tile_h + 1, 0, -1):  # shift +1, top halo = row 0
            scratch[k] = scratch[k - 1]

    tail_shift = (n_tiles * tile_h + 1) - h  # ≥ 1; 1 when h % T == 0
    if tail_shift > 0:
        @pl.when((i == n_tiles - 1) & (i > 0))
        def _fix_bottom():
            for k in range(0, tile_h + 2):  # ascending: reads not yet written
                scratch[k] = scratch[min(k + tail_shift, tile_h + 1)]

    x = scratch[:]                                   # (tile_h+2, w_pad, 128)
    a = ab_ref[0, :]                                 # folded BN scale (f32)
    bb = ab_ref[1, :]                                # folded BN shift (f32)
    h = jnp.maximum(x.astype(jnp.float32) * a + bb, 0.0).astype(jnp.bfloat16)

    n = (tile_h + 2) * w_pad
    h2 = h.reshape(n, h.shape[-1])
    # channel-planar logits: (C, 128) · (N, 128)ᵀ → (C, N); minor dims stay
    # multiples of 128 so Mosaic accepts every reshape
    logits = jax.lax.dot_general(
        wt_ref[:], h2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # per-class bias; padded classes carry -1e30 so they never win the argmax
    logits = logits + bias_ref[:]
    logits = logits.reshape(c_pad, tile_h + 2, w_pad)

    # H phases: rows k ∈ [0, tile_h) use halo rows k, k+1, k+2
    prev = logits[:, 0:tile_h, :]
    cur = logits[:, 1:tile_h + 1, :]
    nxt = logits[:, 2:tile_h + 2, :]
    hp = jnp.stack(_phases4(prev, cur, nxt), axis=2)          # (C, th, 4, w_pad)
    hp = hp.reshape(c_pad, 4 * tile_h, w_pad)

    # W phases: col j blends cols j-1, j, j+1 with edge replication, built as
    # value-level shifts (cheap lane rotates). Lane-interleaving (and even
    # stacking) the 4 phases trips Mosaic layout inference — each phase
    # argmaxes independently into its own output; the caller interleaves
    # with one XLA int8 stack.
    curw = hp[:, :, 0:w]
    prevw = jnp.concatenate([hp[:, :, 0:1], hp[:, :, 0:w - 1]], axis=-1)
    nxtw = jnp.concatenate([hp[:, :, 1:w], hp[:, :, w - 1:w]], axis=-1)
    outs = (out0_ref, out1_ref, out2_ref, out3_ref)
    for r, phase in enumerate(_phases4(prevw, curw, nxtw)):   # each (C, 4th, w)
        outs[r][0, :, :] = jnp.argmax(phase, axis=0).astype(jnp.int8)


def fused_seghead_upsample_argmax(
    feat: jax.Array,        # (B, h, w, 128) decoder features (any float dtype)
    bn_scale: jax.Array, bn_bias: jax.Array,
    bn_mean: jax.Array, bn_var: jax.Array,
    conv_kernel: jax.Array,  # (1, 1, 128, C) or (128, C)
    conv_bias: jax.Array,    # (C,)
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """(B, 4h, 4w) int8 label map. Matches
    ``argmax(resize_bilinear(BNReluConv(feat), 4×))`` (eval-mode BN)."""
    b, h, w, cin = feat.shape
    kernel2d = conv_kernel.reshape(cin, -1)
    c = kernel2d.shape[-1]
    c_pad = max(8, ((c + 7) // 8) * 8)

    # fold BN (eval mode) into scale/shift: x̂ = x·a + b
    a = (bn_scale / jnp.sqrt(bn_var + eps)).astype(jnp.float32)
    bias = (bn_bias - bn_mean * a).astype(jnp.float32)
    ab = jnp.stack([a, bias], axis=0)                          # (2, 128)

    cin_p = ((cin + 127) // 128) * 128
    # weights transposed to (C_pad, cin_p); per-class bias as a (C_pad, 1)
    # column with -1e30 on padded classes
    wt_full = jnp.zeros((c_pad, cin_p), jnp.bfloat16).at[:c, :cin].set(
        kernel2d.T.astype(jnp.bfloat16))
    bias_col = jnp.full((c_pad, 1), -1e30, jnp.float32)
    bias_col = bias_col.at[:c, 0].set(conv_bias.astype(jnp.float32).reshape(-1))
    ab_full = jnp.zeros((2, cin_p), jnp.float32).at[:, :cin].set(ab)

    # any h ≥ TILE_H+2 works: the kernel DMAs clamped row windows and
    # edge-replicates the halo / ragged-tail rows itself (no XLA pre-pad;
    # surplus output rows of the last tile are sliced off below).
    assert h >= TILE_H + 2, f"h={h} too small for the fused head"
    n_tiles = -(-h // TILE_H)
    hp_rows = n_tiles * TILE_H
    featp = feat.astype(jnp.bfloat16)
    if cin_p != cin:
        featp = jnp.pad(featp, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))

    w_pad = ((w + 2 + 127) // 128) * 128
    grid = (b, n_tiles)
    kernel = functools.partial(_kernel, tile_h=TILE_H, h=h, w=w, w_pad=w_pad,
                               c_pad=c_pad)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # feat (manual DMA)
            pl.BlockSpec((c_pad, cin_p), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),             # weights
            pl.BlockSpec((2, cin_p), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),             # bn scale/shift
            pl.BlockSpec((c_pad, 1), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),             # class bias
        ],
        out_specs=[pl.BlockSpec((1, 4 * TILE_H, w), lambda b_, i: (b_, i, 0),
                                memory_space=pltpu.VMEM) for _ in range(4)],
        out_shape=[jax.ShapeDtypeStruct((b, 4 * hp_rows, w), jnp.int8)
                   for _ in range(4)],
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2, w_pad, cin_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(featp, wt_full, ab_full, bias_col)
    # interleave the 4 W-phases: 4 × (B, 4hp, w) → (B, 4hp, w, 4) → (B, 4hp, 4w)
    full = jnp.stack(out, axis=-1).reshape(b, 4 * hp_rows, 4 * w)
    return full[:, :4 * h] if hp_rows != h else full
