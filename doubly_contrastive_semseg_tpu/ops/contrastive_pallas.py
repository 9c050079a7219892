"""Fused tiled contrastive loss — Pallas TPU kernel.

The BASELINE north-star: compute SupCon-style losses from (N, D) embeddings
without materializing the full N×N similarity matrix in HBM. At the
reference's scale (N = 2·bsz = 16 image-level, ≤ 2·B·19 pixel anchors) a
plain XLA einsum is fine — this kernel is for the large-N regime (dense
per-pixel contrast, big global batches) where N×N no longer fits.

The computation (shared by ``losses/supcon.py`` and the
``losses/pixel_contrast.py`` contrast stage, reference ``utils/loss.py:
174-205, 339-389``) needs three row statistics of the masked logits matrix
L = (Z Zᵀ)/τ:
  1. m_i   = max over valid columns            (stability shift)
  2. n_i   = ‖row_i − m_i‖₂ over valid columns (the reference's row-L2 tweak)
  3. s_i   = Σ_valid exp(l̂_ij),  p_i = Σ_pos l̂_ij,  c_i = Σ_pos 1
with l̂_ij = (l_ij − m_i)/n_i. The kernel runs a grid over row tiles and
streams column tiles through VMEM, carrying (m, n, s, p, c) — the similarity
tile Z_r Z_cᵀ is computed on the MXU three times (cheap; D ≤ 256) instead of
ever being written to HBM.

loss_i = −(τ/τ_b) · (p_i − c_i·log s_i) / c_i   (SimCLR/SupCon log-prob form
with the full-denominator variant; the pixel-contrast explicit-negative
variant differs only in which columns enter s_i — controlled by ``neg_mode``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(z_ref, lab_ref, valid_ref, zt_ref, labt_ref, validt_ref,
            out_p_ref, out_c_ref, out_s_ref, out_m_ref, out_n_ref,
            *, tile_n: int, num_col_tiles: int, inv_temp: float, neg_mode: bool):
    """Row-tile program: three streaming passes over column tiles."""
    r = pl.program_id(0)
    row_base = r * tile_n

    z = z_ref[:]                       # (tile_n, D)
    lab = lab_ref[:]                   # (tile_n, 1) fp32 labels
    valid = valid_ref[:]               # (tile_n, 1) fp32 validity

    n_total = num_col_tiles * tile_n
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_n), 0) + row_base

    def col_tile(c):
        zc = zt_ref[pl.ds(c * tile_n, tile_n), :]
        labc = labt_ref[pl.ds(c * tile_n, tile_n), :]
        validc = validt_ref[pl.ds(c * tile_n, tile_n), :]
        logits = jax.lax.dot_general(
            z, zc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_temp
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_n), 1) + c * tile_n
        not_self = (row_ids != col_ids).astype(jnp.float32)
        vpair = valid * validc.reshape(1, tile_n)
        same = (lab == labc.reshape(1, tile_n)).astype(jnp.float32) * vpair
        pos = same * not_self
        return logits, vpair, pos, not_self

    # pass 1: row max over valid columns
    def max_body(c, m):
        logits, vpair, _, _ = col_tile(c)
        masked = jnp.where(vpair > 0, logits, NEG_BIG)
        return jnp.maximum(m, jnp.max(masked, axis=1, keepdims=True))

    m = jax.lax.fori_loop(0, num_col_tiles, max_body,
                          jnp.full((tile_n, 1), NEG_BIG, jnp.float32))

    # pass 2: row L2 norm of (logits - m) over valid columns
    def norm_body(c, acc):
        logits, vpair, _, _ = col_tile(c)
        shifted = jnp.where(vpair > 0, logits - m, 0.0)
        return acc + jnp.sum(shifted * shifted, axis=1, keepdims=True)

    sq = jax.lax.fori_loop(0, num_col_tiles, norm_body,
                           jnp.zeros((tile_n, 1), jnp.float32))
    norm = jnp.maximum(jnp.sqrt(sq), 1e-12)

    # pass 3: denominators and positive sums
    def sum_body(c, carry):
        s, p, cnt = carry
        logits, vpair, pos, not_self = col_tile(c)
        lhat = jnp.where(vpair > 0, (logits - m) / norm, 0.0)
        e = jnp.exp(lhat)
        if neg_mode:
            # pixel-contrast denominator: negatives only (loss.py:376-381);
            # the elementwise exp(l̂_ij) term is added on the host side
            neg = (1.0 - (pos + (1.0 - not_self) * vpair)) * vpair
            s = s + jnp.sum(e * neg, axis=1, keepdims=True)
        else:
            # supcon denominator: all valid non-self columns (loss.py:196-197)
            s = s + jnp.sum(e * vpair * not_self, axis=1, keepdims=True)
        p = p + jnp.sum(lhat * pos, axis=1, keepdims=True)
        cnt = cnt + jnp.sum(pos, axis=1, keepdims=True)
        return s, p, cnt

    s, p, cnt = jax.lax.fori_loop(
        0, num_col_tiles, sum_body,
        (jnp.zeros((tile_n, 1), jnp.float32),
         jnp.zeros((tile_n, 1), jnp.float32),
         jnp.zeros((tile_n, 1), jnp.float32)))

    out_p_ref[:] = p
    out_c_ref[:] = cnt
    out_s_ref[:] = s
    out_m_ref[:] = m
    out_n_ref[:] = norm


def contrastive_row_stats(
    z: jax.Array,        # (N, D) embeddings (two-view rows already stacked)
    labels: jax.Array,   # (N,) int
    valid: jax.Array,    # (N,) bool
    *,
    temperature: float = 0.07,
    neg_mode: bool = False,
    tile_n: int = 128,
    interpret: bool = False,
):
    """Returns (pos_sum, pos_count, denom_sum, row_max, row_norm), each (N,).

    ``neg_mode=False``: SupCon denominator Σ_{valid, j≠i} exp(l̂_ij).
    ``neg_mode=True``: pixel-contrast negatives-only sum Σ_neg exp(l̂_ij)
    (caller adds the elementwise exp term per loss.py:381).
    """
    n, d = z.shape
    n_pad = _round_up(max(n, tile_n), tile_n)
    d_pad = _round_up(d, 128)
    zp = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(
        z.astype(jnp.float32))
    labp = jnp.full((n_pad, 1), -1.0, jnp.float32).at[:n, 0].set(
        labels.astype(jnp.float32))
    validp = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        valid.astype(jnp.float32))

    num_tiles = n_pad // tile_n
    kernel = functools.partial(
        _kernel, tile_n=tile_n, num_col_tiles=num_tiles,
        inv_temp=1.0 / temperature, neg_mode=neg_mode)

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, d_pad), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda r: (r, 0), memory_space=pltpu.VMEM),
            # full column copies stay resident (N_pad × D ≤ a few MB)
            pl.BlockSpec((n_pad, d_pad), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda r: (r, 0), memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32) for _ in range(5)],
        interpret=interpret,
    )(zp, labp, validp, zp, labp, validp)
    p, cnt, s, m, norm = [o[:n, 0] for o in outs]
    return p, cnt, s, m, norm


def supcon_loss_pallas(
    features: jax.Array,                 # (B, 2, D)
    labels: Optional[jax.Array] = None,  # (B,) or None (SimCLR)
    *,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused version of ``losses.supcon.supcon_loss``."""
    b = features.shape[0]
    z = jnp.concatenate([features[:, 0], features[:, 1]], axis=0)
    if labels is None:
        lab = jnp.arange(b, dtype=jnp.int32)
    else:
        lab = labels.reshape(-1).astype(jnp.int32)
    lab2 = jnp.concatenate([lab, lab], axis=0)
    valid = jnp.ones((2 * b,), bool)
    p, cnt, s, _, _ = contrastive_row_stats(
        z, lab2, valid, temperature=temperature, interpret=interpret)
    mean_log_prob_pos = (p - cnt * jnp.log(s)) / jnp.maximum(cnt, 1.0)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)
