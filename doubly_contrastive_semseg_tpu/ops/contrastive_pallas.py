"""Fused tiled contrastive loss — Pallas TPU kernels.

Compute SupCon-style losses from (N, D) embeddings without materializing the
full N×N similarity matrix in HBM. At the reference's scale (N = 2·bsz = 16
image-level, ≤ 2·B·19 pixel anchors) a plain XLA einsum is fine — this
kernel is for the large-N regime (dense per-pixel contrast, big global
batches) where N×N no longer fits: on a 16 GB v5e the XLA path dies at
N = 65 536 (the f32 similarity matrix alone is 17 GB) while this kernel's
VMEM footprint is O(tile²), independent of N.

The computation (shared by ``losses/supcon.py`` and the
``losses/pixel_contrast.py`` contrast stage, reference ``utils/loss.py:
174-205, 339-389``) needs three row statistics of the masked logits matrix
L = (Z Zᵀ)/τ:
  1. m_i   = max over valid columns            (stability shift)
  2. n_i   = ‖row_i − m_i‖₂ over valid columns (the reference's row-L2 tweak)
  3. s_i   = Σ_valid exp(l̂_ij),  p_i = Σ_pos l̂_ij,  c_i = Σ_pos 1
with l̂_ij = (l_ij − m_i)/n_i. The row-L2 normalization makes the classic
one-sweep online-softmax rescaling inapplicable (the exponent is divided by
a statistic that is only final after a full row pass), so the kernel runs
THREE flash-attention-style sweeps — grid (row_tiles, col_tiles), column
blocks streamed through VMEM by the Pallas pipeline, accumulators carried in
VMEM scratch across the column dimension, outputs written at the last column
step. The similarity tile Z_r Z_cᵀ is recomputed on the MXU each sweep
(cheap; D ≤ 256) instead of ever being written to HBM.

loss_i = −(τ/τ_b) · (p_i − c_i·log s_i) / c_i   (SimCLR/SupCon log-prob form).
The pixel-contrast variant (``pixel_contrast_loss_pallas``) adds a FOURTH
sweep: its per-pair denominator log(exp(l̂_ij) + Σ_neg exp) depends on each
positive's own l̂_ij, so with (m, n, s) final the last pass accumulates
q_i = Σ_pos [l̂_ij − log(exp(l̂_ij) + s_i)] directly (``_pc_kernel``);
value-matched against ``_masked_contrastive`` (itself oracle-matched to the
torch reference).

Measured on v5e (scripts/bench_contrastive.py, D=128, f32):
  forward only:                      value_and_grad (--grad):
      N      XLA      Pallas             XLA     Pallas+VJP
   8192    4.8 ms     5.4 ms          6.6 ms     5.8 ms  (1.14x)
  16384   15.8 ms    17.0 ms         22.9 ms    19.5 ms  (1.18x)
  32768   58.6 ms    66.0 ms         87.6 ms    76.0 ms  (1.15x)
  65536      OOM      360 ms            OOM      371 ms
 131072      OOM     1494 ms (fwd)
Forward-only XLA is ~10% faster wherever its N x N matrix fits, but these
are TRAINING losses — under value_and_grad (the only production mode) the
kernel + chunked VJP wins from N = 8192 up and extends feasibility past
XLA's autodiff OOM at 65536. The default routing (losses/supcon.py
PALLAS_MIN_N) therefore switches at the measured training crossover.

Both public losses are differentiable: reverse-mode AD cannot trace through
``pallas_call``, and these losses only ever run inside ``value_and_grad``
(they are training losses), so each carries a ``jax.custom_vjp`` whose
forward is the Pallas sweeps (saving the O(N) row stats as residuals) and
whose backward is a chunked ``lax.scan`` in plain XLA: each step recomputes
one (chunk × N) logits slab from the MXU, forms the hand-derived
∂L/∂logits — through the row-L2 normalization (gradient FLOWS through the
norm, matching torch ``F.normalize``; the max shift is detached, matching
``logits_max.detach()``) — and accumulates both the row-side and the
transposed column-side contributions of dZ = (G + Gᵀ)Z/τ into an O(N·D)
carry. Peak live memory is O(chunk·N), never N×N; gradients are verified
against ``jax.grad`` of the XLA paths in tests/test_pallas_contrastive.py.
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


def _tile_parts(zr, labr, validr, zc, labc, validc, r, c, tile_n, inv_temp):
    """Shared per-(row,col)-tile pieces: logits, pair validity, positives."""
    logits = jax.lax.dot_general(
        zr, zc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * inv_temp
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_n), 0) + r * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_n), 1) + c * tile_n
    not_self = (row_ids != col_ids).astype(jnp.float32)
    vpair = validr * validc.reshape(1, tile_n)
    same = (labr == labc.reshape(1, tile_n)).astype(jnp.float32) * vpair
    pos = same * not_self
    return logits, vpair, pos, not_self


def _max_kernel(zr_ref, labr_ref, validr_ref, zc_ref, labc_ref, validc_ref,
                out_m_ref, acc, *, tile_n: int, num_col_tiles: int,
                inv_temp: float):
    r, c = pl.program_id(0), pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc[:] = jnp.full_like(acc, NEG_BIG)

    logits, vpair, _, _ = _tile_parts(
        zr_ref[:], labr_ref[:], validr_ref[:], zc_ref[:], labc_ref[:],
        validc_ref[:], r, c, tile_n, inv_temp)
    masked = jnp.where(vpair > 0, logits, NEG_BIG)
    acc[:] = jnp.maximum(acc[:], jnp.max(masked, axis=1, keepdims=True))

    @pl.when(c == num_col_tiles - 1)
    def _emit():
        out_m_ref[:] = acc[:]


def _norm_kernel(zr_ref, labr_ref, validr_ref, m_ref,
                 zc_ref, labc_ref, validc_ref,
                 out_n_ref, acc, *, tile_n: int, num_col_tiles: int,
                 inv_temp: float):
    r, c = pl.program_id(0), pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    logits, vpair, _, _ = _tile_parts(
        zr_ref[:], labr_ref[:], validr_ref[:], zc_ref[:], labc_ref[:],
        validc_ref[:], r, c, tile_n, inv_temp)
    shifted = jnp.where(vpair > 0, logits - m_ref[:], 0.0)
    acc[:] = acc[:] + jnp.sum(shifted * shifted, axis=1, keepdims=True)

    @pl.when(c == num_col_tiles - 1)
    def _emit():
        out_n_ref[:] = jnp.maximum(jnp.sqrt(acc[:]), 1e-12)


def _sums_kernel(zr_ref, labr_ref, validr_ref, m_ref, n_ref,
                 zc_ref, labc_ref, validc_ref,
                 out_s_ref, out_p_ref, out_c_ref, acc_s, acc_p, acc_c,
                 *, tile_n: int, num_col_tiles: int, inv_temp: float,
                 neg_mode: bool):
    r, c = pl.program_id(0), pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_p[:] = jnp.zeros_like(acc_p)
        acc_c[:] = jnp.zeros_like(acc_c)

    logits, vpair, pos, not_self = _tile_parts(
        zr_ref[:], labr_ref[:], validr_ref[:], zc_ref[:], labc_ref[:],
        validc_ref[:], r, c, tile_n, inv_temp)
    lhat = jnp.where(vpair > 0, (logits - m_ref[:]) / n_ref[:], 0.0)
    e = jnp.exp(lhat)
    if neg_mode:
        # pixel-contrast denominator: negatives only (loss.py:376-381);
        # the elementwise exp(l̂_ij) term is added on the host side
        neg = (1.0 - (pos + (1.0 - not_self) * vpair)) * vpair
        acc_s[:] = acc_s[:] + jnp.sum(e * neg, axis=1, keepdims=True)
    else:
        # supcon denominator: all valid non-self columns (loss.py:196-197)
        acc_s[:] = acc_s[:] + jnp.sum(e * vpair * not_self, axis=1,
                                      keepdims=True)
    acc_p[:] = acc_p[:] + jnp.sum(lhat * pos, axis=1, keepdims=True)
    acc_c[:] = acc_c[:] + jnp.sum(pos, axis=1, keepdims=True)

    @pl.when(c == num_col_tiles - 1)
    def _emit():
        out_s_ref[:] = acc_s[:]
        out_p_ref[:] = acc_p[:]
        out_c_ref[:] = acc_c[:]


def _pc_kernel(zr_ref, labr_ref, validr_ref, m_ref, n_ref, s_ref,
               zc_ref, labc_ref, validc_ref,
               out_q_ref, out_c_ref, acc_q, acc_c,
               *, tile_n: int, num_col_tiles: int, inv_temp: float):
    """Pixel-contrast positive-sum pass (4th sweep): with the row stats
    (m, n, s=Σ_neg exp) final, accumulate
        q_i = Σ_pos [ l̂_ij − log(exp(l̂_ij) + s_i) ]
    — the reference's per-pair log-denominator (loss.py:376-385), which is a
    function of each positive's own l̂_ij and therefore cannot be assembled
    from row sums alone."""
    r, c = pl.program_id(0), pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_q[:] = jnp.zeros_like(acc_q)
        acc_c[:] = jnp.zeros_like(acc_c)

    logits, vpair, pos, _ = _tile_parts(
        zr_ref[:], labr_ref[:], validr_ref[:], zc_ref[:], labc_ref[:],
        validc_ref[:], r, c, tile_n, inv_temp)
    lhat = jnp.where(vpair > 0, (logits - m_ref[:]) / n_ref[:], 0.0)
    log_prob = lhat - jnp.log(jnp.exp(lhat) + s_ref[:])
    acc_q[:] = acc_q[:] + jnp.sum(log_prob * pos, axis=1, keepdims=True)
    acc_c[:] = acc_c[:] + jnp.sum(pos, axis=1, keepdims=True)

    @pl.when(c == num_col_tiles - 1)
    def _emit():
        out_q_ref[:] = acc_q[:]
        out_c_ref[:] = acc_c[:]


def _pad_rows(z, labels, valid, n_pad, d_pad):
    """Pad (N, D) embeddings + per-row labels/validity to kernel geometry:
    padded rows get label −1 / valid 0 so they join no pair."""
    n, d = z.shape
    zp = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(
        z.astype(jnp.float32))
    labp = jnp.full((n_pad, 1), -1.0, jnp.float32).at[:n, 0].set(
        labels.astype(jnp.float32))
    validp = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        valid.astype(jnp.float32))
    return zp, labp, validp


def _tile_scaffold(tile_n: int, n_pad: int):
    """Shared (row, col) grid scaffolding for the N×N sweep kernels:
    row/col BlockSpec builders, the per-row (N, 1) output spec/shape, and
    the (tile_n, 1) f32 accumulator scratch."""
    def row_spec(width):
        return pl.BlockSpec((tile_n, width), lambda r, c: (r, 0),
                            memory_space=pltpu.VMEM)

    def col_spec(width):
        return pl.BlockSpec((tile_n, width), lambda r, c: (c, 0),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((tile_n, 1), lambda r, c: (r, 0),
                            memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
    scr = pltpu.VMEM((tile_n, 1), jnp.float32)
    return row_spec, col_spec, out_spec, oshape, scr


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
    zp, labp, validp = _pad_rows(z, labels, valid, n_pad, d_pad)

    num_tiles = n_pad // tile_n
    grid = (num_tiles, num_tiles)
    row_spec, col_spec, out_spec, oshape, scr = _tile_scaffold(tile_n, n_pad)
    common = dict(tile_n=tile_n, num_col_tiles=num_tiles,
                  inv_temp=1.0 / temperature)

    m = pl.pallas_call(
        functools.partial(_max_kernel, **common),
        grid=grid,
        in_specs=[row_spec(d_pad), row_spec(1), row_spec(1),
                  col_spec(d_pad), col_spec(1), col_spec(1)],
        out_specs=out_spec, out_shape=oshape,
        scratch_shapes=[scr], interpret=interpret,
    )(zp, labp, validp, zp, labp, validp)

    norm = pl.pallas_call(
        functools.partial(_norm_kernel, **common),
        grid=grid,
        in_specs=[row_spec(d_pad), row_spec(1), row_spec(1), row_spec(1),
                  col_spec(d_pad), col_spec(1), col_spec(1)],
        out_specs=out_spec, out_shape=oshape,
        scratch_shapes=[scr], interpret=interpret,
    )(zp, labp, validp, m, zp, labp, validp)

    s, p, cnt = pl.pallas_call(
        functools.partial(_sums_kernel, neg_mode=neg_mode, **common),
        grid=grid,
        in_specs=[row_spec(d_pad), row_spec(1), row_spec(1), row_spec(1),
                  row_spec(1), col_spec(d_pad), col_spec(1), col_spec(1)],
        out_specs=[out_spec] * 3, out_shape=[oshape] * 3,
        scratch_shapes=[scr] * 3, interpret=interpret,
    )(zp, labp, validp, m, norm, zp, labp, validp)

    return (p[:n, 0], cnt[:n, 0], s[:n, 0], m[:n, 0], norm[:n, 0])


# --------------------------------------------------------------------------
# Backward pass (shared): chunked recompute of dZ = (G + Gᵀ) Z / τ
# --------------------------------------------------------------------------

_BWD_CHUNK = 256  # rows per slab; peak live memory ≈ few × chunk·N f32


def _dz_via_chunks(z, labf, validf, m, norm, row_stats, ghat_fn, inv_temp,
                   chunk=_BWD_CHUNK):
    """dL/dZ for a row-L2-normalized contrastive loss, never holding N×N.

    ``ghat_fn(lhat, pos, same, vpair, not_self, stats_chunk) -> Ĝ`` supplies
    the loss-specific ∂L/∂L̂ for one (chunk, N) slab (the slab covers FULL
    rows, so per-row reductions over all columns are available). The shared
    chain here is the normalization transpose — gradient flows through
    n_i = max(‖row‖₂, ε) (norm branch; matches ``F.normalize``) while the
    max shift m_i is detached:
        G = vpair · (Ĝ − L̂ · ⟨Ĝ, L̂⟩_row) / n
    and dZ accumulates both sides of the symmetric product:
        dZ = (G + Gᵀ) Z / τ
    — the row side emitted per chunk, the column side (GᵀZ) summed into an
    O(N·D) scan carry. ``row_stats`` is a tuple of per-row (N,) arrays the
    loss needs (already cotangent-scaled)."""
    n, d = z.shape
    p_rows = _round_up(max(n, chunk), chunk)
    zp, labp, validp = _pad_rows(z, labf, validf, p_rows, d)
    labp, validp = labp[:, 0], validp[:, 0]
    mp = jnp.zeros((p_rows,), jnp.float32).at[:n].set(m)
    np_ = jnp.ones((p_rows,), jnp.float32).at[:n].set(norm)
    stats_p = tuple(jnp.zeros((p_rows,), jnp.float32).at[:n].set(
        sarr.astype(jnp.float32)) for sarr in row_stats)

    c_chunks = p_rows // chunk
    col_ids = jnp.arange(p_rows)

    def step(acc, inp):
        idx, zc, labc, vc, mc, nc, stats_c = inp
        slab = jax.lax.dot_general(
            zc, zp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_temp
        rows = idx * chunk + jnp.arange(chunk)
        not_self = (rows[:, None] != col_ids[None, :]).astype(jnp.float32)
        vpair = vc[:, None] * validp[None, :]
        same = (labc[:, None] == labp[None, :]).astype(jnp.float32) * vpair
        pos = same * not_self
        lhat = jnp.where(vpair > 0, (slab - mc[:, None]) / nc[:, None], 0.0)
        ghat = ghat_fn(lhat, pos, same, vpair, not_self, stats_c)
        r = jnp.sum(ghat * lhat, axis=1)
        gmat = vpair * (ghat - lhat * r[:, None]) / nc[:, None]
        acc = acc + jax.lax.dot_general(
            gmat, zc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_temp
        row_contrib = (gmat @ zp) * inv_temp
        return acc, row_contrib

    inputs = (jnp.arange(c_chunks),
              zp.reshape(c_chunks, chunk, d),
              labp.reshape(c_chunks, chunk),
              validp.reshape(c_chunks, chunk),
              mp.reshape(c_chunks, chunk),
              np_.reshape(c_chunks, chunk),
              tuple(sarr.reshape(c_chunks, chunk) for sarr in stats_p))
    acc, row_side = jax.lax.scan(step, jnp.zeros_like(zp), inputs)
    dz = row_side.reshape(p_rows, d) + acc
    return dz[:n]


# --------------------------------------------------------------------------
# SupCon / SimCLR (custom-VJP core over flattened (N, D) rows)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _supcon_core(z, labf, validf, temperature, base_temperature, tile_n,
                 interpret):
    loss, _ = _supcon_core_fwd(z, labf, validf, temperature, base_temperature,
                               tile_n, interpret)
    return loss


def _supcon_core_fwd(z, labf, validf, temperature, base_temperature, tile_n,
                     interpret):
    p, cnt, s, m, norm = contrastive_row_stats(
        z, labf, validf, temperature=temperature, tile_n=tile_n,
        interpret=interpret)
    mean_log_prob_pos = ((p - cnt * jnp.log(jnp.maximum(s, 1e-30)))
                         / jnp.maximum(cnt, 1.0))
    loss = jnp.mean(-(temperature / base_temperature) * mean_log_prob_pos)
    return loss, (z, labf, validf, cnt, s, m, norm)


def _supcon_core_bwd(temperature, base_temperature, tile_n, interpret,
                     res, ct):
    z, labf, validf, cnt, s, m, norm = res
    n = z.shape[0]
    # ∂loss/∂L̂_ij = coef_i · (pos_ij − (c_i/s_i)·e^{l̂_ij}·[j≠i]·vpair_ij)
    coef = (ct * (-(temperature / base_temperature)) / n
            / jnp.maximum(cnt, 1.0)) * (validf > 0)
    inv_s = cnt / jnp.maximum(s, 1e-30)

    def ghat_fn(lhat, pos, same, vpair, not_self, stats):
        coef_c, inv_s_c = stats
        e = jnp.exp(lhat)
        return coef_c[:, None] * (
            pos - inv_s_c[:, None] * e * not_self * vpair)

    dz = _dz_via_chunks(z, labf, validf, m, norm, (coef, inv_s), ghat_fn,
                        1.0 / temperature)
    return dz.astype(z.dtype), jnp.zeros_like(labf), jnp.zeros_like(validf)


_supcon_core.defvjp(_supcon_core_fwd, _supcon_core_bwd)


def supcon_loss_pallas(
    features: jax.Array,                 # (B, 2, D)
    labels: Optional[jax.Array] = None,  # (B,) or None (SimCLR)
    *,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    tile_n: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused version of ``losses.supcon.supcon_loss`` (differentiable
    via the hand-derived chunked VJP — see module docstring)."""
    b = features.shape[0]
    z = jnp.concatenate(
        [features[:, 0], features[:, 1]], axis=0).astype(jnp.float32)
    if labels is None:
        lab = jnp.arange(b, dtype=jnp.int32)
    else:
        lab = labels.reshape(-1).astype(jnp.int32)
    labf = jnp.concatenate([lab, lab], axis=0).astype(jnp.float32)
    validf = jnp.ones((2 * b,), jnp.float32)
    return _supcon_core(z, labf, validf, temperature, base_temperature,
                        tile_n, interpret)


# --------------------------------------------------------------------------
# Pixel contrast (custom-VJP core over flattened (N, D) rows)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _pc_core(z, labf, validf, temperature, base_temperature, tile_n,
             interpret):
    loss, _ = _pc_core_fwd(z, labf, validf, temperature, base_temperature,
                           tile_n, interpret)
    return loss


def _pc_core_fwd(z, labf, validf, temperature, base_temperature, tile_n,
                 interpret):
    n, d = z.shape
    n_pad = _round_up(max(n, tile_n), tile_n)
    d_pad = _round_up(d, 128)
    zp, labp, validp = _pad_rows(z, labf, validf, n_pad, d_pad)

    # sweeps 1-3 (neg_mode): shared row statistics
    p_, cnt_, s, m, norm = contrastive_row_stats(
        z, labf, validf, temperature=temperature, neg_mode=True,
        tile_n=tile_n, interpret=interpret)
    del p_, cnt_
    mp = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(m)
    np_ = jnp.ones((n_pad, 1), jnp.float32).at[:n, 0].set(norm)
    sp = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(s)

    num_tiles = n_pad // tile_n
    grid = (num_tiles, num_tiles)
    row_spec, col_spec, out_spec, oshape, scr = _tile_scaffold(tile_n, n_pad)

    q, cnt = pl.pallas_call(
        functools.partial(_pc_kernel, tile_n=tile_n, num_col_tiles=num_tiles,
                          inv_temp=1.0 / temperature),
        grid=grid,
        in_specs=[row_spec(d_pad), row_spec(1), row_spec(1), row_spec(1),
                  row_spec(1), row_spec(1),
                  col_spec(d_pad), col_spec(1), col_spec(1)],
        out_specs=[out_spec] * 2, out_shape=[oshape] * 2,
        scratch_shapes=[scr] * 2, interpret=interpret,
    )(zp, labp, validp, mp, np_, sp, zp, labp, validp)
    q, cnt = q[:n, 0], cnt[:n, 0]

    per_anchor = -(temperature / base_temperature) * q / jnp.maximum(cnt, 1.0)
    row_ok = (validf > 0) & (cnt > 0)
    denom = jnp.maximum(jnp.sum(row_ok), 1)
    loss = jnp.sum(jnp.where(row_ok, per_anchor, 0.0)) / denom
    loss = jnp.where(jnp.sum(row_ok) > 0, loss, 0.0)
    return loss, (z, labf, validf, cnt, s, m, norm)


def _pc_core_bwd(temperature, base_temperature, tile_n, interpret, res, ct):
    z, labf, validf, cnt, s, m, norm = res
    row_ok = (validf > 0) & (cnt > 0)
    denom = jnp.maximum(jnp.sum(row_ok), 1).astype(jnp.float32)
    # ∂loss/∂L̂_ij (per-pair denominator D_ij = e^{l̂_ij} + s_i):
    #   positives:  w_i · (1 − e_ij/D_ij)
    #   negatives:  −w_i · e_ij · t_i,   t_i = Σ_pos 1/D_ik  (in-slab)
    w = jnp.where(row_ok,
                  ct * (-(temperature / base_temperature))
                  / (denom * jnp.maximum(cnt, 1.0)), 0.0)

    def ghat_fn(lhat, pos, same, vpair, not_self, stats):
        w_c, s_c = stats
        e = jnp.exp(lhat)
        dmat = e + s_c[:, None]
        t = jnp.sum(pos / dmat, axis=1)
        neg = (1.0 - same) * vpair
        return w_c[:, None] * (pos * (1.0 - e / dmat) - neg * e * t[:, None])

    dz = _dz_via_chunks(z, labf, validf, m, norm, (w, s), ghat_fn,
                        1.0 / temperature)
    return dz.astype(z.dtype), jnp.zeros_like(labf), jnp.zeros_like(validf)


_pc_core.defvjp(_pc_core_fwd, _pc_core_bwd)


def pixel_contrast_loss_pallas(
    feats: jax.Array,    # (A, V, D) anchor features
    labels: jax.Array,   # (A,) int class ids
    valid: jax.Array,    # (A,) bool anchor validity
    *,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    tile_n: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused version of ``losses.pixel_contrast._masked_contrastive``
    for the large-anchor regime (dense per-pixel contrast): never
    materializes the N×N logits matrix. Four streaming sweeps: max → row-L2
    norm → negative denominator → per-positive log-prob sum. Differentiable
    via the hand-derived chunked VJP (module docstring)."""
    v = feats.shape[1]
    z = jnp.concatenate(
        [feats[:, i, :] for i in range(v)], axis=0).astype(jnp.float32)
    labf = jnp.tile(labels.reshape(-1).astype(jnp.float32), (v,))
    validf = jnp.tile(valid.reshape(-1).astype(jnp.float32), (v,))
    return _pc_core(z, labf, validf, temperature, base_temperature,
                    tile_n, interpret)
