"""Planar input/output pipelines for tiny channel counts.

TPU vector units are (8, 128): an elementwise op over an NHWC array with
C = 3 (raw images) or C = 19 (segmentation logits) uses 3/128 of every lane
register. Profiling on a v5e shows the input pyramid + stem and the final
logits upsample dominating SwiftNet inference for exactly this reason.

This module keeps tiny-channel work in a *planar* (B, C, H, W) layout where
the lane dimension is W:

- ``normalize_planar`` + ``downsample2x_bicubic_planar``: the image pyramid
  as phase-sliced 4-tap blends (pure VPU, fully-utilized lanes, no convs,
  no gathers);
- ``space_to_depth2_nhwc``: (B, C, H, W) → (B, H/2, W/2, 4C) so the 7×7/s2
  stem becomes a 4×4/s1 conv over 12 input channels
  (``stem_s2d_kernel_from_dense`` rearranges dense 7×7×3×64 weights into the
  equivalent sparse 4×4×12×64 form — bit-exact, see tests);
- ``upsample4x_argmax``: the ×4 bilinear logits upsample + argmax with
  channels on the sublane axis, fused by XLA into a single streaming pass
  (the NHWC version costs ~40 ms/batch8 at 2048×1024; this one is
  bandwidth-bound).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 4-tap bicubic /2 weights (torch a=-0.75 at half-pixel centers)
_T0, _T1 = -0.09375, 0.59375


def is_planar_image(x: jax.Array) -> bool:
    """(B, 3, H, W) vs (B, H, W, 3). The host loader can feed planar batches
    directly (``--planar_input``) so the device never pays the relayout."""
    return x.ndim == 4 and x.shape[1] == 3 and x.shape[3] not in (3, 12)


def is_s2d_image(x) -> bool:
    """(B, H/2, W/2, 12): image pre-packed by the host into space-to-depth(2)
    layout (``s2d_pack``). The standard TPU conv0 optimization (as used by
    MLPerf ResNet submissions): the repack is a cache-friendly memcpy in the
    host loader, and the device never pays the ~6.5 ms (batch 8, 2048×1024)
    relayout shuffle that XLA otherwise emits for it."""
    return x.ndim == 4 and x.shape[-1] == 12


def s2d_pack(img_nhwc: np.ndarray) -> np.ndarray:
    """Host-side space-to-depth(2) pack: (B, H, W, 3) → (B, H/2, W/2, 12),
    channel order c*4 + i0*2 + j0 (matches ``space_to_depth2_nhwc``)."""
    b, h, w, c = img_nhwc.shape
    xr = img_nhwc.reshape(b, h // 2, 2, w // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 5, 2, 4)
    return np.ascontiguousarray(xr.reshape(b, h // 2, w // 2, 4 * c))


def image_hw(x: jax.Array) -> Tuple[int, int]:
    if is_planar_image(x):
        return (x.shape[2], x.shape[3])
    if is_s2d_image(x):
        return (2 * x.shape[1], 2 * x.shape[2])
    return (x.shape[1], x.shape[2])


def to_planar(x: jax.Array) -> jax.Array:
    if is_planar_image(x):
        return x
    return x.transpose(0, 3, 1, 2)


def normalize_planar(xp: jax.Array, mean: Sequence[float], std: Sequence[float],
                     dtype=jnp.bfloat16) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32).reshape(1, -1, 1, 1)
    std = jnp.asarray(std, jnp.float32).reshape(1, -1, 1, 1)
    return ((xp - mean) / std).astype(dtype)


def _down2_axis_planar(v: jax.Array, axis: int) -> jax.Array:
    """4-tap /2 bicubic along ``axis`` via even/odd phase slices."""
    n = v.shape[axis]
    pad = [(0, 0)] * v.ndim
    pad[axis] = (1, 1)
    vp = jnp.pad(v, pad, mode="edge")  # length n+2
    # output k ∈ [0, n/2) reads padded positions 2k, 2k+1, 2k+2, 2k+3
    def ph(start):
        return jax.lax.slice_in_dim(vp, start, start + n - 1, stride=2, axis=axis)

    t0 = ph(0)
    t1 = ph(1)
    t2 = ph(2)
    t3 = ph(3)
    return _T0 * t0 + _T1 * t1 + _T1 * t2 + _T0 * t3


def downsample2x_bicubic_planar(xp: jax.Array) -> jax.Array:
    """(B, C, H, W) → (B, C, H/2, W/2), matches ``downsample2x_bicubic``."""
    xp = _down2_axis_planar(xp, xp.ndim - 2)
    xp = _down2_axis_planar(xp, xp.ndim - 1)
    return xp


def space_to_depth2_nhwc(xp: jax.Array) -> jax.Array:
    """(B, C, H, W) → (B, H/2, W/2, 4C), channel order c*4 + i0*2 + j0 where
    (i0, j0) is the pixel's position inside its 2×2 cell."""
    b, c, h, w = xp.shape
    xr = xp.reshape(b, c, h // 2, 2, w // 2, 2)
    xr = xr.transpose(0, 2, 4, 1, 3, 5)              # (B, H/2, W/2, C, 2, 2)
    return xr.reshape(b, h // 2, w // 2, c * 4)


def s2d_stem_geometry(k: int) -> Tuple[int, Tuple[int, int]]:
    """(new kernel size, (pad_left, pad_right)) for a k×k/stride-2/pad-k//2
    conv re-expressed over the s2d(2) grid."""
    p = k // 2
    qs = [(ty - p) >> 1 for ty in range(k)]
    q_min, q_max = min(qs), max(qs)
    return q_max - q_min + 1, (-q_min, q_max)


def stem_s2d_kernel_from_dense(w_dense: np.ndarray) -> np.ndarray:
    """Dense stride-2 stem kernel (k, k, C, O) → s2d(2) stride-1 kernel
    (k', k', 4C, O) (k=7 → k'=4 with pad (2,1); k=3 → k'=2 with pad (1,0)).

    Derivation: output pixel o of the dense conv reads input row
    r = 2o − p + ty = 2(o + q) + i0 with q = (ty−p)>>1, i0 = (ty−p)&1 —
    i.e. s2d cell o+q at in-cell phase i0."""
    kh, kw, c, o = w_dense.shape
    assert kh == kw and kh % 2 == 1
    p = kh // 2
    k_new, (pl_, _) = s2d_stem_geometry(kh)
    w_new = np.zeros((k_new, k_new, 4 * c, o), w_dense.dtype)
    for ty in range(kh):
        ka = ((ty - p) >> 1) + pl_
        i0 = (ty - p) & 1
        for tx in range(kw):
            kb = ((tx - p) >> 1) + pl_
            j0 = (tx - p) & 1
            for ci in range(c):
                w_new[ka, kb, ci * 4 + i0 * 2 + j0, :] = w_dense[ty, tx, ci, :]
    return w_new


def build_pyramid_planar(image_nhwc: jax.Array, levels: int,
                         mean: Sequence[float], std: Sequence[float],
                         dtype=jnp.bfloat16) -> List[jax.Array]:
    """Normalized planar pyramid [x, x/2, x/4, ...] ready for the s2d stem."""
    xp = normalize_planar(to_planar(image_nhwc), mean, std, dtype)
    out = [xp]
    for _ in range(1, levels):
        out.append(downsample2x_bicubic_planar(out[-1]))
    return out


_WB = np.array([_T0, _T1, _T1, _T0], np.float64)  # /2 bicubic row filter


def _phase_filter(levels_down: int) -> np.ndarray:
    """Per-s2d-phase row filters for the composed ``levels_down`` bicubic /2
    downsamples followed by s2d(2).

    Returns F of shape (2, taps): F[i, d] is the weight of input row
    ``(stride·a − off) + d`` contributing to s2d phase i of output cell a,
    where stride = 2^(levels_down+1) and off = 2^(levels_down+1) − 2 − 1 …
    computed alongside in ``_phase_geometry``.
    """
    # filter of the composed downsample chain: start with identity (1 tap)
    f = np.array([1.0])
    for _ in range(levels_down):
        # x_next[r] = Σ_e wB[e] · x[2r − 1 + e]  → compose
        nf = np.zeros(2 * (len(f) - 1) + 4 + 1)
        for r_off, w in enumerate(f):
            for e, wb in enumerate(_WB):
                nf[2 * r_off + e] += w * wb
        f = nf
    # two s2d phases: phase i reads the chain shifted by i output rows
    stride_in = 2 ** levels_down
    taps = len(f) + stride_in
    out = np.zeros((2, taps))
    for i in range(2):
        out[i, i * stride_in: i * stride_in + len(f)] = f
    # trim trailing all-zero taps picked up by the composition bookkeeping
    while out.shape[1] > 1 and not out[:, -1].any():
        out = out[:, :-1]
    return out


def _phase_offset(levels_down: int) -> int:
    """Leftmost input row touched by output cell 0 (negative), i.e. the
    required left halo: 0, 1, 3 for levels 0, 1, 2 — in general 2^L − 1."""
    return 2 ** levels_down - 1


def _s2d_chain_kernel(c: int = 3) -> np.ndarray:
    """(4, 4, 4c, 4c) stride-2 conv kernel mapping level L's s2d tensor to
    level L+1's, i.e. s2d ∘ bicubic/2 expressed over s2d cells:
    x_{L+1}[2a+i] = Σ_e wB[e]·x_L[4a+2i−1+e], and row 4a+2i−1+e lives in s2d
    cell (2a+i−1+⌈e/…⌉) — working it out, output phase i reads cells
    2a−1 … 2a+2 (a 4-tap stride-2 window with pad (1, 2))."""
    wb = _WB
    r = np.zeros((2, 4, 2))  # r[i][cell_tap, phase]
    for i in range(2):
        for e in range(4):
            t = 2 * i - 1 + e           # row offset from 4a
            r[i][(t >> 1) + 1, t & 1] += wb[e]
    k = np.zeros((4, 4, 4 * c, 4 * c), np.float32)
    for ci in range(c):
        for i in range(2):
            for j in range(2):
                for ka in range(4):
                    for kb in range(4):
                        for pi in range(2):
                            for pj in range(2):
                                k[ka, kb, ci * 4 + pi * 2 + pj,
                                  ci * 4 + i * 2 + j] = r[i][ka, pi] * r[j][kb, pj]
    return k


_CHAIN_FOLD = 8  # input cells per folded column (4 output pixels per cell)


def _fold_chain_kernel(c: int, fold: int) -> np.ndarray:
    """W-folded form of ``_s2d_chain_kernel``: reshaping the input's W axis
    into channels ((…, W, 4c) → (…, W/fold, fold·4c) — a free row-major
    reshape) turns the stride-(2,2) chain conv into a stride-(2,1) conv whose
    output unfolds back for free ((…, W/(2·fold)... fold/2 outputs per cell).
    Output col a' = (fold/2)·A + q reads padded cols 2q+dx+(fold−1) of cell
    window [A, A+2]. 4c=12, fold=8 → kernel (4, 3, 96, 48): an MXU-shaped
    contraction instead of a 12-lane-starved strided conv (3.5× faster
    measured; bit-exact)."""
    kc = _s2d_chain_kernel(c)
    cc = 4 * c
    fo = fold // 2
    k = np.zeros((4, 3, fold * cc, fo * cc), np.float32)
    for dy in range(4):
        for q in range(fo):
            for dx in range(4):
                pos = 2 * q + dx + (fold - 1)
                cell, ph = pos // fold, pos % fold
                k[dy, cell, ph * cc:(ph + 1) * cc, q * cc:(q + 1) * cc] += kc[dy, dx]
    return k


def fused_pyramid_s2d(image: jax.Array, levels: int,
                      mean, std, dtype=jnp.bfloat16):
    """Normalize + bicubic pyramid + s2d(2) for every level, with the minimum
    of small-channel work:

    - level 0: host-packed s2d input (``s2d_pack``) is just normalized;
      NHWC/planar inputs pay one reshape-transpose s2d (~6.5 ms at batch-8
      2048×1024 — feed s2d-packed batches on the hot serving path);
    - levels 1+: one W-folded stride-(2,1) conv each (the bicubic /2 composed
      with s2d over s2d cells — ``_fold_chain_kernel``), on edge-padded cells.

    Border note: edge replication over s2d *cells* replicates 2-pixel blocks,
    so the outermost 1-2 pixels of levels ≥ 1 deviate slightly from the
    reference's per-pixel replication (interior is exact — see tests).
    Returns [(B, H/2^{L+1}, W/2^{L+1}, 12)] for L in [0, levels).
    """
    if is_s2d_image(image):
        # host-packed s2d input: normalize with the per-original-channel
        # constants replicated over the 4 in-cell phases (channel c*4+phase)
        c = image.shape[-1] // 4
        mean12 = jnp.repeat(jnp.asarray(mean, jnp.float32), 4)
        std12 = jnp.repeat(jnp.asarray(std, jnp.float32), 4)
        s0 = ((image - mean12) / std12).astype(dtype)
    else:
        if is_planar_image(image):
            image = image.transpose(0, 2, 3, 1)
        b, h, w, c = image.shape
        mean_a = jnp.asarray(mean, jnp.float32)
        std_a = jnp.asarray(std, jnp.float32)

        xn = ((image - mean_a) / std_a).astype(dtype)
        s0 = xn.reshape(b, h // 2, 2, w // 2, 2, c) \
               .transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, 4 * c)

    cc = 4 * c
    fold, fo = _CHAIN_FOLD, _CHAIN_FOLD // 2
    kf = jnp.asarray(_fold_chain_kernel(c, fold), dtype)
    kc = jnp.asarray(_s2d_chain_kernel(c), dtype)
    outs = [s0]
    cur = s0
    for _ in range(1, levels):
        b, h, w, _ = cur.shape
        if w % fold == 0 and (w // 2) % fo == 0:
            p = jnp.pad(cur, ((0, 0), (1, 2), (fold, fold), (0, 0)), mode="edge")
            pf = p.reshape(b, h + 3, (w + 2 * fold) // fold, fold * cc)
            y = jax.lax.conv_general_dilated(
                pf, kf, (2, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            cur = y[:, :, :(w // 2) // fo, :].reshape(
                b, h // 2, w // 2, cc).astype(dtype)
        else:  # tiny widths (test shapes): plain strided form
            padded = jnp.pad(cur, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="edge")
            cur = jax.lax.conv_general_dilated(
                padded, kc, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
        outs.append(cur)
    return outs


def s2d_planar_from_image(image: jax.Array, mean, std,
                          dtype=jnp.bfloat16) -> jax.Array:
    """Normalized level-0 s2d in planar layout (B, 12, H/2, W/2) — the input
    of the fused Pallas stem (``ops/stem_pallas.py``), whose HBM slabs must
    be channel-on-sublane to be DMA-sliceable."""
    if is_planar_image(image):
        image = image.transpose(0, 2, 3, 1)
    b, h, w, c = image.shape
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    xn = ((image - mean_a) / std_a).astype(dtype)
    xr = xn.reshape(b, h // 2, 2, w // 2, 2, c)
    # (b, c, i, j, h2, w2) → channel order c*4 + i*2 + j
    return xr.transpose(0, 5, 2, 4, 1, 3).reshape(b, 4 * c, h // 2, w // 2)


def upsample4x_argmax(logits_nhwc: jax.Array) -> jax.Array:
    """argmax over classes of the ×4 bilinear-upsampled logits, computed in
    planar layout so the channel reduction runs over full lanes.
    (B, h, w, C) → (B, 4h, 4w) int32. Equals
    ``argmax(resize_bilinear(logits, 4x))`` up to dtype."""
    lp = logits_nhwc.transpose(0, 3, 1, 2)  # (B, C, h, w)

    def up4(v, axis):
        n = v.shape[axis]
        pad = [(0, 0)] * v.ndim
        pad[axis] = (1, 1)
        vp = jnp.pad(v, pad, mode="edge")
        prev = jax.lax.slice_in_dim(vp, 0, n, axis=axis)
        cur = jax.lax.slice_in_dim(vp, 1, n + 1, axis=axis)
        nxt = jax.lax.slice_in_dim(vp, 2, n + 2, axis=axis)
        phases = []
        for r in range(4):
            off = (r + 0.5) / 4 - 0.5
            if off < 0:
                phases.append((-off) * prev + (1.0 + off) * cur)
            else:
                phases.append((1.0 - off) * cur + off * nxt)
        st = jnp.stack(phases, axis=axis + 1)
        shape = list(v.shape)
        shape[axis] = 4 * n
        return st.reshape(shape)

    lp = up4(lp, 2)
    lp = up4(lp, 3)
    return jnp.argmax(lp, axis=1).astype(jnp.int32)
