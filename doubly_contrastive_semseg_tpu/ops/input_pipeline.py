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
    channel order c*4 + i0*2 + j0 (matches ``space_to_depth2_nhwc``).

    Four strided slice-assignments instead of one 6-D transpose copy: 1.6×
    faster (344 vs 528 ms for bs 8 @ 2048×1024 on the 1-core dev box, vs a
    192 ms plain-memcpy floor for the same bytes — ``scripts/
    bench_host_pipeline.py`` prints the floor alongside)."""
    b, h, w, c = img_nhwc.shape
    out = np.empty((b, h // 2, w // 2, 4 * c), img_nhwc.dtype)
    for i0 in range(2):
        for j0 in range(2):
            out[..., (i0 * 2 + j0)::4] = img_nhwc[:, i0::2, j0::2, :]
    return out


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


# ---- level-0 channel order -------------------------------------------------
# Host-packed s2d input keeps the historical c-major order (c*4 + dy*2 + dx,
# matching ``s2d_pack``). Device-side NHWC/planar inputs produce level 0 in
# DY-MAJOR order (dy*2c + dx*c + ci): the even/odd H-row views of an NHWC
# image ARE its dy-major s2d halves after a free row-major (W, C) → (W/2, 2C)
# minor-dim merge, so the relayout is two strided row copies + one lane
# concat — measured 2.36 ms vs 7.11 ms for the 6-D transpose form at
# (8, 1024, 2048, 3) bf16, exactly the elementwise copy floor at that shape
# (2.35 ms; ``scripts/bench_s2d_relayout.py``). Consumers absorb the order as
# a free static permutation of their conv kernels' input-channel axis
# (``stem_kernel_for_level0``); levels ≥ 1 are conv OUTPUTS and stay c-major.


def s2d_dymajor_to_cmajor_perm(c: int = 3) -> np.ndarray:
    """P with ``s0_dymajor[..., k] == s0_cmajor[..., P[k]]``:
    P[dy*2c + dx*c + ci] = ci*4 + dy*2 + dx."""
    return np.array([ci * 4 + dy * 2 + dx
                     for dy in range(2) for dx in range(2) for ci in range(c)])


def stem_kernel_for_level0(kernel: jax.Array, image) -> jax.Array:
    """Permute an s2d stem kernel's input-channel axis to match the level-0
    channel order :func:`fused_pyramid_s2d` produces for this input layout
    (identity for host-packed s2d batches; dy-major gather otherwise). The
    gather is a trace-time-static reindex of a tiny weight tensor — XLA folds
    it into the conv's weight prep, and its VJP scatters gradients back to
    the stored c-major parameter, so checkpoints/torch-convert never see it."""
    if is_s2d_image(image):
        return kernel
    c = kernel.shape[2] // 4
    return jnp.take(kernel, jnp.asarray(s2d_dymajor_to_cmajor_perm(c)), axis=2)


def level0_to_cmajor(p0: jax.Array, image) -> jax.Array:
    """Convert :func:`fused_pyramid_s2d`'s level-0 output to c-major channel
    order regardless of input layout — for consumers that cannot absorb the
    dy-major order into their own weights (e.g. a stem held inside
    ``nn.Conv``). Costs one fused 12-channel lane gather (~0.5 ms at batch-8
    2048×1024); the flagship path uses ``stem_kernel_for_level0`` instead."""
    if is_s2d_image(image):
        return p0
    c = p0.shape[-1] // 4
    inv = np.argsort(s2d_dymajor_to_cmajor_perm(c))
    return jnp.take(p0, jnp.asarray(inv), axis=-1)


def _perm_in_channels_dymajor(k: np.ndarray, c: int) -> np.ndarray:
    """Re-map a (Kh, Kw, n·4c, O) level kernel built for c-major s2d input to
    read dy-major input (each W-fold phase's 4c block permuted identically)."""
    P = s2d_dymajor_to_cmajor_perm(c)
    cc = 4 * c
    n = k.shape[2] // cc
    idx = (np.arange(n)[:, None] * cc + P[None, :]).ravel()
    return k[:, :, idx, :]


def s2d_unpack(x: jax.Array) -> jax.Array:
    """Inverse of :func:`s2d_pack` on device: (B, H/2, W/2, 4C) → (B, H, W, C).
    Used when a host-packed s2d batch reaches a module that needs the plain
    NHWC image (e.g. refinement heads that concat the image with disparity)."""
    b, h2, w2, cc = x.shape
    c = cc // 4
    xr = x.reshape(b, h2, w2, c, 2, 2)                # (..., C, i0, j0)
    xr = xr.transpose(0, 1, 4, 2, 5, 3)               # (B, H/2, i0, W/2, j0, C)
    return xr.reshape(b, 2 * h2, 2 * w2, c)


def stem_s2d_fold(w_dense: jax.Array) -> jax.Array:
    """Traced-jnp version of :func:`stem_s2d_kernel_from_dense`: fold a dense
    (k, k, C, O) stride-2 stem kernel into the s2d(2) stride-1 form
    (k', k', 4C, O) at apply time (the dense params stay the checkpoint /
    torch-convert source of truth; the fold is a tiny static scatter XLA
    hoists out of the convolution)."""
    kh, kw, c, o = w_dense.shape
    p = kh // 2
    k_new, (pl_, _) = s2d_stem_geometry(kh)
    ci = np.arange(c)
    w_new = jnp.zeros((k_new, k_new, 4 * c, o), w_dense.dtype)
    for ty in range(kh):
        ka, i0 = ((ty - p) >> 1) + pl_, (ty - p) & 1
        for tx in range(kw):
            kb, j0 = ((tx - p) >> 1) + pl_, (tx - p) & 1
            w_new = w_new.at[ka, kb, ci * 4 + i0 * 2 + j0, :].set(
                w_dense[ty, tx, :, :])
    return w_new


def s2d_stem_geometry(k: int) -> Tuple[int, Tuple[int, int]]:
    """(new kernel size, (pad_left, pad_right)) for a k×k/stride-2/pad-k//2
    conv re-expressed over the s2d(2) grid."""
    p = k // 2
    qs = [(ty - p) >> 1 for ty in range(k)]
    q_min, q_max = min(qs), max(qs)
    return q_max - q_min + 1, (-q_min, q_max)


def stem_s2d_mask(k: int, c: int = 3) -> np.ndarray:
    """(k', k', 4c, 1) 0/1 mask of the s2d slots a dense k×k kernel can
    occupy. The s2d form's footprint is a full 2k'×2k' square in the original
    domain — larger than the dense k×k — so (4k'²−k²)·c slots per output
    channel are structurally zero. Training must keep them zero (the torch
    reference has no such taps to update), so the model multiplies the stored
    kernel by this mask: their gradients vanish identically and the trained
    function class matches the reference's dense stem exactly."""
    p = k // 2
    k_new, (pl_, _) = s2d_stem_geometry(k)
    m = np.zeros((k_new, k_new, 4 * c, 1), np.float32)
    for ty in range(k):
        ka, i0 = ((ty - p) >> 1) + pl_, (ty - p) & 1
        for tx in range(k):
            kb, j0 = ((tx - p) >> 1) + pl_, (tx - p) & 1
            for ci in range(c):
                m[ka, kb, ci * 4 + i0 * 2 + j0, 0] = 1.0
    return m


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
    """Normalized planar pyramid [x, x/2, x/4, ...] ready for the s2d stem —
    each level computed directly from the full image (reference
    ``resnet_pyramid.py:306-314`` semantics)."""
    from .interpolate import downsample_bicubic_direct

    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    xn = ((image_nhwc - mean_a) / std_a).astype(dtype)
    return [to_planar(downsample_bicubic_direct(xn, l)) for l in range(levels)]


_WB = np.array([_T0, _T1, _T1, _T0], np.float64)  # /2 bicubic row filter


def _direct_level_kernel(level: int, c: int = 3) -> np.ndarray:
    """s2d-domain kernel computing pyramid level L (>= 1) DIRECTLY from the
    level-0 s2d tensor — the reference semantics: each level is
    ``F.interpolate(image, scale_factor=2^-L, mode='bicubic')`` from the
    full-res image (``resnet_pyramid.py:306-314``), i.e. a 4-tap
    point-sampled cubic at stride 2^L, NOT an iterated /2 chain (those
    differ from level 2 on; proven against torch in tests).

    Output pixel p of level L reads input rows 2^L*p + 2^(L-1) - 2 + e,
    e in [0, 4), with weights ``_WB`` (torch taps at distances ±0.5, ±1.5).
    Over s2d cells (2 rows each, out phase i, in phase t&1):
    L=1 -> window cells [-1..2]: kernel 4, stride 2, pad (1, 2);
    L>=2 -> window cells [0..2^L-1]: kernel 2^L, stride 2^L, NO padding
    (the 4-tap window never leaves the output cell's own input span).
    Layout: channel index = c*4 + dy*2 + dx on both sides.
    """
    s = 2 ** level
    off = 2 ** (level - 1) - 2
    shift = 1 if level == 1 else 0
    K = 4 if level == 1 else s
    cc = 4 * c
    k = np.zeros((K, K, cc, cc), np.float32)
    for i in range(2):
        for e in range(4):
            t = s * i + off + e
            ca, pa, wa = (t >> 1) + shift, t & 1, _WB[e]
            for j in range(2):
                for f in range(4):
                    u = s * j + off + f
                    cb, pb, wb = (u >> 1) + shift, u & 1, _WB[f]
                    for ci in range(c):
                        k[ca, cb, ci * 4 + pa * 2 + pb,
                          ci * 4 + i * 2 + j] += wa * wb
    return k


_CHAIN_FOLD = 8  # input cells per folded column


def _fold_level_kernel(level: int, c: int, fold: int) -> np.ndarray:
    """W-folded form of ``_direct_level_kernel``: reshaping the input's W
    axis into channels ((…, W, 4c) -> (…, W/fold, fold*4c), a free row-major
    reshape) turns the stride-(s, s) tiny-channel conv into a stride-(s, 1)
    MXU-shaped contraction; the output unfolds back for free.

    L=1: out col b = 4B + q reads cells 8B + 2q + (dxc - 1); with one folded
    pad column each side, folded col = 1 + (2q + dxc - 1)//8 in [0, 2] ->
    kernel (4, 3, 8*cc, 4*cc), strides (2, 1).
    L=2: out col b = 2B + q reads cells 8B + 4q + dxc, all inside folded col
    B -> kernel (4, 1, 8*cc, 2*cc), strides (4, 1), no padding.
    """
    kd = _direct_level_kernel(level, c)
    cc = 4 * c
    s = 2 ** level
    g = fold // s
    K = kd.shape[0]
    if level == 1:
        kf = np.zeros((K, 3, fold * cc, g * cc), np.float32)
        for q in range(g):
            for dxc in range(K):
                pos = 2 * q + dxc - 1 + fold
                kb, ph = pos // fold, pos % fold
                kf[:, kb, ph * cc:(ph + 1) * cc, q * cc:(q + 1) * cc] += kd[:, dxc]
        return kf
    assert level == 2 and fold == 2 * s
    kf = np.zeros((K, 1, fold * cc, g * cc), np.float32)
    for q in range(g):
        for dxc in range(K):
            ph = s * q + dxc
            kf[:, 0, ph * cc:(ph + 1) * cc, q * cc:(q + 1) * cc] += kd[:, dxc]
    return kf


def _cell_phase_perm(c: int, dy: int = None, dx: int = None,
                     dymajor: bool = False) -> np.ndarray:
    """Channel permutation pinning an s2d cell's in-cell row (dy) and/or
    column (dx) phase — used to build border cells with torch's per-PIXEL
    clamp semantics (replicating whole 2-pixel cells would shift the edge).
    ``dymajor`` selects the channel convention of the tensor being padded."""
    cc = 4 * c
    perm = np.arange(cc)
    for idx in range(cc):
        if dymajor:
            py, rem = divmod(idx, 2 * c)
            px, ci = divmod(rem, c)
        else:
            ci, rem = divmod(idx, 4)
            py, px = rem >> 1, rem & 1
        if dy is not None:
            py = dy
        if dx is not None:
            px = dx
        perm[idx] = (py * 2 * c + px * c + ci) if dymajor \
            else (ci * 4 + py * 2 + px)
    return perm


def _merged_level12_kernel(c: int = 3, fold: int = _CHAIN_FOLD) -> np.ndarray:
    """Levels 1 AND 2 as ONE stride-(4, 1) conv over the clamp-padded,
    W-folded level-0 tensor.

    Separately, the W-folded level kernels run at poor MXU utilization
    (48 / 24 output channels against 128 lanes). Each stride-4 row block of
    the padded input contains everything both levels need: level-1 output
    cell rows 2A and 2A+1 read padded rows 4A+0..5 (kernel rows 2r + o),
    level-2 output cell row A reads padded rows 4A+1..4 — so one kernel
    (6, 3, fold·cc, 10·cc) emits [2 level-1 row-phases × 4 cols | 2 level-2
    cols] = 120 output channels (94% lane use) in a single pass over the
    input. Outputs un-fold with one cheap (…, 2, Wf, …) transpose for
    level 1 and a free reshape for level 2."""
    cc = 4 * c
    k1 = _direct_level_kernel(1, c)  # (4, 4, cc, cc); indices include pad 1
    k2 = _direct_level_kernel(2, c)  # (4, 4, cc, cc); no padding
    K = np.zeros((6, 3, fold * cc, 10 * cc), np.float32)
    for r in range(2):              # level-1 out cell row within the pair
        for ka in range(4):
            for q in range(4):      # level-1 out cell col within the fold
                for cb in range(4):
                    pos = 2 * q + cb + fold - 1   # cb includes the +1 pad
                    kb, ph = pos // fold, pos % fold
                    K[2 * r + ka, kb, ph * cc:(ph + 1) * cc,
                      (r * 4 + q) * cc:(r * 4 + q + 1) * cc] += k1[ka, cb]
    for ka in range(4):             # level 2: rows 4A+1..4, center folded col
        for q2 in range(2):
            for cb in range(4):
                ph = 4 * q2 + cb
                K[1 + ka, 1, ph * cc:(ph + 1) * cc,
                  (8 + q2) * cc:(8 + q2 + 1) * cc] += k2[ka, cb]
    return K


def _clamp_pad(x: jax.Array, c: int, w_left: int, w_right: int,
               dymajor: bool = False) -> jax.Array:
    """Pad cells (1, 2) in H and (w_left, w_right) in W with torch's
    per-PIXEL clamp semantics: the top pad cell must read row 0 (phase
    dy=0), the bottom ones row H−1, and only the innermost W pad cell on
    each side is ever read by the level-1 window, so tiling the exact cell
    keeps the fill trivially correct. Corner cells pick up both phase fixes
    because the W strips are cut from the H-padded tensor.

    Two full-tensor concatenates; measured faster than the
    pad-then-dynamic-update-slice alternative (XLA lowers the strip updates
    as whole-buffer copies: 4.2 ms vs 2.9 ms at batch-8 2048×1024)."""
    py0 = jnp.asarray(_cell_phase_perm(c, dy=0, dymajor=dymajor))
    py1 = jnp.asarray(_cell_phase_perm(c, dy=1, dymajor=dymajor))
    px0 = jnp.asarray(_cell_phase_perm(c, dx=0, dymajor=dymajor))
    px1 = jnp.asarray(_cell_phase_perm(c, dx=1, dymajor=dymajor))
    top = jnp.take(x[:, :1], py0, axis=-1)
    bot = jnp.take(x[:, -1:], py1, axis=-1)
    xh = jnp.concatenate([top, x, bot, bot], axis=1)
    left = jnp.take(xh[:, :, :1], px0, axis=-1)
    right = jnp.take(xh[:, :, -1:], px1, axis=-1)
    return jnp.concatenate([left] * w_left + [xh] + [right] * w_right, axis=2)


def fused_pyramid_s2d(image: jax.Array, levels: int,
                      mean, std, dtype=jnp.bfloat16):
    """Normalize + bicubic pyramid + s2d(2) for every level, with the minimum
    of small-channel work:

    - level 0: host-packed s2d input (``s2d_pack``) is just normalized
      (c-major channel order); NHWC/planar inputs build level 0 in DY-MAJOR
      order from the even/odd H-row views — a pure bandwidth copy (2.36 ms
      at batch-8 2048×1024 bf16, the elementwise floor; the old 6-D
      transpose form cost 7.11 ms) — and every level kernel below reads it
      through a static input-channel permutation. Callers permute their
      level-0 stem kernel with ``stem_kernel_for_level0``.
    - levels >= 1: ONE W-folded conv each, directly from level 0
      (``_fold_level_kernel``) — matching the reference's
      direct-from-full-res ``F.interpolate(scale_factor=2^-L)`` semantics
      bit-for-bit, including torch's per-pixel border clamp
      (``_clamp_pad``); level 2+ needs no padding at all. Their OUTPUT
      channel order is c-major for every input layout.

    Returns [(B, H/2^{L+1}, W/2^{L+1}, 12)] for L in [0, levels).
    """
    dymajor = False
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
        # dy-major s2d: channel = dy*2c + dx*c + ci. The (W, C) -> (W/2, 2C)
        # reshape merges minor dims (row-major-free); normalize fuses into
        # the concat's writes (constants tiled to the dy-major order).
        even = image[:, 0::2].reshape(b, h // 2, w // 2, 2 * c)
        odd = image[:, 1::2].reshape(b, h // 2, w // 2, 2 * c)
        s0raw = jnp.concatenate([even, odd], axis=-1)
        mean12 = jnp.tile(jnp.asarray(mean, jnp.float32), 4)
        std12 = jnp.tile(jnp.asarray(std, jnp.float32), 4)
        s0 = ((s0raw - mean12) / std12).astype(dtype)
        dymajor = True

    cc = 4 * c
    fold = _CHAIN_FOLD
    outs = [s0]
    b, h2, w2 = s0.shape[0], s0.shape[1], s0.shape[2]
    Wf = w2 // fold if w2 % fold == 0 else 0

    if levels == 3 and Wf and h2 % 4 == 0 and (w2 // 2) % 4 == 0:
        # one merged pass for levels 1+2 (see _merged_level12_kernel)
        Km = _merged_level12_kernel(c, fold)
        if dymajor:
            Km = _perm_in_channels_dymajor(Km, c)
        K = jnp.asarray(Km, dtype)
        P = _clamp_pad(s0, c, fold, fold, dymajor=dymajor)
        Pf = P.reshape(b, h2 + 3, Wf + 2, fold * cc)
        y = jax.lax.conv_general_dilated(
            Pf, K, (4, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dtype)
        h4 = h2 // 4
        y1 = y[..., :8 * cc].reshape(b, h4, Wf, 2, 4 * cc)
        y1 = jnp.transpose(y1, (0, 1, 3, 2, 4)).reshape(b, h2 // 2, w2 // 2, cc)
        y2 = y[..., 8 * cc:].reshape(b, h4, w2 // 4, cc)
        return [s0, y1, y2]

    for lv in range(1, levels):
        h2, w2 = s0.shape[1], s0.shape[2]
        s = 2 ** lv
        foldable = lv <= 2 and w2 % fold == 0 and (w2 // s) % (fold // s) == 0
        if foldable:
            g = fold // s
            kf_np = _fold_level_kernel(lv, c, fold)
            if dymajor:
                kf_np = _perm_in_channels_dymajor(kf_np, c)
            kf = jnp.asarray(kf_np, dtype)
            if lv == 1:
                x = _clamp_pad(s0, c, fold, fold, dymajor=dymajor)
                xf = x.reshape(b, h2 + 3, (w2 + 2 * fold) // fold, fold * cc)
                y = jax.lax.conv_general_dilated(
                    xf, kf, (2, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                y = y[:, :, : (w2 // 2) // g, :]
            else:
                xf = s0.reshape(b, h2, w2 // fold, fold * cc)
                y = jax.lax.conv_general_dilated(
                    xf, kf, (s, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
            cur = y.reshape(b, h2 // s, w2 // s, cc).astype(dtype)
        else:  # plain strided form (tiny widths / levels > 2)
            kd_np = _direct_level_kernel(lv, c)
            if dymajor:
                kd_np = _perm_in_channels_dymajor(kd_np, c)
            kd = jnp.asarray(kd_np, dtype)
            x = s0
            if lv == 1:
                x = _clamp_pad(s0, c, 1, 2, dymajor=dymajor)
            cur = jax.lax.conv_general_dilated(
                x, kd, (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
        outs.append(cur)
    return outs


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
