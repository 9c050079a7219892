"""On-device Euclidean distance transform via jump flooding.

The reference computes per-class EDT boundary weights on the host with
``cv2.distanceTransform`` inside the DataLoader workers
(``custom_transforms_acdc.py:656-693``) — run twice per sample under
TwoCropTransform, it is the host pipeline's heaviest stage (SURVEY "hard
parts"). This module provides the device-side equivalent so augmentation can
run fully on-TPU: the jump-flooding algorithm (JFA) propagates
nearest-background-seed coordinates in O(log N) rounds of static shifted
comparisons — no gathers, no data-dependent shapes.

``label_boundary_weights`` reproduces the full LabelBoundaryTransform:
per-class distances (distance to the nearest pixel OUTSIDE the class), summed
over classes, σ-normalized, exp(−d/2σ), zero at ignore pixels. Distances are
exact Euclidean (cv2's maskSize=3 is a chamfer approximation, so values can
differ by <2% on long diagonals — tests bound the deviation).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

BIG = jnp.float32(1e9)


def _jfa_pass(best_y, best_x, best_d2, step: int):
    """One jump-flood round: each pixel adopts a neighbor's seed if closer."""
    h, w = best_y.shape[-2], best_y.shape[-1]
    yy = jax.lax.broadcasted_iota(jnp.float32, best_y.shape, best_y.ndim - 2)
    xx = jax.lax.broadcasted_iota(jnp.float32, best_y.shape, best_y.ndim - 1)
    for dy in (-step, 0, step):
        for dx in (-step, 0, step):
            if dy == 0 and dx == 0:
                continue
            cand_y = jnp.roll(best_y, (dy, dx), axis=(-2, -1))
            cand_x = jnp.roll(best_x, (dy, dx), axis=(-2, -1))
            # rolled-in wrap regions are invalidated by marking them far away
            valid = jnp.ones_like(best_y, dtype=bool)
            if dy > 0:
                valid = valid & (yy >= dy)
            elif dy < 0:
                valid = valid & (yy < h + dy)
            if dx > 0:
                valid = valid & (xx >= dx)
            elif dx < 0:
                valid = valid & (xx < w + dx)
            cand_d2 = (yy - cand_y) ** 2 + (xx - cand_x) ** 2
            cand_d2 = jnp.where(valid & (cand_y < BIG), cand_d2, BIG * BIG)
            better = cand_d2 < best_d2
            best_y = jnp.where(better, cand_y, best_y)
            best_x = jnp.where(better, cand_x, best_x)
            best_d2 = jnp.where(better, cand_d2, best_d2)
    return best_y, best_x, best_d2


def distance_transform(mask: jax.Array) -> jax.Array:
    """Euclidean distance from each True pixel to the nearest False pixel
    (0 at False pixels) — the semantics of ``cv2.distanceTransform``.

    mask: (..., H, W) bool. Returns (..., H, W) float32.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    yy = jax.lax.broadcasted_iota(jnp.float32, mask.shape, mask.ndim - 2)
    xx = jax.lax.broadcasted_iota(jnp.float32, mask.shape, mask.ndim - 1)
    # seeds are the background (False) pixels
    best_y = jnp.where(~mask, yy, BIG)
    best_x = jnp.where(~mask, xx, BIG)
    best_d2 = jnp.where(~mask, 0.0, BIG * BIG)

    step = 1
    steps = []
    while step < max(h, w):
        steps.append(step)
        step *= 2
    # JFA+1: standard rounds from large to small, plus a final step-1 pass
    for s in reversed(steps):
        best_y, best_x, best_d2 = _jfa_pass(best_y, best_x, best_d2, s)
    best_y, best_x, best_d2 = _jfa_pass(best_y, best_x, best_d2, 1)

    d = jnp.sqrt(jnp.where(best_d2 >= BIG, 0.0, best_d2))
    # pixels with no background anywhere (all-True mask): cv2 returns large
    # distances; the boundary-weight path never hits this (σ guard handles it)
    return jnp.where(mask, d, 0.0)


def nearest_diff_label_distance(labels: jax.Array) -> jax.Array:
    """Distance from each pixel to the nearest pixel with a DIFFERENT label
    (0 if no such pixel exists). labels (..., H, W) int → (..., H, W) f32.

    Label-carrying jump flood: state is one seed (coords + distance² + seed
    label) per pixel; a pixel adopts a neighbor's stored seed, or the
    neighbor pixel itself, whenever the candidate's label differs from its
    own and it is closer. One JFA over the whole label map replaces
    ``num_classes`` independent per-mask floods (the summed per-class EDT at
    pixel p reduces exactly to d_{label(p)}(p): p belongs only to its own
    class mask, so every other class contributes 0 there) — ~19× less HBM
    traffic on the 19-class ACDC path, which made the vmapped form the
    dominant cost of the on-device augmentation step.
    """
    h, w = labels.shape[-2], labels.shape[-1]
    yy = jax.lax.broadcasted_iota(jnp.float32, labels.shape, labels.ndim - 2)
    xx = jax.lax.broadcasted_iota(jnp.float32, labels.shape, labels.ndim - 1)
    lbl = labels.astype(jnp.int32)

    best_y = jnp.full_like(yy, BIG)
    best_x = jnp.full_like(xx, BIG)
    best_d2 = jnp.full_like(yy, BIG * BIG)
    best_l = jnp.full_like(lbl, -1)

    def one_pass(state, step: int):
        best_y, best_x, best_d2, best_l = state
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                valid = jnp.ones(labels.shape, dtype=bool)
                if dy > 0:
                    valid = valid & (yy >= dy)
                elif dy < 0:
                    valid = valid & (yy < h + dy)
                if dx > 0:
                    valid = valid & (xx >= dx)
                elif dx < 0:
                    valid = valid & (xx < w + dx)
                # (a) the neighbor's stored seed
                cand_y = jnp.roll(best_y, (dy, dx), axis=(-2, -1))
                cand_x = jnp.roll(best_x, (dy, dx), axis=(-2, -1))
                cand_l = jnp.roll(best_l, (dy, dx), axis=(-2, -1))
                cand_d2 = (yy - cand_y) ** 2 + (xx - cand_x) ** 2
                ok = valid & (cand_y < BIG) & (cand_l != lbl)
                cand_d2 = jnp.where(ok, cand_d2, BIG * BIG)
                better = cand_d2 < best_d2
                best_y = jnp.where(better, cand_y, best_y)
                best_x = jnp.where(better, cand_x, best_x)
                best_l = jnp.where(better, cand_l, best_l)
                best_d2 = jnp.where(better, cand_d2, best_d2)
                # (b) the neighbor pixel itself is a site of its own label
                nb_l = jnp.roll(lbl, (dy, dx), axis=(-2, -1))
                d2 = jnp.float32(dy * dy + dx * dx)
                ok2 = valid & (nb_l != lbl) & (d2 < best_d2)
                best_y = jnp.where(ok2, yy - dy, best_y)
                best_x = jnp.where(ok2, xx - dx, best_x)
                best_l = jnp.where(ok2, nb_l, best_l)
                best_d2 = jnp.where(ok2, d2, best_d2)
        return best_y, best_x, best_d2, best_l

    step = 1
    steps = []
    while step < max(h, w):
        steps.append(step)
        step *= 2
    state = (best_y, best_x, best_d2, best_l)
    for s in reversed(steps):
        state = one_pass(state, s)
    state = one_pass(state, 1)
    best_d2 = state[2]
    return jnp.sqrt(jnp.where(best_d2 >= BIG, 0.0, best_d2))


def label_boundary_weights(labels: jax.Array, num_classes: int,
                           ignore_id: int = 255) -> jax.Array:
    """Device-side ``LabelBoundaryTransform`` (reference
    ``custom_transforms_acdc.py:656-693``): per-class EDT summed, exp(−d/2σ),
    zero at ignore. labels (..., H, W) int → weights (..., H, W) float32.

    The per-class sum collapses to one label-aware flood
    (``nearest_diff_label_distance``): a pixel appears in exactly one class
    mask, so the sum at p is just p's own-class distance — the distance to
    the nearest differently-labeled pixel (ignore pixels count as background
    for every class, exactly as ``labels == c`` makes them). Pixels whose
    label is outside [0, num_classes) belong to no mask and contribute 0,
    matching the reference's weight of exp(0)=1 there (ignore itself is
    zeroed at the end)."""
    d = nearest_diff_label_distance(labels)
    in_range = (labels >= 0) & (labels < num_classes)
    summed = jnp.where(in_range, d, 0.0)
    reduce_axes = tuple(range(labels.ndim - 2, labels.ndim))
    std = jnp.std(summed, axis=reduce_axes, keepdims=True)
    std = jnp.where(std == 0, 1.0, std)  # all-ignore guard (reference :681-684)
    weights = jnp.exp(-summed / (2.0 * std))
    return jnp.where(labels == ignore_id, 0.0, weights)
