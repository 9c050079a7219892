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


def label_boundary_weights(labels: jax.Array, num_classes: int,
                           ignore_id: int = 255) -> jax.Array:
    """Device-side ``LabelBoundaryTransform`` (reference
    ``custom_transforms_acdc.py:656-693``): per-class EDT summed, exp(−d/2σ),
    zero at ignore. labels (..., H, W) int → weights (..., H, W) float32.

    Classes ride a vmapped leading axis (one batched jump-flood over all
    class masks) — a per-class python loop would unroll ~19× the JFA graph
    and blow up compile time."""
    cls = jnp.arange(num_classes)
    masks = labels[None] == cls.reshape((num_classes,) + (1,) * labels.ndim)
    present = jnp.any(masks, axis=(-2, -1), keepdims=True)
    dists = jax.vmap(distance_transform)(masks)           # (C, ..., H, W)
    summed = jnp.sum(jnp.where(present, dists, 0.0), axis=0)
    reduce_axes = tuple(range(labels.ndim - 2, labels.ndim))
    std = jnp.std(summed, axis=reduce_axes, keepdims=True)
    std = jnp.where(std == 0, 1.0, std)  # all-ignore guard (reference :681-684)
    weights = jnp.exp(-summed / (2.0 * std))
    return jnp.where(labels == ignore_id, 0.0, weights)
