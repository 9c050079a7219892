"""Pixel-level supervised contrastive loss with hard-anchor sampling.

Static-shape, jittable re-design of reference ``utils/loss.py:250-415``
(PixelContrastLoss, following Wang et al., "Exploring Cross-Image Pixel
Contrast for Semantic Segmentation").

The reference's ``_hard_anchor_sampling`` (``loss.py:264-337``) walks
python loops over batch × present-classes with data-dependent ``nonzero()``
and ``randperm`` — unjittable and host-sync heavy. Here the same sampling
*distribution* is expressed with fixed shapes:

- anchors are the (B × num_classes) grid; an anchor (b, c) is VALID iff class
  c has **more than** ``max_views`` pixels in image b at feature resolution
  (reference ``loss.py:282``);
- per valid anchor, ``n_view = 2`` pixels are drawn (the reference computes
  ``n_view = min(1024 // total_classes, 2)`` which is 2 for every feasible
  batch size ≤ 26, ``loss.py:290-291``):
  one random *hard* (pred ≠ gt) + one random *easy* (pred = gt) pixel when
  both kinds exist; otherwise two random pixels of whichever kind exists
  (``loss.py:314-322``). Uniform sampling without replacement is realized by
  a top-2 over i.i.d. uniform keys restricted to each mask.
- invalid anchors are carried through the contrast matrix with a validity
  mask: they contribute nothing to numerators, denominators, or the mean.

The contrast itself mirrors ``_contrastive`` (``loss.py:339-389``) including
its explicit negative-mask denominator ``exp(l_ij) + Σ_neg exp`` and the
row-L2 normalization of the logits matrix (``loss.py:366``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.interpolate import resize_nearest

NEG_INF = -1e30


def _hard_anchor_sampling(
    feats: jax.Array,       # (B, P, D)
    labels: jax.Array,      # (B, P) int
    preds: jax.Array,       # (B, P) int
    num_classes: int,
    rng: jax.Array,
    max_views: int = 2,
    deterministic_select: bool = False,
):
    """Returns (anchor_feats (B*C, 2, D), anchor_labels (B*C,), valid (B*C,))."""
    b, p, d = feats.shape
    cls = jnp.arange(num_classes, dtype=labels.dtype)

    onehot = labels[:, None, :] == cls[None, :, None]            # (B, C, P)
    hard = onehot & (preds[:, None, :] != cls[None, :, None])    # pred wrong
    easy = onehot & (preds[:, None, :] == cls[None, :, None])    # pred right

    count = jnp.sum(onehot, axis=-1)                             # (B, C)
    valid = count > max_views                                    # loss.py:282

    if deterministic_select:
        # A/B parity mode (--reference_rng): prefer the SMALLEST raster
        # index in each mask — exactly what the reference program picks when
        # its torch.randperm is pinned to the identity permutation by the
        # A/B driver (hard/easy nonzero() lists are raster-ordered,
        # loss.py:308-331). Top-2 of descending-index keys == first two
        # indices of each mask.
        r = -jax.lax.broadcasted_iota(jnp.float32, (b, num_classes, p), 2)
    else:
        r = jax.random.uniform(rng, (b, num_classes, p))
    hard_keys = jnp.where(hard, r, NEG_INF)
    easy_keys = jnp.where(easy, r, NEG_INF)
    _, hard_idx = jax.lax.top_k(hard_keys, 2)                    # (B, C, 2)
    _, easy_idx = jax.lax.top_k(easy_keys, 2)

    n_hard = jnp.sum(hard, axis=-1)
    n_easy = jnp.sum(easy, axis=-1)
    has_hard = n_hard >= 1
    has_easy = n_easy >= 1

    # selection rules of loss.py:314-322 with n_view=2:
    #   hard & easy -> [hard_0, easy_0];  easy only -> [easy_0, easy_1];
    #   hard only   -> [hard_0, hard_1]
    idx0 = jnp.where(has_hard, hard_idx[..., 0], easy_idx[..., 0])
    idx1 = jnp.where(
        has_hard & has_easy,
        easy_idx[..., 0],
        jnp.where(has_hard, hard_idx[..., 1], easy_idx[..., 1]),
    )
    sel = jnp.stack([idx0, idx1], axis=-1)                       # (B, C, 2)
    sel = jnp.clip(sel, 0, p - 1)

    # gather features: (B, C, 2, D)
    gathered = jnp.take_along_axis(
        feats[:, None, :, :], sel[..., None].astype(jnp.int32), axis=2
    )
    anchor_feats = gathered.reshape(b * num_classes, 2, d)
    anchor_labels = jnp.tile(cls, (b,))
    return anchor_feats, anchor_labels, valid.reshape(-1)


def _masked_contrastive(
    feats: jax.Array,    # (A, V, D)
    labels: jax.Array,   # (A,)
    valid: jax.Array,    # (A,) bool
    temperature: float,
    base_temperature: float,
) -> jax.Array:
    """Reference ``_contrastive`` (``loss.py:339-389``) with a validity mask
    standing in for the dynamically-sized anchor list.

    Above ``PALLAS_MIN_N`` total rows (dense per-pixel contrast regimes; the
    flagship recipe's B×19-anchor grid never comes close) the N×N logits
    matrix no longer fits in HBM and the computation streams through the
    tiled Pallas kernel instead (``ops/contrastive_pallas.py``,
    value-matched against this function)."""
    a, v, d = feats.shape
    from .supcon import PALLAS_MIN_N

    if a * v >= PALLAS_MIN_N and jax.default_backend() not in ("cpu",):
        from ..ops.contrastive_pallas import pixel_contrast_loss_pallas

        return pixel_contrast_loss_pallas(
            feats, labels, valid, temperature=temperature,
            base_temperature=base_temperature)
    n = a * v

    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    vv = valid.astype(jnp.float32)
    pair_valid = vv[:, None] * vv[None, :]
    same = same * pair_valid
    same_t = jnp.tile(same, (v, v))
    col_valid = jnp.tile(vv, (v,))                  # (N,)
    row_valid = col_valid
    pair_valid_t = jnp.tile(pair_valid, (v, v))

    # (N, D): [view0 of all anchors; view1 of all anchors] (loss.py:347)
    contrast = jnp.concatenate([feats[:, i, :] for i in range(v)], axis=0)
    contrast = contrast.astype(jnp.float32)

    logits = contrast @ contrast.T / temperature
    # max over valid columns only (invalid anchors don't exist in the reference)
    masked = jnp.where(col_valid[None, :] > 0, logits, NEG_INF)
    logits = logits - jax.lax.stop_gradient(jnp.max(masked, axis=1, keepdims=True))
    # row-L2 normalize over valid columns (loss.py:366)
    logits = jnp.where(col_valid[None, :] > 0, logits, 0.0)
    norm = jnp.linalg.norm(logits, axis=1, keepdims=True)
    logits = logits / jnp.maximum(norm, 1e-12)

    eye = jnp.eye(n, dtype=jnp.float32)
    # self-contrast exclusion lives in pos_mask/neg_mask directly (the
    # reference's separate logits_mask is subsumed by them)
    pos_mask = same_t * (1.0 - eye)
    neg_mask = (1.0 - same_t) * pair_valid_t

    exp_logits = jnp.exp(logits) * pair_valid_t
    neg_sum = jnp.sum(exp_logits * neg_mask, axis=1, keepdims=True)
    # denominator per reference loss.py:376-381: exp(l_ij) + Σ_neg exp
    log_prob = logits - jnp.log(jnp.exp(logits) + neg_sum)

    pos_count = jnp.sum(pos_mask, axis=1)
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=1) / jnp.maximum(pos_count, 1.0)
    per_anchor = -(temperature / base_temperature) * mean_log_prob_pos

    # anchors with zero positives can only occur for invalid rows; exclude both
    row_ok = (row_valid > 0) & (pos_count > 0)
    denom = jnp.maximum(jnp.sum(row_ok), 1)
    loss = jnp.sum(jnp.where(row_ok, per_anchor, 0.0)) / denom
    return jnp.where(jnp.sum(row_ok) > 0, loss, 0.0)


def pixel_contrast_loss(
    feats: jax.Array,       # (B, h, w, D) decoder features (fine_feat0)
    labels: jax.Array,      # (B, H, W) int labels at full crop resolution
    predict_logits: jax.Array,  # (B, h, w, C) seg logits before upsampling
    rng: jax.Array,
    *,
    num_classes: int = 19,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    max_views: int = 2,
    deterministic_select: bool = False,
) -> jax.Array:
    """Reference ``PixelContrastLoss.forward`` (``loss.py:391-415``): labels
    are nearest-downsampled to feature resolution, predictions argmaxed, hard
    anchors sampled, contrast computed. ``ignore_label=255`` never matches a
    class id, so ignored pixels drop out of every mask automatically."""
    b, h, w, dd = feats.shape
    preds = jnp.argmax(predict_logits, axis=-1)
    # match prediction resolution to the feature map (identity for SwiftNet/
    # DeepLab where both live at seg_beforeup's res; needed for ENet whose
    # head emits full-resolution logits — reference enet.py:641)
    preds = resize_nearest(preds, (h, w))                             # (B, h, w)
    labels_ds = resize_nearest(labels, (h, w))                        # (B, h, w)

    feats_flat = feats.reshape(b, h * w, dd).astype(jnp.float32)
    anchor_feats, anchor_labels, valid = _hard_anchor_sampling(
        feats_flat, labels_ds.reshape(b, -1), preds.reshape(b, -1),
        num_classes, rng, max_views=max_views,
        deterministic_select=deterministic_select,
    )
    return _masked_contrastive(anchor_feats, anchor_labels, valid,
                               temperature, base_temperature)
