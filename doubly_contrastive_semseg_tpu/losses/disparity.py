"""Disparity losses (reference ``utils/loss.py:478-565`` DisparityLosses —
pyramid-weighted smooth-L1 over valid ground-truth pixels, with optional
EDT boundary weighting), plus the edge-aware smoothness regularizer
(``loss.py:552-564`` get_smooth_loss)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.interpolate import resize_bilinear

# per-pyramid-size loss weights (reference utils/init_trainer.py:227-233)
PYRAMID_WEIGHTS = {
    5: (1 / 3, 2 / 3, 1.0, 1.0, 1.0),
    4: (1 / 3, 2 / 3, 1.0, 1.0),
    3: (1.0, 1.0, 1.0),
    2: (1.0, 1.0),
    1: (1.0,),
}


def _smooth_l1(x: jax.Array) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)


def disparity_loss(
    pred_pyramid: Sequence[jax.Array],
    gt_disp: jax.Array,
    *,
    max_disp: int = 192,
    alphas: Optional[jax.Array] = None,
) -> jax.Array:
    """Σ_k w_k · mean smooth-L1 over valid pixels, predictions upsampled (and
    value-rescaled) to gt resolution when needed."""
    weights = PYRAMID_WEIGHTS[len(pred_pyramid)]
    valid = (gt_disp > 0) & (gt_disp < max_disp)
    n = jnp.maximum(jnp.sum(valid), 1)
    total = 0.0
    for w, pred in zip(weights, pred_pyramid):
        if pred.shape[-1] != gt_disp.shape[-1]:
            scale = gt_disp.shape[-1] / pred.shape[-1]
            pred = resize_bilinear(pred[..., None],
                                   (gt_disp.shape[-2], gt_disp.shape[-1]))[..., 0]
            pred = pred * scale
        err = _smooth_l1(pred - gt_disp)
        if alphas is not None:
            err = err * alphas
        total = total + w * jnp.sum(jnp.where(valid, err, 0.0)) / n
    return total


def smoothness_loss(disp: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware first-order smoothness (reference ``loss.py:552-564``)."""
    d = disp[..., None] if disp.ndim == 3 else disp
    gx = jnp.abs(d[:, :, :-1] - d[:, :, 1:])
    gy = jnp.abs(d[:, :-1, :] - d[:, 1:, :])
    ix = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), axis=-1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, :-1, :] - img[:, 1:, :]), axis=-1, keepdims=True)
    return jnp.mean(gx * jnp.exp(-ix)) + jnp.mean(gy * jnp.exp(-iy))
