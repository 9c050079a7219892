"""Boundary-aware focal / focal / cross-entropy segmentation losses.

Functional, static-shape re-design of reference ``utils/loss.py``:

- ``BoundaryAwareFocalLoss`` (``utils/loss.py:27-80``): focal CE weighted
  per-pixel by the Euclidean-distance-transform boundary weight ``alphas``
  and a per-class balance weight; normalized by the count of ``alphas > 0``.
- ``FocalLoss2`` (``utils/loss.py:208-247``): the same without the variant
  branches (used via ``--criterion plain_focal``).
- ``SemsegCrossEntropy`` / ``nn.CrossEntropyLoss(ignore_index=255)``
  (``utils/loss.py:6-24``, ``utils/init_trainer.py:224``).

Unlike the reference, nothing mutates its inputs (the reference zeroes
ignore pixels in-place, ``loss.py:43`` — safe there only because alpha = 0 at
ignore pixels; here the same guarantee comes from masking).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _gather_logpt(logits: jax.Array, target: jax.Array) -> jax.Array:
    """log p_t per pixel; logits (..., C) fp32, target (...,) int in [0, C)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]


def boundary_aware_focal_loss(
    logits: jax.Array,
    target: jax.Array,
    alphas: jax.Array,
    class_weight: Optional[jax.Array],
    *,
    gamma: float = 0.5,
    ignore_id: int = 255,
    mode: str = "full",  # full | plain_focal | no_class_weights | no_EDT
) -> jax.Array:
    """loss = -w · α · exp(γ(1-p_t)) · log p_t, summed / #{α>0}
    (reference ``utils/loss.py:39-80``; γ=0.5 from ``init_trainer.py:219``).

    Args:
      logits: (B, H, W, C) — already at label resolution (the model upsamples).
      target: (B, H, W) int labels with ``ignore_id`` holes.
      alphas: (B, H, W) EDT boundary weights; 0 at ignore pixels by
        construction (``custom_transforms_acdc.py:688-690``).
      class_weight: (C,) balanced weights or None.
      mode: the reference's flag variants (``loss.py:65-72``) —
        ``plain_focal`` drops both weightings, ``no_class_weights`` keeps only
        α, ``no_EDT`` keeps only the class weight.

    Reference-parity quirk, kept deliberately: ``plain_focal`` and ``no_EDT``
    include ignore pixels in the numerator (remapped to class 0). The
    reference's ``target[target == ignore_id] = 0`` is only justified by its
    own comment "because alphas are zero in ignore_id places" (loss.py:43),
    but those two branches never multiply by α — so ignored/padded pixels
    leak into the loss there exactly as here (oracle-matched in
    ``test_loss_oracle.py``).
    """
    target_safe = jnp.where(target == ignore_id, 0, target)
    logpt = _gather_logpt(logits, target_safe)
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    focal = jnp.exp(gamma * (1.0 - pt))

    alphas = alphas.astype(jnp.float32)
    if class_weight is None and mode in ("full", "no_EDT"):
        # degrade gracefully when balanced weights are disabled
        mode = "plain_focal" if mode == "no_EDT" else "no_class_weights"
    if mode == "plain_focal":
        per_px = -focal * logpt
    elif mode == "no_class_weights":
        per_px = -alphas * focal * logpt
    elif mode == "no_EDT":
        per_px = -class_weight[target_safe] * focal * logpt
    else:
        per_px = -class_weight[target_safe] * alphas * focal * logpt

    n = jnp.sum(alphas > 0.0)
    # plain_focal still normalizes by #{α>0} (reference loss.py:73)
    loss = jnp.sum(per_px) / jnp.maximum(n, 1)
    return jnp.where(n > 0, loss, 0.0)


def plain_focal_loss(
    logits: jax.Array,
    target: jax.Array,
    alphas: jax.Array,
    *,
    gamma: float = 0.5,
    ignore_id: int = 255,
) -> jax.Array:
    """``FocalLoss2`` (reference ``utils/loss.py:219-247``): unweighted focal,
    normalized by #{α>0}."""
    return boundary_aware_focal_loss(
        logits, target, alphas, None, gamma=gamma, ignore_id=ignore_id, mode="plain_focal"
    )


def cross_entropy_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    ignore_id: int = 255,
) -> jax.Array:
    """Mean CE over non-ignored pixels (``nn.CrossEntropyLoss(ignore_index=255)``,
    reference ``init_trainer.py:224``)."""
    valid = (target != ignore_id)
    target_safe = jnp.where(valid, target, 0)
    logpt = _gather_logpt(logits, target_safe)
    n = jnp.sum(valid)
    loss = -jnp.sum(jnp.where(valid, logpt, 0.0)) / jnp.maximum(n, 1)
    return jnp.where(n > 0, loss, 0.0)
