"""Criterion dispatch — the 7 loss-combination branches of the reference
trainer (``trainer.py:116-203``), as one pure function evaluated at trace
time (the criterion string is static config, so jit sees a single branch).

Combination rules (reference line numbers in parentheses):

  supcon_focal                      total = supcon/bsz + 1.2·seg        (:123)
  supcon_simclr_focal               total = simclr/bsz + 1.2·seg        (:132)
  pixelcontrast_focal               total = pixel/bsz + 1.2·seg         (:140)
  supcon_pixelcontrast_focal        total = (supcon+pixel)/bsz + 1.2·seg (:158)
  supcon_simclr_pixelcontrast_focal total = (simclr+pixel)/bsz + 1.2·seg (:179)
  crossentropy                      total = ce                          (:186)
  supcon_crossentropy               total = ce + supcon                 (:192)
  supcon_simclr_cross_entropy       total = ce + simclr                 (:198 —
      the reference adds the *zero* supcon loss here by mistake; fixed, see
      SURVEY.md "known reference defects")
  plain_focal / none / others       total = seg                         (:203)

The weather-classifier CE is computed for monitoring on ACDC but EXCLUDED
from the total (reference ``trainer.py:205-206``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .focal import boundary_aware_focal_loss, cross_entropy_loss
from .pixel_contrast import pixel_contrast_loss
from .supcon import supcon_loss

SEG_WEIGHT = 1.2  # reference trainer.py:123


def weather_classifier_metrics(
    weather_logits: jax.Array, gt_weather: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """CE + top-1 accuracy of the (frozen) weather head
    (reference ``trainer.py:109-114``)."""
    gt = gt_weather.reshape(-1)
    logp = jax.nn.log_softmax(weather_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, gt[:, None], axis=-1))
    acc = jnp.mean((jnp.argmax(weather_logits, axis=-1) == gt).astype(jnp.float32)) * 100.0
    return ce, acc


def _seg_loss(cfg, outputs, batch, class_weight) -> jax.Array:
    mode = "full"
    if cfg.criterion == "plain_focal":
        mode = "plain_focal"
    elif cfg.no_class_weights:
        mode = "no_class_weights"
    elif cfg.no_EDT:
        mode = "no_EDT"
    return boundary_aware_focal_loss(
        outputs["seg"], batch["label"], batch["label_distance_weight"],
        class_weight, gamma=0.5, ignore_id=cfg.ignore_index, mode=mode,
    )


def compute_total_loss(
    cfg,
    outputs: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    class_weight: Optional[jax.Array],
    rng: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (total_loss, component dict) for the configured criterion."""
    crit = cfg.criterion
    zero = jnp.float32(0.0)
    comps = {"seg_loss": zero, "supcon_loss": zero, "simclr_loss": zero,
             "pixelcontrast_loss": zero, "ce_loss": zero}
    bsz = batch["label"].shape[0]

    def supcon(labels):
        return supcon_loss(outputs["supcon_proj"], labels)

    def pixel():
        return pixel_contrast_loss(
            outputs["fine_feat0"], batch["label"], outputs["seg_beforeup"], rng,
            num_classes=cfg.num_classes,
            # --reference_rng A/B mode: first-raster-index anchor selection,
            # mirroring the driver's identity-pinned torch.randperm
            deterministic_select=getattr(cfg, "reference_rng", False),
        )

    if crit == "supcon_focal":
        comps["supcon_loss"] = supcon(batch["weather"])
        comps["seg_loss"] = _seg_loss(cfg, outputs, batch, class_weight)
        total = comps["supcon_loss"] / bsz + SEG_WEIGHT * comps["seg_loss"]
    elif crit == "supcon_simclr_focal":
        comps["simclr_loss"] = supcon(None)
        comps["seg_loss"] = _seg_loss(cfg, outputs, batch, class_weight)
        total = comps["simclr_loss"] / bsz + SEG_WEIGHT * comps["seg_loss"]
    elif crit == "pixelcontrast_focal":
        comps["pixelcontrast_loss"] = pixel()
        comps["seg_loss"] = _seg_loss(cfg, outputs, batch, class_weight)
        total = comps["pixelcontrast_loss"] / bsz + SEG_WEIGHT * comps["seg_loss"]
    elif crit == "supcon_pixelcontrast_focal":  # the doubly-contrastive flagship
        comps["supcon_loss"] = supcon(batch["weather"])
        comps["pixelcontrast_loss"] = pixel()
        comps["seg_loss"] = _seg_loss(cfg, outputs, batch, class_weight)
        total = (comps["supcon_loss"] + comps["pixelcontrast_loss"]) / bsz \
            + SEG_WEIGHT * comps["seg_loss"]
    elif crit == "supcon_simclr_pixelcontrast_focal":
        comps["simclr_loss"] = supcon(None)
        comps["pixelcontrast_loss"] = pixel()
        comps["seg_loss"] = _seg_loss(cfg, outputs, batch, class_weight)
        total = (comps["simclr_loss"] + comps["pixelcontrast_loss"]) / bsz \
            + SEG_WEIGHT * comps["seg_loss"]
    elif crit == "crossentropy":
        comps["ce_loss"] = cross_entropy_loss(outputs["seg"], batch["label"],
                                              ignore_id=cfg.ignore_index)
        total = comps["ce_loss"]
    elif crit == "supcon_crossentropy":
        comps["supcon_loss"] = supcon(batch["weather"])
        comps["ce_loss"] = cross_entropy_loss(outputs["seg"], batch["label"],
                                              ignore_id=cfg.ignore_index)
        total = comps["ce_loss"] + comps["supcon_loss"]
    elif crit == "supcon_simclr_cross_entropy":
        comps["simclr_loss"] = supcon(None)
        comps["ce_loss"] = cross_entropy_loss(outputs["seg"], batch["label"],
                                              ignore_id=cfg.ignore_index)
        total = comps["ce_loss"] + comps["simclr_loss"]
    else:
        # plain_focal / 'none' / remaining choices: segmentation loss only
        comps["seg_loss"] = _seg_loss(cfg, outputs, batch, class_weight)
        total = comps["seg_loss"]

    comps["total_loss"] = total
    return total, comps
