"""Fully on-device, jittable training augmentation.

The TPU-native alternative to the host PIL/cv2 pipeline
(``data/transforms.py``): one jitted function maps raw full-resolution
batches to augmented crops, so the host only decodes PNGs. Components mirror
the reference pipeline semantically:

- ``RandomSquareCropAndScale`` (``custom_transforms_acdc.py:444-525``):
  scale ∼ U(0.5, 2), random box, bicubic image resample
  (``jax.image.scale_and_translate``, Keys cubic — PIL's bicubic kernel),
  nearest labels, mean / ignore fill outside the frame;
- ``GammaCorrection`` (γ=0.4 on night images, ``:695-711``) as vector math;
- ``LabelBoundaryTransform`` EDT weights via the jump-flooding kernel
  (``ops/edt.py``);
- ``TwoCropTransform``: two independent crops per sample, stacked [2B, ...].

Enabled with ``--no_host_augment``; the host path remains the
bit-faithful-to-reference default.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.edt import label_boundary_weights

MEAN_FILL = jnp.asarray([73.15, 82.90, 72.3], jnp.float32)


def _sample_crop_params(rng, h: int, w: int, crop: int,
                        min_scale: float, max_scale: float):
    k_scale, k_x, k_y = jax.random.split(rng, 3)
    scale = jax.random.uniform(k_scale, (), minval=min_scale, maxval=max_scale)
    box = jnp.floor(scale * crop)  # box side in source pixels
    max_x = jnp.maximum(jnp.maximum(box, w) - box, 0)
    max_y = jnp.maximum(jnp.maximum(box, h) - box, 0)
    x0 = jax.random.uniform(k_x, ()) * (max_x + 1)
    y0 = jax.random.uniform(k_y, ()) * (max_y + 1)
    return jnp.floor(x0), jnp.floor(y0), box


def _crop_image(img: jax.Array, x0, y0, box, crop: int) -> jax.Array:
    """Bicubic resample of the (y0, x0, box, box) window to (crop, crop),
    mean-filled outside the source frame."""
    s = crop / box
    out = jax.image.scale_and_translate(
        img, (crop, crop, 3), (0, 1),
        jnp.stack([s, s]), jnp.stack([-y0 * s, -x0 * s]),
        method="cubic", antialias=False)
    # mask of output pixels whose source center lies outside the image
    oy = (jnp.arange(crop) + 0.5) / s + y0
    ox = (jnp.arange(crop) + 0.5) / s + x0
    inside = ((oy >= 0) & (oy <= img.shape[0]))[:, None] & \
             ((ox >= 0) & (ox <= img.shape[1]))[None, :]
    out = jnp.where(inside[..., None], out, MEAN_FILL)
    # PIL resizes uint8 images, clamping bicubic overshoot (reference path)
    return jnp.clip(out, 0.0, 255.0)


def _crop_label(lbl: jax.Array, x0, y0, box, crop: int,
                ignore_id: int = 255) -> jax.Array:
    """Nearest-neighbor label crop with ignore fill (PIL-nearest mapping)."""
    ys = jnp.floor(y0 + (jnp.arange(crop) + 0.0) * (box / crop)).astype(jnp.int32)
    xs = jnp.floor(x0 + (jnp.arange(crop) + 0.0) * (box / crop)).astype(jnp.int32)
    valid = ((ys >= 0) & (ys < lbl.shape[0]))[:, None] & \
            ((xs >= 0) & (xs < lbl.shape[1]))[None, :]
    g = lbl[jnp.clip(ys, 0, lbl.shape[0] - 1)][:, jnp.clip(xs, 0, lbl.shape[1] - 1)]
    return jnp.where(valid, g, ignore_id)


def _gamma_night(img: jax.Array, weather, gamma: float = 0.4) -> jax.Array:
    """γ-brighten night frames (weather id 1) — reference GammaCorrection."""
    corrected = jnp.clip(img / 255.0, 0.0, 1.0) ** gamma * 255.0
    return jnp.where(weather == 1, corrected, img)


@functools.partial(jax.jit, static_argnames=("crop", "num_classes", "two_crop",
                                             "use_gamma"))
def augment_batch(images: jax.Array, labels: jax.Array, weather: jax.Array,
                  rng: jax.Array, *, crop: int = 768, num_classes: int = 19,
                  two_crop: bool = True, use_gamma: bool = False) -> Dict:
    """(B, H, W, 3) raw frames → training batch at crop resolution:
    ``left`` (2B or B, crop, crop, 3), ``label``/``label_distance_weight``
    (B, crop, crop) from view 0, ``weather`` (B,)."""
    b, h, w, _ = images.shape

    def one_view(img, lbl, wea, key):
        x0, y0, box = _sample_crop_params(key, h, w, crop, 0.5, 2.0)
        im = _crop_image(img.astype(jnp.float32), x0, y0, box, crop)
        lb = _crop_label(lbl, x0, y0, box, crop)
        if use_gamma:
            im = _gamma_night(im, wea)
        return im, lb

    keys = jax.random.split(rng, 2 * b).reshape(2, b, -1)
    im0, lb0 = jax.vmap(one_view)(images, labels, weather, keys[0])
    out: Dict = {"weather": weather}
    if two_crop:
        im1, _ = jax.vmap(one_view)(images, labels, weather, keys[1])
        out["left"] = jnp.concatenate([im0, im1], axis=0)
    else:
        out["left"] = im0
    out["label"] = lb0
    out["label_distance_weight"] = label_boundary_weights(lb0, num_classes)
    return out
