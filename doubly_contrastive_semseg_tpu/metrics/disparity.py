"""Disparity error metrics (reference ``metrics/disparity_metric.py:7-47``):
end-point error, D1 (KITTI: err > 3px AND err > 5% of gt), threshold rates.
All masked by gt validity (gt > 0), jittable."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    n = jnp.sum(mask)
    return jnp.where(n > 0, jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(n, 1), 0.0)


def epe_metric(pred: jax.Array, gt: jax.Array, valid=None) -> jax.Array:
    valid = (gt > 0) if valid is None else valid
    return _masked_mean(jnp.abs(pred - gt), valid)


def d1_metric(pred: jax.Array, gt: jax.Array, valid=None) -> jax.Array:
    valid = (gt > 0) if valid is None else valid
    err = jnp.abs(pred - gt)
    bad = (err > 3.0) & (err > 0.05 * gt)
    return _masked_mean(bad.astype(jnp.float32), valid)


def thres_metric(pred: jax.Array, gt: jax.Array, thres: float, valid=None) -> jax.Array:
    valid = (gt > 0) if valid is None else valid
    err = jnp.abs(pred - gt)
    return _masked_mean((err > thres).astype(jnp.float32), valid)
