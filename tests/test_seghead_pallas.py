"""Fused seg-head kernel (interpret mode) vs the reference computation path
(BN→ReLU→1×1 conv → ×4 bilinear → argmax)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.ops.interpolate import resize_bilinear  # noqa: E402
from doubly_contrastive_semseg_tpu.ops.seghead_pallas import (  # noqa: E402
    fused_seghead_upsample_argmax,
)


def _reference_path(feat, scale, bias, mean, var, kernel, cbias, eps=1e-5,
                    bf16=False):
    xhat = (feat - mean) / np.sqrt(var + eps) * scale + bias
    h = np.maximum(xhat, 0.0)
    if bf16:  # the kernel's numerics: bf16 activations/weights, f32 accum
        h = np.asarray(jnp.asarray(h, jnp.bfloat16), np.float32)
        kernel = np.asarray(jnp.asarray(kernel, jnp.bfloat16), np.float32)
    logits = np.einsum("bhwc,co->bhwo", h, kernel) + cbias
    up = resize_bilinear(jnp.asarray(logits), (feat.shape[1] * 4, feat.shape[2] * 4))
    return np.asarray(jnp.argmax(up, axis=-1))


@pytest.mark.parametrize("h,w", [(16, 24), (14, 24), (13, 30)])
# h=14: non-multiple of TILE_H (the 1080p ACDC shape has 270 feature rows —
# same padded-tail path); (13, 30): W not a multiple of 8, exercising the
# wrapper's edge-replication W pad (Mosaic requires 8-aligned DMA slices)
def test_fused_seghead_matches_reference(rng, h, w):
    b, cin, c = 2, 128, 19
    feat = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, cin).astype(np.float32)
    bias = rng.standard_normal(cin).astype(np.float32)
    mean = rng.standard_normal(cin).astype(np.float32)
    var = rng.uniform(0.5, 2.0, cin).astype(np.float32)
    kernel = rng.standard_normal((cin, c)).astype(np.float32)
    cbias = rng.standard_normal(c).astype(np.float32)

    want32 = _reference_path(feat, scale, bias, mean, var, kernel, cbias)
    want16 = _reference_path(feat, scale, bias, mean, var, kernel, cbias,
                             bf16=True)
    got = np.asarray(fused_seghead_upsample_argmax(
        jnp.asarray(feat), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(mean), jnp.asarray(var), jnp.asarray(kernel),
        jnp.asarray(cbias), interpret=True))
    assert got.shape == (b, 4 * h, 4 * w)
    assert got.dtype == np.int8
    # random-normal logits have razor-thin argmax margins; real trained heads
    # have far larger ones. bf16 rounding flips a small tail of near-ties.
    assert (got == want16).mean() > 0.995
    assert (got == want32).mean() > 0.99


def test_fused_seghead_never_picks_padded_class(rng):
    b, h, w, cin, c = 1, 16, 8, 128, 19
    feat = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    # force EVERY real-class logit negative via the class bias: an unmasked
    # padded class would score ~0 and win at every pixel, so this fails
    # deterministically if the -1e30 padded-class masking regresses (with
    # zero bias a broken mask only flips ~2e-4 of runs — no power)
    cbias = np.full((c,), -1000.0, np.float32)
    out = np.asarray(fused_seghead_upsample_argmax(
        jnp.asarray(feat), jnp.ones(cin), jnp.zeros(cin), jnp.zeros(cin),
        jnp.ones(cin), jnp.asarray(rng.standard_normal((cin, c)), jnp.float32),
        jnp.asarray(cbias), interpret=True))
    assert out.max() < c
