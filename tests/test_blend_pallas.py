"""Fused UpsampleBlend kernel (interpret) vs the XLA decoder step."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.ops.blend_pallas import fused_upsample_blend  # noqa: E402
from doubly_contrastive_semseg_tpu.ops.interpolate import resize_bilinear  # noqa: E402


def _xla_blend(x, skip, k, scale, bias, mean, var, eps=1e-5):
    up = resize_bilinear(x, (skip.shape[1], skip.shape[2]))
    pre = up + skip
    act = jnp.maximum((pre - mean) / jnp.sqrt(var + eps) * scale + bias, 0.0)
    return jax.lax.conv_general_dilated(
        act, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("hw", [(16, 24), (8, 8)])
def test_fused_blend_matches_xla(rng, hw):
    b, c = 2, 128
    hh, ww = hw
    x = jnp.asarray(rng.standard_normal((b, hh // 2, ww // 2, c)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((b, hh, ww, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    mean = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))

    want = np.asarray(_xla_blend(x, skip, k, scale, bias, mean, var))
    got = np.asarray(fused_upsample_blend(
        x, skip, k, scale, bias, mean, var, out_dtype=jnp.float32,
        interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.12)  # bf16 operands
    # tight check on relative magnitude
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.02

    # TIGHT elementwise bar against a dtype-matched reference (bf16 inputs/
    # activation, f32 BN + accum — the kernel's exact regime): the loose f32
    # bars above leave room for a localized real bug (one misweighted border
    # row sits under atol=0.12); at matched dtypes only accumulation-order
    # noise remains
    eps = 1e-5
    a = scale / jnp.sqrt(var + eps)
    shift = bias - mean * a
    xb = x.astype(jnp.bfloat16)
    hb, wb = skip.shape[1], skip.shape[2]
    upb = resize_bilinear(xb, (hb, wb))              # ×2 phases in bf16
    pre = upb.astype(jnp.bfloat16) + skip.astype(jnp.bfloat16)
    actb = jnp.maximum(pre.astype(jnp.float32) * a + shift, 0.0
                       ).astype(jnp.bfloat16)
    want_b = np.asarray(jax.lax.conv_general_dilated(
        actb, k.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    np.testing.assert_allclose(got, want_b, rtol=2e-2, atol=2e-2)
