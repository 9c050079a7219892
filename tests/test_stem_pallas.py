"""Fused Pallas stem (interpret) vs XLA conv + eval BN + ReLU."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.ops.stem_pallas import fused_stem  # noqa: E402


def test_fused_stem_matches_conv(rng):
    b, h, w, cin, cout = 2, 16, 24, 12, 64
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    k = rng.standard_normal((4, 4, cin, cout)).astype(np.float32) * 0.1
    scale = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    mean = rng.standard_normal(cout).astype(np.float32)
    var = rng.uniform(0.5, 2.0, cout).astype(np.float32)

    conv = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = np.maximum((np.asarray(conv) - mean) / np.sqrt(var + 1e-5) * scale + bias, 0)

    xp = jnp.asarray(x.transpose(0, 3, 1, 2))  # planar (B, 12, H, W)
    got = np.asarray(fused_stem(
        xp, jnp.asarray(k), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(mean), jnp.asarray(var), out_dtype=jnp.float32,
        interpret=True))
    # kernel computes in bf16 — compare at bf16 tolerance
    np.testing.assert_allclose(got, want, rtol=0.08, atol=0.08)


def test_stem_kernel_support_gate():
    from doubly_contrastive_semseg_tpu.ops.stem_pallas import stem_kernel_supported

    assert stem_kernel_supported(512) and stem_kernel_supported(384)
    assert not stem_kernel_supported(540)  # 1080-high val frames → XLA path


def test_fused_stem_multiple_tiles(rng):
    b, h, w = 1, 16, 16
    x = rng.standard_normal((b, h, w, 12)).astype(np.float32)
    k = rng.standard_normal((4, 4, 12, 64)).astype(np.float32) * 0.1
    ones = jnp.ones(64)
    zeros = jnp.zeros(64)
    out = fused_stem(jnp.asarray(x.transpose(0, 3, 1, 2)), jnp.asarray(k),
                     ones, zeros, zeros, ones,
                     out_dtype=jnp.float32, interpret=True)
    assert out.shape == (b, h, w, 64)
