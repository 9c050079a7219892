"""Fused Pallas stem (interpret mode on CPU) vs the plain-XLA stem path."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.ops.stem_pallas import (  # noqa: E402
    fused_stem_pool,
    stem_pool_reference,
    supports,
)


@pytest.mark.parametrize("shape", [(1, 64, 32), (2, 128, 48),
                                   (1, 108, 32), (1, 140, 48)])
def test_stem_kernel_matches_reference(rng, shape):
    """conv4x4/s1 (pad (2,1)) + affine + ReLU + maxpool3x3/s2: the row-quad
    kernel must match the XLA composition, including the top block's pool
    -inf row and both W-phase paths."""
    b, h2, w2 = shape
    x = jnp.asarray(rng.standard_normal((b, h2, w2, 12)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((4, 4, 12, 64)).astype(np.float32)) * 0.1
    s = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    assert supports(x)
    want = stem_pool_reference(x, k, s, bb)
    got = fused_stem_pool(x, k, s, bb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_stem_supports_gate():
    ok = jnp.zeros((1, 64, 32, 12))
    assert supports(ok)
    assert supports(jnp.zeros((1, 540, 960, 12)))     # ACDC-native, ragged
    assert not supports(jnp.zeros((1, 64, 32, 3)))    # not s2d channels
    assert not supports(jnp.zeros((1, 40, 32, 12)))   # fewer rows than a block


def test_model_fused_stem_equals_plain(rng, monkeypatch):
    """Whole-model eval forward with the fused stem (interpret) vs the XLA
    stem: identical params/stats tree, logits equal to float tolerance.
    Guards that the fused kernel actually ENGAGED — the use_fused gate in
    resnet_pyramid has five conditions, and if any silently stops matching
    this would compare the XLA path against itself forever."""
    from doubly_contrastive_semseg_tpu.models import DCSSModel
    from doubly_contrastive_semseg_tpu.ops import stem_pallas

    calls = {"n": 0}
    real = stem_pallas.fused_stem_pool

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(stem_pallas, "fused_stem_pool", counting)

    x = jnp.asarray(rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32))
    model = DCSSModel(backbone="resnet18", num_classes=19, weather_num=4,
                      dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out_plain = model.apply(v, x, train=False)
    assert calls["n"] == 0  # CPU without the env var: XLA stem
    os.environ["DCSS_STEM_INTERPRET"] = "1"
    try:
        out_fused = model.apply(v, x, train=False)
    finally:
        del os.environ["DCSS_STEM_INTERPRET"]
    assert calls["n"] > 0, "fused stem gate never engaged — tautological test"
    np.testing.assert_allclose(np.asarray(out_fused["seg"]),
                               np.asarray(out_plain["seg"]),
                               rtol=1e-4, atol=1e-4)
