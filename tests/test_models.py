"""Model-family contract tests: every model returns the doubly-contrastive
output dict with the right shapes in both standard and two-view modes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.config import parse_args  # noqa: E402
from doubly_contrastive_semseg_tpu.models import build_model  # noqa: E402


def _init_and_apply(model, x, supcon=False):
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   x, train=True, return_supcon_feature=supcon)
    out, _ = model.apply(v, x, train=True, return_supcon_feature=supcon,
                         mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
    return v, out


def _cfg(model, extra=()):
    return parse_args(["--dataset", "synthetic", "--model", model,
                       "--train_semantic", "--criterion", "supcon_focal",
                       "--compute_dtype", "float32", *extra])


@pytest.mark.parametrize("name", [
    "enet", "deeplabv3plus_resnet50",
    # deeplab contract already covered by the rn50 case; the mnv2-backbone
    # compile costs ~30s on the CI host -> slow tier
    pytest.param("deeplabv3_mobilenet", marks=pytest.mark.slow),
    # train=True exercises the depth-scaled drop-connect path
    pytest.param("efficientnetb0", marks=pytest.mark.slow)])
def test_model_contract_supcon(name):
    cfg = _cfg(name)
    model = build_model(cfg)
    b, s = 2, 64
    x = jnp.zeros((2 * b, s, s, 3), jnp.float32)
    _, out = _init_and_apply(model, x, supcon=True)
    assert out["seg"].shape == (b, s, s, 19)
    assert out["fine_feat"].shape[0] == 2 * b      # both views
    assert out["fine_feat0"].shape[0] == b          # first view only
    assert out["supcon_proj"].shape == (b, 2, 128)
    assert out["weather_logits"].shape == (b, 4)
    if name != "enet":
        # head output and contrast features share resolution; ENet's head is
        # full-res (enet.py:641) and the pixel-contrast loss downsamples
        # predictions to feature resolution internally
        assert out["fine_feat0"].shape[1:3] == out["seg_beforeup"].shape[1:3]


@pytest.mark.slow  # OS16 is the default-gate deeplab case
def test_deeplab_output_stride_8():
    cfg = _cfg("deeplabv3plus_resnet50", ["--output_stride", "8"])
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _, out = _init_and_apply(model, x)
    # backbone 'out' at 1/8 instead of 1/16
    assert out["fine_feat"].shape[1:3] == (8, 8)


def test_enet_pool_unpool_roundtrip(rng):
    from doubly_contrastive_semseg_tpu.models.enet import (
        max_pool_2x2_with_indices, max_unpool_2x2)

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    pooled, idx = max_pool_2x2_with_indices(x)
    assert pooled.shape == (2, 4, 4, 3)
    # pooled equals plain max pool
    np.testing.assert_allclose(
        np.asarray(pooled),
        np.asarray(jax.lax.reduce_window(x, -np.inf, jax.lax.max,
                                         (1, 2, 2, 1), (1, 2, 2, 1), "VALID")))
    up = max_unpool_2x2(pooled, idx)
    assert up.shape == x.shape
    # torch MaxUnpool2d semantics: the max value sits at its argmax position,
    # every other position in the window is exactly zero
    win = np.asarray(up).reshape(2, 4, 2, 4, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(2, 4, 4, 4, 3)
    idx_np = np.asarray(idx)
    pooled_np = np.asarray(pooled)
    taken = np.take_along_axis(win, idx_np[:, :, :, None, :], axis=3)[:, :, :, 0, :]
    np.testing.assert_allclose(taken, pooled_np, rtol=1e-6)
    mask = np.arange(4)[None, None, None, :, None] == idx_np[:, :, :, None, :]
    np.testing.assert_array_equal(win[~np.broadcast_to(mask, win.shape)], 0.0)


@pytest.mark.parametrize("name", [
    # one light representative per family in the default gate; the heavier
    # legacy pyramids are slow-tier (forwards only, L-status in SURVEY)
    pytest.param("mobilenetv2", marks=pytest.mark.slow),
    pytest.param("resnet18_single", marks=pytest.mark.slow),
    pytest.param("resnet18_hourglass", marks=pytest.mark.slow),
    "resnet18_rgbd", "resnet18_back"])
def test_factory_reaches_legacy_backbones(name):
    """The mnv2 pyramid and the single-scale RODSNet-era SwiftNet variants
    are flag-reachable (reference keeps them reachable too: mnv2_pyramid.py,
    resnet_18.py:206-809) and honor the standard output contract."""
    cfg = _cfg(name)
    model = build_model(cfg)
    b, s = 1, 128  # mnv2 pyramid needs /128 for all 6 skip levels
    x = jnp.zeros((2 * b, s, s, 3), jnp.float32)
    _, out = _init_and_apply(model, x, supcon=True)
    assert out["seg"].shape == (b, s, s, 19)
    assert out["fine_feat"].shape == (2 * b, s // 4, s // 4, 128)
    assert out["fine_feat0"].shape[0] == b
    assert out["supcon_proj"].shape == (b, 2, 128)


def test_torch_batchnorm_one_pass_variance_never_negative():
    """The one-pass E[x²]−E[x]² batch variance can go negative under f32
    cancellation (|mean| ≫ std) where rsqrt(var+eps) emits NaN; torch's true
    variance is non-negative by construction, so the clamp is pure parity.
    x ≡ 900.05 makes the unclamped form −0.4375 (found by sweep)."""
    from doubly_contrastive_semseg_tpu.models.blocks import TorchBatchNorm

    bn = TorchBatchNorm(use_running_average=False)
    x = jnp.full((2, 4, 4, 8), 900.05, jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x)
    y, mut = bn.apply(v, x, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(mut["batch_stats"]["var"])).all()
    assert (np.asarray(mut["batch_stats"]["var"]) >= 0).all()
