"""Stereo slice: cost volumes, soft-argmin, warp, deform conv, metrics,
disparity loss, and the joint StereoDCSS model."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.losses.disparity import (  # noqa: E402
    disparity_loss,
    smoothness_loss,
)
from doubly_contrastive_semseg_tpu.metrics.disparity import (  # noqa: E402
    d1_metric,
    epe_metric,
    thres_metric,
)
from doubly_contrastive_semseg_tpu.ops.cost_volume import (  # noqa: E402
    correlation_cost_volume,
    soft_argmin_disparity,
)
from doubly_contrastive_semseg_tpu.ops.deform_conv import (  # noqa: E402
    DeformConv2d,
    modulated_deform_conv,
    modulated_deform_conv_window,
)
from doubly_contrastive_semseg_tpu.ops.warp import disp_warp  # noqa: E402


def test_correlation_volume_recovers_shift(rng):
    """A right image that is the left shifted by d* must peak at d*."""
    b, h, w, c = 1, 8, 32, 16
    left = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    d_true = 5
    right = jnp.roll(left, -d_true, axis=2)  # right view: shifted left
    vol = correlation_cost_volume(left, right, max_disp=12)
    # away from the wrap-around region the argmax over disparity is d*
    am = np.asarray(jnp.argmax(vol, axis=-1))[0, :, 12:-12]
    assert (am == d_true).mean() > 0.9
    disp = soft_argmin_disparity(vol * 50.0)  # sharpen softmax
    assert abs(float(disp[0, 4, 16]) - d_true) < 0.1


def test_correlation_volume_mxu_band_matches_shift_form(rng):
    """The MXU band formulation (D >= 16: Gram matmul + reshape-trick band
    extraction) equals the per-d shift-and-reduce form, including the
    zero-padded x-d < 0 border."""
    b, h, w, c = 2, 4, 40, 8
    left = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    right = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    d = 16  # takes the MXU band path
    got = np.asarray(correlation_cost_volume(left, right, d))
    want = np.stack(
        [np.asarray(jnp.mean(left * jnp.pad(right, ((0, 0), (0, 0), (dd, 0),
                                                    (0, 0)))[:, :, :w, :],
                             axis=-1)) for dd in range(d)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert (got[:, :, 0, 1:] == 0).all()  # x - d < 0 region is exactly 0


def test_disp_warp_reconstructs():
    b, h, w, c = 1, 4, 16, 2
    right = jnp.asarray(np.arange(b * h * w * c, dtype=np.float32).reshape(b, h, w, c))
    disp = jnp.full((b, h, w), 3.0)
    warped, mask = disp_warp(right, disp)
    # warped(x) = right(x-3) for x >= 3
    np.testing.assert_allclose(np.asarray(warped)[0, :, 3:],
                               np.asarray(right)[0, :, :-3], rtol=1e-5)
    assert (np.asarray(mask)[0, :, :3] == 0).all()


def test_deform_conv_zero_offsets_equals_regular_conv(rng):
    """offsets = 0, mask = 1 → exactly a regular dense conv (the reference
    zero-inits its offset conv for this reason, deform.py:66-70)."""
    b, h, w, ci, co = 1, 8, 8, 4, 6
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    offset = jnp.zeros((b, h, w, 2 * 9))
    mask = jnp.ones((b, h, w, 9))
    got = modulated_deform_conv(x, offset, mask, kernel, stride=1, padding=1,
                                dilation=1, deform_groups=1)
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-4)


def test_deform_conv_integer_offset_shifts_sampling(rng):
    """A +1 x-offset on every tap equals convolving the x-shifted image."""
    b, h, w, ci, co = 1, 10, 10, 3, 5
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    offset = jnp.zeros((b, h, w, 9, 2)).at[..., 1].set(1.0).reshape(b, h, w, 18)
    got = modulated_deform_conv(x, offset, None, kernel, stride=1, padding=1,
                                deform_groups=1)
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    want = jax.lax.conv_general_dilated(
        x_shift, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # interior matches; the border column differs (zero-pad vs shifted pad)
    np.testing.assert_allclose(np.asarray(got)[:, 1:-1, 1:-2],
                               np.asarray(want)[:, 1:-1, 1:-2], rtol=2e-4, atol=1e-4)


def test_deform_conv_window_matches_gather_inside_radius(rng):
    """The TPU fast path (dense static-shift window) is the SAME bilinear
    rule as the gather oracle whenever offsets stay inside the window radius
    — bit-identical in float64 (verified offline); here f32 to ~1e-2 of an
    output scale of ~10 from correlated summation-order rounding."""
    b, h, w, ci, co, g = 2, 10, 12, 8, 6, 2
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-1.9, 1.9, (b, h, w, g * 9 * 2)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, g * 9)).astype(np.float32))
    want = modulated_deform_conv(x, off, mask, kernel, stride=1, padding=1,
                                 dilation=1, deform_groups=g)
    got = modulated_deform_conv_window(x, off, mask, kernel, padding=1,
                                       dilation=1, deform_groups=g, radius=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    # dilation-2 / padding-2 form (the mdconv in DeformSimpleBottleneck)
    off2 = jnp.asarray(rng.uniform(-2.0, 2.0, (b, h, w, 18)).astype(np.float32))
    want2 = modulated_deform_conv(x, off2, None, kernel, stride=1, padding=2,
                                  dilation=2, deform_groups=1)
    got2 = modulated_deform_conv_window(x, off2, None, kernel, padding=2,
                                        dilation=2, deform_groups=1, radius=2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=5e-3, atol=5e-3)


def test_deform_conv_window_grads_match_gather(rng):
    """Autodiff through the window form = autodiff through the gather form
    (x, offset, and mask cotangents), since the forward maths is identical."""
    b, h, w, ci, co, g = 1, 8, 8, 4, 4, 1
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-1.5, 1.5, (b, h, w, 18)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32))

    def loss_gather(xx, oo, mm):
        return modulated_deform_conv(xx, oo, mm, kernel, stride=1, padding=1,
                                     dilation=1, deform_groups=g).sum()

    def loss_win(xx, oo, mm):
        return modulated_deform_conv_window(xx, oo, mm, kernel, padding=1,
                                            dilation=1, deform_groups=g).sum()

    gx, go, gm = jax.grad(loss_gather, argnums=(0, 1, 2))(x, off, mask)
    wx, wo, wm = jax.grad(loss_win, argnums=(0, 1, 2))(x, off, mask)
    np.testing.assert_allclose(np.asarray(wx), np.asarray(gx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wo), np.asarray(go), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wm), np.asarray(gm), atol=1e-4)


def test_deform_conv_window_clamps_large_offsets(rng):
    """Offsets beyond the radius saturate at the window edge (documented
    deviation): a +10px x-offset behaves exactly like a +radius offset."""
    b, h, w, ci, co = 1, 8, 8, 3, 3
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    big = jnp.zeros((b, h, w, 9, 2)).at[..., 1].set(10.0).reshape(b, h, w, 18)
    capped = jnp.zeros((b, h, w, 9, 2)).at[..., 1].set(2.0).reshape(b, h, w, 18)
    got = modulated_deform_conv_window(x, big, None, kernel, padding=1,
                                       deform_groups=1, radius=2)
    want = modulated_deform_conv_window(x, capped, None, kernel, padding=1,
                                        deform_groups=1, radius=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_deform_conv2d_module_window_impl(rng):
    """DeformConv2d(impl='window') at zero-init equals the gather impl
    exactly (offsets start at 0 → both are a plain conv)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    mg = DeformConv2d(features=4, kernel_size=3, stride=1, padding=2,
                      dilation=2, deformable_groups=2, impl="gather")
    mw = DeformConv2d(features=4, kernel_size=3, stride=1, padding=2,
                      dilation=2, deformable_groups=2, impl="window")
    v = mg.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mw.apply(v, x)),
                               np.asarray(mg.apply(v, x)), atol=2e-5)


def test_deform_conv2d_module_grads(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    m = DeformConv2d(features=4, kernel_size=3, stride=1, padding=2, dilation=2,
                     deformable_groups=2)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 4)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(v)
    # offset conv is zero-init but must receive gradient through sampling
    assert float(jnp.abs(g["params"]["offset_conv"]["kernel"]).sum()) > 0


def test_disparity_metrics():
    gt = jnp.asarray([[0.0, 10.0, 20.0, 100.0]])
    pred = jnp.asarray([[5.0, 11.0, 24.0, 100.0]])
    # valid: last 3 (gt>0); errors 1, 4, 0
    np.testing.assert_allclose(float(epe_metric(pred, gt)), (1 + 4 + 0) / 3, rtol=1e-6)
    # d1: err>3 AND err>5%gt → only the '24 vs 20' pixel
    np.testing.assert_allclose(float(d1_metric(pred, gt)), 1 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(thres_metric(pred, gt, 3.0)), 1 / 3, rtol=1e-6)


def test_disparity_loss_pyramid(rng):
    gt = jnp.asarray(rng.uniform(1, 50, (2, 16, 32)).astype(np.float32))
    full = gt + 0.5
    half = jnp.asarray(rng.uniform(1, 25, (2, 8, 16)).astype(np.float32))
    loss = disparity_loss([half, full], gt)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # perfect prediction at all scales → ~0 (up to resize error on the coarse)
    exact = disparity_loss([full - 0.5], gt)
    np.testing.assert_allclose(float(exact), 0.0, atol=1e-6)
    img = jnp.asarray(rng.uniform(0, 255, (2, 16, 32, 3)).astype(np.float32))
    assert float(smoothness_loss(gt, img)) >= 0


def test_stereo_model_forward(rng):
    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS

    m = StereoDCSS(max_disp=32, num_classes=19, dtype=jnp.float32)
    left = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               left, right, train=False)
    out = m.apply(v, left, right, train=False)
    assert out["disp"].shape == (1, 64, 64)
    assert out["seg"].shape == (1, 64, 64, 19)
    assert np.isfinite(np.asarray(out["disp"])).all()


def test_stereo_model_efficientnet_backbone(rng):
    """BASELINE config 5 (VERDICT r4 item 3): EfficientNet-B0 trunk +
    deformable-conv aggregation/refinement + the disparity head, end to end
    — forward shapes/finiteness AND one gradient step through the whole
    model (the reference never could run this: its efficientnet pyramid
    return arity crashes WeatherNet, weathernet.py:68-70)."""
    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS

    m = StereoDCSS(max_disp=32, num_classes=19, backbone="efficientnetb0",
                   dtype=jnp.float32)
    left = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               left, right, train=False)
    out = m.apply(v, left, right, train=False)
    assert out["disp"].shape == (1, 64, 64)
    assert out["seg"].shape == (1, 64, 64, 19)
    assert np.isfinite(np.asarray(out["disp"])).all()

    gt = jnp.asarray(rng.uniform(0, 20, (1, 64, 64)).astype(np.float32))

    def loss_fn(params):
        o, updates = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.mean(jnp.abs(o["disp"] - gt)), updates

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g * g) for g in
                               jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
    # the efficientnet trunk actually participates in the gradient
    fe = grads["feature_extractor"]
    fe_norm = float(jnp.sqrt(sum(jnp.sum(g * g) for g in
                                 jax.tree_util.tree_leaves(fe))))
    assert fe_norm > 0
