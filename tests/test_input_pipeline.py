"""Planar input/output pipeline: must be numerically identical to the
reference-parity NHWC ops it replaces."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.ops.input_pipeline import (  # noqa: E402
    build_pyramid_planar,
    downsample2x_bicubic_planar,
    s2d_stem_geometry,
    space_to_depth2_nhwc,
    stem_s2d_kernel_from_dense,
    to_planar,
    upsample4x_argmax,
)
from doubly_contrastive_semseg_tpu.ops.interpolate import (  # noqa: E402
    downsample2x_bicubic,
    resize_bilinear,
)


def test_planar_bicubic_matches_nhwc(rng):
    x = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    want = np.asarray(downsample2x_bicubic(jnp.asarray(x)))
    got = np.asarray(downsample2x_bicubic_planar(to_planar(jnp.asarray(x))))
    np.testing.assert_allclose(got.transpose(0, 2, 3, 1), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [7, 3])
def test_s2d_stem_equals_dense_conv(rng, k):
    b, h, w, c, o = 2, 16, 20, 3, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    w_dense = rng.standard_normal((k, k, c, o)).astype(np.float32)
    p = k // 2
    want = jax.lax.conv_general_dilated(
        x, jnp.asarray(w_dense), (2, 2), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xs = space_to_depth2_nhwc(to_planar(x))
    w_s2d = jnp.asarray(stem_s2d_kernel_from_dense(w_dense))
    _, pad = s2d_stem_geometry(k)
    got = jax.lax.conv_general_dilated(
        xs, w_s2d, (1, 1), [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_build_pyramid_planar_shapes(rng):
    x = jnp.asarray(rng.uniform(0, 255, (1, 32, 64, 3)).astype(np.float32))
    pyr = build_pyramid_planar(x, 3, (73.15, 82.9, 72.3), (47.67, 48.49, 47.73),
                               dtype=jnp.float32)
    assert [p.shape for p in pyr] == [(1, 3, 32, 64), (1, 3, 16, 32), (1, 3, 8, 16)]
    # normalization applied
    want = (np.asarray(x)[0, 0, 0] - np.array([73.15, 82.9, 72.3])) / \
        np.array([47.67, 48.49, 47.73])
    np.testing.assert_allclose(np.asarray(pyr[0][0, :, 0, 0]), want, rtol=1e-5)


def test_upsample4x_argmax_matches_reference_path(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 12, 19)).astype(np.float32))
    want = np.asarray(jnp.argmax(
        resize_bilinear(logits, (32, 48)), axis=-1))
    got = np.asarray(upsample4x_argmax(logits))
    assert (got == want).mean() > 0.999  # ties may flip on dtype order


def test_fused_pyramid_matches_torch_direct(rng):
    """Every pyramid level must equal torch's DIRECT
    ``F.interpolate(image, scale_factor=2^-L, mode='bicubic')`` — including
    border pixels (per-pixel clamp) and both the W-folded and plain conv
    paths. Uses float32-precision convs (the default CPU/TPU conv precision
    is bf16-grade, which would mask real errors behind rounding)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from doubly_contrastive_semseg_tpu.ops.input_pipeline import fused_pyramid_s2d

    from doubly_contrastive_semseg_tpu.ops.input_pipeline import (
        level0_to_cmajor)

    mean, std = (73.15, 82.9, 72.3), (47.67, 48.49, 47.73)

    def unpack(p):
        b, h2, w2, _ = p.shape
        y = np.asarray(p).reshape(b, h2, w2, 3, 2, 2)
        o = np.zeros((b, h2 * 2, w2 * 2, 3), np.float32)
        for dy in range(2):
            for dx in range(2):
                o[:, dy::2, dx::2, :] = y[:, :, :, :, dy, dx]
        return o

    for hw in [(32, 48), (64, 128), (64, 56)]:  # fold-eligible + plain widths
        x = rng.uniform(0, 255, (1, *hw, 3)).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        xn = (xt - torch.tensor(mean).view(1, -1, 1, 1)) / \
            torch.tensor(std).view(1, -1, 1, 1)
        with jax.default_matmul_precision("highest"):
            pyr = fused_pyramid_s2d(jnp.asarray(x), 3, mean, std, jnp.float32)
            # NHWC input: level 0 is dy-major — unpack through the perm
            pyr = [level0_to_cmajor(pyr[0], jnp.asarray(x))] + list(pyr[1:])
        for lv in range(3):
            want = xn if lv == 0 else F.interpolate(
                xn, scale_factor=0.5 ** lv, mode="bicubic")
            got = unpack(pyr[lv]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-5,
                                       err_msg=f"hw={hw} level={lv}")


def test_downsample_direct_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from doubly_contrastive_semseg_tpu.ops.interpolate import (
        downsample_bicubic_direct)

    x = rng.standard_normal((2, 32, 48, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for lv in (1, 2, 3):
        want = F.interpolate(xt, scale_factor=0.5 ** lv, mode="bicubic").numpy()
        with jax.default_matmul_precision("highest"):
            got = np.asarray(downsample_bicubic_direct(jnp.asarray(x), lv))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=2e-5, atol=2e-5, err_msg=f"level={lv}")


def test_s2d_packed_input_bit_exact(rng):
    """Host-packed s2d input (s2d_pack, c-major channels) and the NHWC path
    (dy-major level 0) must agree: level 0 bit-exactly through the static
    channel permutation (same normalize arithmetic on the same values),
    levels >= 1 to reduction-order rounding (the level kernels contract the
    permuted input channels in a different order)."""
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import (
        fused_pyramid_s2d, image_hw, level0_to_cmajor, s2d_pack)

    x = rng.uniform(0, 255, (2, 32, 64, 3)).astype(np.float32)
    mean, std = (73.15, 82.9, 72.3), (47.67, 48.49, 47.73)
    a = fused_pyramid_s2d(jnp.asarray(x), 3, mean, std, jnp.float32)
    b = fused_pyramid_s2d(jnp.asarray(s2d_pack(x)), 3, mean, std, jnp.float32)
    assert image_hw(jnp.asarray(s2d_pack(x))) == (32, 64)
    np.testing.assert_array_equal(
        np.asarray(level0_to_cmajor(a[0], jnp.asarray(x))), np.asarray(b[0]))
    for la, lb in zip(a[1:], b[1:]):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-6)
