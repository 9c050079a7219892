"""Parity of resize primitives against torch's interpolation semantics
(the reference's in-model ops — see ops/interpolate.py docstrings)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from doubly_contrastive_semseg_tpu.ops import (  # noqa: E402
    adaptive_avg_pool,
    downsample2x_bicubic,
    resize_bilinear,
    resize_nearest,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("in_hw,out_hw", [((6, 6), (12, 12)), ((5, 7), (20, 28)),
                                          ((4, 4), (16, 16)), ((5, 6), (15, 18)),
                                          ((4, 6), (8, 30))])
def test_bilinear_matches_torch_align_corners_false(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    want = _to_nhwc(F.interpolate(_nchw(x), size=out_hw, mode="bilinear", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nearest_matches_torch_asymmetric(rng):
    x = rng.integers(0, 19, size=(2, 16, 24)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), (4, 6)))
    want = F.interpolate(torch.from_numpy(x)[:, None], size=(4, 6), mode="nearest")[:, 0].numpy()
    np.testing.assert_array_equal(got, want)


def test_bicubic_downsample_matches_torch(rng):
    x = rng.standard_normal((1, 16, 20, 3)).astype(np.float32)
    got = np.asarray(downsample2x_bicubic(jnp.asarray(x)))
    want = _to_nhwc(F.interpolate(_nchw(x), scale_factor=0.5, mode="bicubic", align_corners=False))
    # interior matches exactly; borders differ by clamp-vs-reflect of the
    # outermost tap — torch also clamps, so this should be tight everywhere
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("grid", [(1, 1), (3, 4), (2, 2), (6, 8)])
def test_adaptive_avg_pool_matches_torch(rng, grid):
    x = rng.standard_normal((2, 24, 32, 5)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), grid))
    want = _to_nhwc(F.adaptive_avg_pool2d(_nchw(x), grid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_adaptive_avg_pool_unequal_windows(rng):
    x = rng.standard_normal((1, 7, 9, 2)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), (3, 4)))
    want = _to_nhwc(F.adaptive_avg_pool2d(_nchw(x), (3, 4)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
