"""Serving path: on CPU the serving fn must equal argmax(seg) of the plain
model forward (the Pallas head only engages on TPU backends)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.models import DCSSModel  # noqa: E402
from doubly_contrastive_semseg_tpu.models.serving import make_serving_fn  # noqa: E402


def test_serving_fn_matches_model_argmax(rng):
    model = DCSSModel(backbone="resnet18", num_classes=19, weather_num=4,
                      dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    serve = make_serving_fn(model)
    got = np.asarray(serve(v, x))
    want = np.asarray(jnp.argmax(model.apply(v, x, train=False)["seg"], axis=-1))
    assert got.shape == want.shape == (1, 64, 128)
    assert (got == want).mean() > 0.999  # dtype-order ties only


def test_dcss_s2d_input_matches_nhwc(rng):
    """DCSSModel on host-packed s2d batches (c-major level 0) vs plain NHWC
    (dy-major level 0 + stem-kernel permutation): the seg logits must agree
    to reduction-order rounding — guards the dy-major relayout's weight-perm
    plumbing across the whole backbone."""
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

    model = DCSSModel(backbone="resnet18", num_classes=19, weather_num=4,
                      dtype=jnp.float32)
    x = rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    a = model.apply(v, jnp.asarray(x), train=False)["seg"]
    b = model.apply(v, jnp.asarray(s2d_pack(x)), train=False)["seg"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_stereo_serving_fn_matches_model(rng):
    """make_stereo_serving_fn returns (disp, labels) equal to the plain
    StereoDCSS forward's disp / argmax(seg) (CPU planar path)."""
    from doubly_contrastive_semseg_tpu.models.serving import make_stereo_serving_fn
    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS

    model = StereoDCSS(max_disp=32, num_classes=19,
                       refinement_type="disp_sem", dtype=jnp.float32)
    l = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, l, r, train=False)
    disp, labels = make_stereo_serving_fn(model)(v, l, r)
    out = model.apply(v, l, r, train=False)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(out["disp"]),
                               rtol=0, atol=1e-5)
    want = np.asarray(jnp.argmax(out["seg"], axis=-1))
    assert labels.shape == want.shape == (1, 64, 128)
    assert (np.asarray(labels) == want).mean() > 0.999


def test_stereo_serving_fn_disparity_only(rng):
    """train_semantic=False models have no semantic head: the serving fn must
    return (disp, None) instead of KeyError-ing on out['seg']."""
    from doubly_contrastive_semseg_tpu.models.serving import make_stereo_serving_fn
    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS

    model = StereoDCSS(max_disp=32, num_classes=19, train_semantic=False,
                       refinement_type="stereodrnet", dtype=jnp.float32)
    l = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, l, r, train=False)
    disp, labels = make_stereo_serving_fn(model)(v, l, r)
    out = model.apply(v, l, r, train=False)
    assert "seg" not in out
    assert labels is None
    np.testing.assert_allclose(np.asarray(disp), np.asarray(out["disp"]),
                               rtol=0, atol=1e-5)


def test_s2d_unpack_roundtrip(rng):
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import (s2d_pack,
                                                                  s2d_unpack)

    x = rng.uniform(0, 255, (2, 8, 12, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(s2d_unpack(s2d_pack(x))), x)


def test_image_stem_s2d_fold_matches_dense(rng):
    """_ImageStem7x7 on s2d-packed input == the dense 7x7/s2 conv on NHWC
    (the SemRefine stem's fast path for host-packed stereo batches)."""
    from doubly_contrastive_semseg_tpu.models.stereo_extras import _ImageStem7x7
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

    x = rng.standard_normal((1, 16, 24, 3)).astype(np.float32)
    m = _ImageStem7x7(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    dense = m.apply(v, jnp.asarray(x))
    folded = m.apply(v, jnp.asarray(s2d_pack(x)))
    np.testing.assert_allclose(np.asarray(folded), np.asarray(dense),
                               rtol=0, atol=1e-5)


def test_stereo_dcss_s2d_input_matches_nhwc(rng):
    """StereoDCSS accepts host-packed s2d batches: disparity and seg logits
    match the NHWC forward (trunk fold + SemRefine stem fold are exact)."""
    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

    model = StereoDCSS(max_disp=32, num_classes=19,
                       refinement_type="disp_sem", dtype=jnp.float32)
    l = rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32)
    r = rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = model.init(keys, jnp.asarray(l), jnp.asarray(r), train=False)
    out_nhwc = model.apply(v, jnp.asarray(l), jnp.asarray(r), train=False)
    out_s2d = model.apply(v, jnp.asarray(s2d_pack(l)), jnp.asarray(s2d_pack(r)),
                          train=False)
    np.testing.assert_allclose(np.asarray(out_s2d["disp"]),
                               np.asarray(out_nhwc["disp"]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_s2d["seg"]),
                               np.asarray(out_nhwc["seg"]),
                               rtol=1e-4, atol=1e-3)
    assert out_s2d["disp"].shape == (1, 64, 128)
    assert out_s2d["seg"].shape == (1, 64, 128, 19)
