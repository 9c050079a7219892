"""On-device augmentation: contract + semantics."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.data.device_augment import augment_batch  # noqa: E402


@pytest.fixture(scope="module")
def batch(rng=None):
    rng = np.random.default_rng(3)
    return (
        jnp.asarray(rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 19, (2, 96, 128))),
        jnp.asarray([1, 0]),
    )


def test_augment_contract(batch):
    imgs, lbls, wea = batch
    out = augment_batch(imgs, lbls, wea, jax.random.PRNGKey(0),
                        crop=64, two_crop=True, use_gamma=True)
    assert out["left"].shape == (4, 64, 64, 3)
    assert out["label"].shape == (2, 64, 64)
    assert out["label_distance_weight"].shape == (2, 64, 64)
    l = np.asarray(out["left"])
    lb = np.asarray(out["label"])
    w = np.asarray(out["label_distance_weight"])
    assert l.min() >= 0 and l.max() <= 255
    assert set(np.unique(lb)) <= set(range(19)) | {255}
    assert (w[lb != 255] > 0).all() and w.max() <= 1.0001
    assert (w[lb == 255] == 0).all()
    # two views are independent crops
    assert not np.array_equal(l[0], l[2])


def test_augment_deterministic_per_key(batch):
    imgs, lbls, wea = batch
    a = augment_batch(imgs, lbls, wea, jax.random.PRNGKey(5), crop=32)
    b = augment_batch(imgs, lbls, wea, jax.random.PRNGKey(5), crop=32)
    c = augment_batch(imgs, lbls, wea, jax.random.PRNGKey(6), crop=32)
    np.testing.assert_array_equal(np.asarray(a["left"]), np.asarray(b["left"]))
    assert not np.array_equal(np.asarray(a["left"]), np.asarray(c["left"]))


def test_gamma_applied_to_night_only(batch):
    imgs, lbls, _ = batch
    dark = imgs * 0.2  # dark frames brighten visibly under γ=0.4
    wea = jnp.asarray([1, 0])
    out_g = augment_batch(dark, lbls, wea, jax.random.PRNGKey(1),
                          crop=32, two_crop=False, use_gamma=True)
    out_n = augment_batch(dark, lbls, wea, jax.random.PRNGKey(1),
                          crop=32, two_crop=False, use_gamma=False)
    lg, ln = np.asarray(out_g["left"]), np.asarray(out_n["left"])
    assert lg[0].mean() > ln[0].mean() + 5  # night frame brightened
    np.testing.assert_allclose(lg[1], ln[1], atol=1e-4)  # fog untouched
