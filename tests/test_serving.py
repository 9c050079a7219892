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
