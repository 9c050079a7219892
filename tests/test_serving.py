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
