"""Every criterion branch of the dispatch (reference trainer.py:116-203) must
produce a finite total with the documented combination rule."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.config import CRITERIA, parse_args  # noqa: E402
from doubly_contrastive_semseg_tpu.losses import compute_total_loss  # noqa: E402

SEG_ONLY = {"plain_focal", "none", "supcon_none", "supcon_simclr", "supcon"}


def _fake_outputs(rng, b=2, s=32, c=19, d=16):
    return {
        "seg": jnp.asarray(rng.standard_normal((b, s, s, c)).astype(np.float32)),
        "seg_beforeup": jnp.asarray(rng.standard_normal((b, s // 4, s // 4, c)).astype(np.float32)),
        "fine_feat0": jnp.asarray(rng.standard_normal((b, s // 4, s // 4, d)).astype(np.float32)),
        "supcon_proj": jnp.asarray(rng.standard_normal((b, 2, d)).astype(np.float32)),
    }


@pytest.mark.parametrize("criterion", list(CRITERIA))
def test_every_criterion_finite(rng, criterion):
    cfg = parse_args(["--dataset", "synthetic", "--train_semantic",
                      "--criterion", criterion, "--batch_size", "2"])
    outputs = _fake_outputs(rng)
    batch = {
        "label": jnp.asarray(rng.integers(0, 19, (2, 32, 32))),
        "label_distance_weight": jnp.asarray(
            rng.uniform(0.1, 1, (2, 32, 32)).astype(np.float32)),
        "weather": jnp.asarray(rng.integers(0, 4, (2,))),
    }
    total, comps = compute_total_loss(cfg, outputs, batch,
                                      jnp.ones((19,)), jax.random.PRNGKey(0))
    assert np.isfinite(float(total)), criterion
    if criterion in SEG_ONLY:
        np.testing.assert_allclose(float(total), float(comps["seg_loss"]), rtol=1e-6)
    if criterion == "supcon_pixelcontrast_focal":  # flagship rule (trainer.py:158)
        want = (float(comps["supcon_loss"]) + float(comps["pixelcontrast_loss"])) / 2 \
            + 1.2 * float(comps["seg_loss"])
        np.testing.assert_allclose(float(total), want, rtol=1e-6)
    if criterion == "crossentropy":
        np.testing.assert_allclose(float(total), float(comps["ce_loss"]), rtol=1e-6)
