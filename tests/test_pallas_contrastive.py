"""Fused contrastive kernel (interpret mode on CPU) vs the XLA reference
implementation — must agree to float tolerance."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.losses.supcon import supcon_loss  # noqa: E402
from doubly_contrastive_semseg_tpu.ops.contrastive_pallas import (  # noqa: E402
    supcon_loss_pallas,
)


@pytest.mark.parametrize("with_labels", [True, False])
def test_pallas_supcon_matches_xla(rng, with_labels):
    b, d = 16, 64
    f = jnp.asarray(rng.standard_normal((b, 2, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (b,))) if with_labels else None
    want = float(supcon_loss(f, labels))
    got = float(supcon_loss_pallas(f, labels, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pallas_supcon_large_n(rng):
    """N > one tile (streams multiple column tiles)."""
    b, d = 160, 32  # N = 320 → 3 tiles of 128
    f = jnp.asarray(rng.standard_normal((b, 2, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 7, (b,)))
    want = float(supcon_loss(f, labels))
    got = float(supcon_loss_pallas(f, labels, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("with_labels", [True, False])
def test_pallas_supcon_grad_matches_xla(rng, with_labels):
    """The hand-derived chunked VJP (custom_vjp backward) vs jax.grad of the
    XLA path — gradient flows through the row-L2 norm, max shift detached."""
    b, d = 24, 48
    f = jnp.asarray(rng.standard_normal((b, 2, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (b,))) if with_labels else None
    g_xla = jax.grad(lambda ff: supcon_loss(ff, labels, use_pallas=False))(f)
    g_pal = jax.grad(
        lambda ff: supcon_loss_pallas(ff, labels, interpret=True))(f)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-6)


def test_pallas_pixel_contrast_grad_matches_xla(rng):
    """Pixel-contrast custom-VJP backward (per-pair denominator, in-slab
    t_i = Σ_pos 1/D_ik) vs jax.grad of _masked_contrastive; invalid anchors
    must receive exactly-zero gradient."""
    from doubly_contrastive_semseg_tpu.losses.pixel_contrast import (
        _masked_contrastive)
    from doubly_contrastive_semseg_tpu.ops.contrastive_pallas import (
        pixel_contrast_loss_pallas)

    a_n, n_valid = 80, 61
    feats = jnp.asarray(rng.standard_normal((a_n, 2, 32)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (a_n,)))
    valid = jnp.asarray(np.arange(a_n) < n_valid)
    g_xla = jax.grad(
        lambda ff: _masked_contrastive(ff, labels, valid, 0.07, 0.07))(feats)
    g_pal = jax.grad(
        lambda ff: pixel_contrast_loss_pallas(ff, labels, valid,
                                              interpret=True))(feats)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-6)
    assert float(jnp.max(jnp.abs(g_pal[n_valid:]))) == 0.0


def test_pallas_pixel_contrast_matches_masked_contrastive(rng):
    """The 4-sweep pixel-contrast kernel vs losses.pixel_contrast.
    _masked_contrastive (itself value+gradient oracle-matched against the
    torch reference): per-pair log-denominator semantics, validity masking,
    multiple column tiles."""
    from doubly_contrastive_semseg_tpu.losses.pixel_contrast import (
        _masked_contrastive)
    from doubly_contrastive_semseg_tpu.ops.contrastive_pallas import (
        pixel_contrast_loss_pallas)

    for a_n, n_valid in [(9, 9), (80, 61), (140, 120)]:  # 1 and 3 col tiles
        feats = jnp.asarray(rng.standard_normal((a_n, 2, 32)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 5, (a_n,)))
        valid = jnp.asarray(np.arange(a_n) < n_valid)
        want = float(_masked_contrastive(feats, labels, valid, 0.07, 0.07))
        got = float(pixel_contrast_loss_pallas(feats, labels, valid,
                                               interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
