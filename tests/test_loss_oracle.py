"""Loss-level parity against the reference implementation — every flagship
loss including PixelContrast (its random anchor sampling is oracle-tested on
draw-irrelevant inputs here, and distribution-tested in test_losses.py).

Imports ``utils.loss`` from /root/reference as a black-box oracle and
compares values on identical inputs, including the reference's documented
deviations (the ``F.normalize(logits)`` stability hack in SupCon)."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "utils")),
    reason="reference repo not available")


def _ref_losses():
    from test_reference_parity import _install_torchvision_stubs

    _install_torchvision_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        import utils.loss as ref_loss
    finally:
        sys.path.remove(REFERENCE)
    return ref_loss


@pytest.mark.parametrize("criterion,flags", [
    ("supcon_pixelcontrast_focal", {}),
    ("plain_focal", {}),
    ("supcon_focal", {"no_class_weights": True}),
    ("supcon_focal", {"no_EDT": True}),
])
def test_boundary_aware_focal_matches_reference(rng, criterion, flags):
    ref_loss = _ref_losses()
    b, c, s = 2, 19, 16
    logits = rng.standard_normal((b, c, s, s)).astype(np.float32)
    target = rng.integers(0, c, (b, s, s))
    target[0, :4, :4] = 255  # ignore region
    alphas = rng.uniform(0, 1, (b, s, s)).astype(np.float32)
    alphas[target == 255] = 0.0  # EDT weights are zero at ignore
    weight = rng.uniform(0.5, 2.0, (c,)).astype(np.float32)

    opts = types.SimpleNamespace(criterion=criterion,
                                 no_class_weights=flags.get("no_class_weights", False),
                                 no_EDT=flags.get("no_EDT", False),
                                 with_depth_level_loss=False)
    crit = ref_loss.BoundaryAwareFocalLoss(
        gamma=0.5, num_classes=c, ignore_id=255,
        weight=torch.tensor(np.concatenate([weight, [0.0] * 237])), device="cpu",
        opts=opts)
    want = float(crit(
        torch.tensor(logits), torch.tensor(target.copy()),  # ref mutates target
        {"label_distance_weight": torch.tensor(alphas)}))

    from doubly_contrastive_semseg_tpu.losses.focal import boundary_aware_focal_loss

    got = float(boundary_aware_focal_loss(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))),
        jnp.asarray(target), jnp.asarray(alphas), jnp.asarray(weight),
        gamma=0.5,
        mode=("plain_focal" if criterion == "plain_focal" else
              "no_class_weights" if flags.get("no_class_weights") else
              "no_EDT" if flags.get("no_EDT") else "full")))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_supcon_and_simclr_match_reference(rng):
    """SupCon (weather labels) and SimCLR (no labels) values, with the
    reference's own projection-head weights copied across."""
    ref_loss = _ref_losses()
    b, d, h, w = 6, 128, 4, 4
    feats = rng.standard_normal((2 * b, d, h, w)).astype(np.float32)
    labels = rng.integers(0, 4, (b,))

    opts = types.SimpleNamespace(deeplab=False)
    torch.manual_seed(0)
    crit = ref_loss.SupConLoss(temperature=0.07, base_temperature=0.07,
                               device="cpu", opts=opts)
    with torch.no_grad():
        want_sup = float(crit(torch.tensor(feats), torch.tensor(labels)))
        want_sim = float(crit(torch.tensor(feats), None))

    # replicate GAP + the reference head with ITS weights, then my loss fn
    from doubly_contrastive_semseg_tpu.losses.supcon import supcon_loss

    pooled = feats.mean(axis=(2, 3))  # (2B, D)
    f1, f2 = pooled[:b], pooled[b:]
    stacked = np.stack([f1, f2], axis=1)  # (B, 2, D)
    w1 = crit.projection[0].weight.detach().numpy()
    b1 = crit.projection[0].bias.detach().numpy()
    w2 = crit.projection[2].weight.detach().numpy()
    b2 = crit.projection[2].bias.detach().numpy()
    proj = np.maximum(stacked @ w1.T + b1, 0.0) @ w2.T + b2

    got_sup = float(supcon_loss(jnp.asarray(proj), jnp.asarray(labels)))
    got_sim = float(supcon_loss(jnp.asarray(proj), None))
    np.testing.assert_allclose(got_sup, want_sup, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_sim, want_sim, rtol=1e-5, atol=1e-6)


def test_focal2_and_ce_match_reference(rng):
    ref_loss = _ref_losses()
    b, c, s = 2, 19, 12
    logits = rng.standard_normal((b, c, s, s)).astype(np.float32)
    target = rng.integers(0, c, (b, s, s))
    target[1, :3] = 255
    weight = rng.uniform(0.5, 2.0, (c,)).astype(np.float32)

    alphas = rng.uniform(0, 1, (b, s, s)).astype(np.float32)
    alphas[target == 255] = 0.0
    crit = ref_loss.FocalLoss2(gamma=0.5, num_classes=c, ignore_id=255,
                               weight=torch.tensor(np.concatenate([weight, [0.0] * 237])),
                               device="cpu")
    want = float(crit(torch.tensor(logits), torch.tensor(target.copy()),
                      {"label_distance_weight": torch.tensor(alphas)}))

    from doubly_contrastive_semseg_tpu.losses.focal import (
        cross_entropy_loss, plain_focal_loss)

    got = float(plain_focal_loss(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(target),
        jnp.asarray(alphas), gamma=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    import torch.nn.functional as F

    want_ce = float(F.cross_entropy(torch.tensor(logits),
                                    torch.tensor(target.copy()),
                                    ignore_index=255))
    got_ce = float(cross_entropy_loss(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(target)))
    np.testing.assert_allclose(got_ce, want_ce, rtol=1e-5, atol=1e-6)


def test_pixel_contrast_contrastive_matches_reference(rng):
    """PixelContrastLoss._contrastive (reference loss.py:339-389) vs
    _masked_contrastive with an all-valid mask: value AND gradient, closing
    the one loss-level oracle hole (round-2 VERDICT weak #2)."""
    ref_loss = _ref_losses()
    a_n, v, d = 9, 2, 16
    feats = rng.standard_normal((a_n, v, d)).astype(np.float32)
    labels = rng.integers(0, 4, (a_n,)).astype(np.float32)

    crit = ref_loss.PixelContrastLoss(device="cpu")
    feats_t = torch.tensor(feats, requires_grad=True)
    loss_t = crit._contrastive(feats_t, torch.tensor(labels))
    loss_t.backward()
    want, want_grad = float(loss_t), feats_t.grad.numpy()

    from doubly_contrastive_semseg_tpu.losses.pixel_contrast import (
        _masked_contrastive)

    def fn(x):
        return _masked_contrastive(x, jnp.asarray(labels.astype(np.int32)),
                                   jnp.ones((a_n,), bool), 0.07, 0.07)

    got, got_grad = jax.value_and_grad(fn)(jnp.asarray(feats))
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_grad), want_grad,
                               rtol=1e-4, atol=1e-6)


def test_pixel_contrast_forward_matches_reference(rng):
    """Full PixelContrastLoss.forward (reference loss.py:391-415) vs
    pixel_contrast_loss on inputs where every random draw is value-irrelevant:
    within each (image, class) anchor the hard pixels all share one feature
    vector and the easy pixels another, so whichever indices randperm / the
    top-k sampler select, the gathered anchors are identical. Exercises all
    three selection branches (hard+easy / easy-only / hard-only), invalid
    (count<=max_views) classes, and the ignore region."""
    ref_loss = _ref_losses()
    b, c, s, d = 2, 5, 12, 8
    labels = np.full((b, s, s), 255, np.int64)
    preds = np.zeros((b, s, s), np.int64)
    feats = rng.standard_normal((b, s, s, d)).astype(np.float32)

    def plant(bi, cls, n_hard, n_easy, row):
        """Plant n_hard+n_easy pixels of class cls on row `row`; hard pixels
        share one random feature, easy pixels another."""
        u = rng.standard_normal(d).astype(np.float32)
        w = rng.standard_normal(d).astype(np.float32)
        col = 0
        for _ in range(n_hard):
            labels[bi, row, col] = cls
            preds[bi, row, col] = (cls + 1) % c
            feats[bi, row, col] = u
            col += 1
        for _ in range(n_easy):
            labels[bi, row, col] = cls
            preds[bi, row, col] = cls
            feats[bi, row, col] = w
            col += 1

    plant(0, 0, 1, 3, row=0)    # hard+easy branch
    plant(0, 1, 0, 4, row=1)    # easy-only branch
    plant(0, 2, 3, 0, row=2)    # hard-only branch
    plant(0, 3, 1, 1, row=3)    # count==2 == max_views -> INVALID, skipped
    plant(1, 1, 2, 2, row=0)
    plant(1, 4, 0, 5, row=1)

    logits = np.eye(c, dtype=np.float32)[preds] * 10.0          # argmax==preds

    crit = ref_loss.PixelContrastLoss(device="cpu")
    want = float(crit(
        torch.tensor(np.transpose(feats, (0, 3, 1, 2))),
        torch.tensor(labels),
        torch.tensor(np.transpose(logits, (0, 3, 1, 2)))))

    from doubly_contrastive_semseg_tpu.losses.pixel_contrast import (
        pixel_contrast_loss)

    got = float(pixel_contrast_loss(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(logits),
        jax.random.PRNGKey(0), num_classes=c))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_smooth_l1_matches_torch(rng):
    """The disparity loss's smooth-L1 elementwise kernel vs torch's own
    F.smooth_l1_loss (beta=1) — the reference's DisparityLosses block
    (loss.py:478-565) is commented out there, so torch's public op is the
    ground truth for the formulation it used."""
    import torch
    import torch.nn.functional as F

    from doubly_contrastive_semseg_tpu.losses.disparity import _smooth_l1

    x = rng.standard_normal((64, 64)).astype(np.float32) * 3.0
    got = np.asarray(_smooth_l1(jnp.asarray(x)))
    want = F.smooth_l1_loss(torch.tensor(x), torch.zeros(64, 64),
                            reduction="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_oracle_holds_under_production_compile_flags():
    """The whole suite runs with jax_disable_most_optimizations=True for
    compile speed (conftest), i.e. numerics are asserted under a compilation
    mode production never uses. This meta-test re-runs a representative
    oracle (focal/CE vs the torch reference) in a subprocess with
    NO_FAST_COMPILE=1 so the full XLA optimization pipeline gets periodic
    coverage in the slow tier."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["NO_FAST_COMPILE"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         os.path.join(os.path.dirname(__file__),
                      "test_loss_oracle.py::test_focal2_and_ce_match_reference")],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_pixel_contrast_deterministic_select_matches_pinned_reference(rng):
    """A/B flagship enabler (VERDICT r4 item 2): with the reference's
    torch.randperm pinned to the identity permutation (what the A/B driver
    does under AB_PIN_RANDPERM=1), its hard-anchor sampling picks the FIRST
    raster-order indices of each hard/easy list; our deterministic_select
    path must gather the exact same pixels on fully RANDOM inputs — no
    draw-invariance crutch — including the label downsample."""
    ref_loss = _ref_losses()
    b, c, s, d = 2, 6, 16, 8
    feats = rng.standard_normal((b, s, s, d)).astype(np.float32)
    labels = rng.integers(0, c, (b, 2 * s, 2 * s)).astype(np.int64)
    labels[0, :6, :6] = 255                     # ignore region
    logits = rng.standard_normal((b, s, s, c)).astype(np.float32)

    real_randperm = torch.randperm
    torch.randperm = lambda n, **k: torch.arange(n)
    try:
        crit = ref_loss.PixelContrastLoss(device="cpu")
        want = float(crit(
            torch.tensor(np.transpose(feats, (0, 3, 1, 2))),
            torch.tensor(labels),
            torch.tensor(np.transpose(logits, (0, 3, 1, 2)))))
    finally:
        torch.randperm = real_randperm

    from doubly_contrastive_semseg_tpu.losses.pixel_contrast import (
        pixel_contrast_loss)

    got = float(pixel_contrast_loss(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(logits),
        jax.random.PRNGKey(0), num_classes=c, deterministic_select=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
