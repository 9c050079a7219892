"""Golden / property tests for the loss stack (formulas from reference
utils/loss.py — see the loss module docstrings for line citations)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.losses import (  # noqa: E402
    boundary_aware_focal_loss,
    cross_entropy_loss,
    pixel_contrast_loss,
    plain_focal_loss,
    supcon_loss,
)
from doubly_contrastive_semseg_tpu.losses.pixel_contrast import (  # noqa: E402
    _hard_anchor_sampling,
    _masked_contrastive,
)


# ---------------------------------------------------------------- focal / CE

def _np_log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _np_focal(logits, target, alphas, weight, gamma, ignore_id, mode):
    t = np.where(target == ignore_id, 0, target)
    logp = _np_log_softmax(logits.astype(np.float64))
    logpt = np.take_along_axis(logp, t[..., None], -1)[..., 0]
    pt = np.exp(logpt)
    focal = np.exp(gamma * (1 - pt))
    if mode == "plain_focal":
        per = -focal * logpt
    elif mode == "no_class_weights":
        per = -alphas * focal * logpt
    elif mode == "no_EDT":
        per = -weight[t] * focal * logpt
    else:
        per = -weight[t] * alphas * focal * logpt
    n = (alphas > 0).sum()
    return per.sum() / max(n, 1)


@pytest.mark.parametrize("mode", ["full", "plain_focal", "no_class_weights", "no_EDT"])
def test_boundary_aware_focal_matches_formula(rng, mode):
    logits = rng.standard_normal((2, 5, 5, 4)).astype(np.float32)
    target = rng.integers(0, 4, (2, 5, 5))
    target[0, 0, 0] = 255
    alphas = rng.uniform(0, 1, (2, 5, 5)).astype(np.float32)
    alphas[target == 255] = 0.0  # EDT zeroes ignore pixels by construction
    weight = rng.uniform(0.5, 2.0, (4,)).astype(np.float32)
    got = float(boundary_aware_focal_loss(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(alphas),
        jnp.asarray(weight), gamma=0.5, ignore_id=255, mode=mode))
    want = _np_focal(logits, target, alphas, weight, 0.5, 255, mode)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_all_ignored_returns_zero():
    logits = jnp.zeros((1, 3, 3, 4))
    target = jnp.full((1, 3, 3), 255)
    alphas = jnp.zeros((1, 3, 3))
    w = jnp.ones((4,))
    assert float(boundary_aware_focal_loss(logits, target, alphas, w)) == 0.0
    assert float(plain_focal_loss(logits, target, alphas)) == 0.0


def test_cross_entropy_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits = rng.standard_normal((2, 6, 6, 5)).astype(np.float32)
    target = rng.integers(0, 5, (2, 6, 6))
    target[1, 2, :] = 255
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    want = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(target).long(), ignore_index=255).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ----------------------------------------------------------------- supcon

def _np_supcon(features, labels, t=0.07, bt=0.07):
    """Independent numpy transcription of the SupCon math incl. the
    reference's row-normalization tweak (utils/loss.py:175-204)."""
    b = features.shape[0]
    mask = np.eye(b) if labels is None else (labels[:, None] == labels[None, :]).astype(np.float64)
    c = np.concatenate([features[:, 0], features[:, 1]], 0).astype(np.float64)
    n = 2 * b
    logits = c @ c.T / t
    logits = logits - logits.max(1, keepdims=True)
    mask = np.tile(mask, (2, 2)) * (1 - np.eye(n))
    norm = np.maximum(np.linalg.norm(logits, axis=1, keepdims=True), 1e-12)
    logits = logits / norm
    el = np.exp(logits) * (1 - np.eye(n))
    logp = logits - np.log(el.sum(1, keepdims=True))
    mlpp = (mask * logp).sum(1) / mask.sum(1)
    return float((-(t / bt) * mlpp).mean())


def test_supcon_matches_formula(rng):
    f = rng.standard_normal((6, 2, 16)).astype(np.float32)
    labels = rng.integers(0, 3, (6,))
    got = float(supcon_loss(jnp.asarray(f), jnp.asarray(labels)))
    np.testing.assert_allclose(got, _np_supcon(f, labels), rtol=1e-5)


def test_simclr_matches_formula(rng):
    f = rng.standard_normal((5, 2, 8)).astype(np.float32)
    got = float(supcon_loss(jnp.asarray(f), None))
    np.testing.assert_allclose(got, _np_supcon(f, None), rtol=1e-5)


def test_supcon_gradient_flows(rng):
    f = jnp.asarray(rng.standard_normal((4, 2, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (4,)))
    g = jax.grad(lambda x: supcon_loss(x, labels))(f)
    assert float(jnp.abs(g).sum()) > 0


# ------------------------------------------------------------ pixel contrast

def test_hard_anchor_sampling_properties(rng):
    b, p, d, c = 2, 64, 8, 4
    feats = jnp.asarray(rng.standard_normal((b, p, d)).astype(np.float32))
    labels = rng.integers(0, c, (b, p))
    labels[0, :5] = 255  # some ignore pixels
    preds = rng.integers(0, c, (b, p))
    af, al, valid = _hard_anchor_sampling(
        feats, jnp.asarray(labels), jnp.asarray(preds), c, jax.random.PRNGKey(0))
    af, al, valid = np.asarray(af), np.asarray(al), np.asarray(valid)
    assert af.shape == (b * c, 2, d) and al.shape == (b * c,)
    # validity: strictly more than max_views (=2) pixels of that class
    for bi in range(b):
        for ci in range(c):
            want = (labels[bi] == ci).sum() > 2
            assert valid[bi * c + ci] == want
    # every valid anchor's sampled features must be actual pixels of its class
    feats_np = np.asarray(feats)
    for bi in range(b):
        for ci in range(c):
            if not valid[bi * c + ci]:
                continue
            cls_feats = feats_np[bi][labels[bi] == ci]
            for vi in range(2):
                sampled = af[bi * c + ci, vi]
                assert any(np.allclose(sampled, cf) for cf in cls_feats)


def test_hard_anchor_prefers_one_hard_one_easy():
    # image where class 0 has both hard and easy pixels at known locations
    b, p, d, c = 1, 16, 4, 2
    labels = np.zeros((b, p), np.int64)
    preds = np.zeros((b, p), np.int64)
    preds[0, :4] = 1  # pixels 0-3 are "hard" for class 0 (pred != gt)
    feats = np.zeros((b, p, d), np.float32)
    feats[0, :4] = 1.0   # hard pixels have feature 1
    feats[0, 4:] = 2.0   # easy pixels have feature 2
    af, _, valid = _hard_anchor_sampling(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(preds), c,
        jax.random.PRNGKey(3))
    af = np.asarray(af)
    assert valid[0]
    pair = sorted(af[0, :, 0].tolist())
    assert pair == [1.0, 2.0]  # one hard + one easy (loss.py:314-316)


def test_hard_anchor_sampling_distribution(rng):
    """Statistical check of the selection rules (reference loss.py:314-331):
    with both kinds present the pick is always 1 hard + 1 easy, and the hard
    pick is ~uniform over the hard set (randperm-without-replacement
    semantics)."""
    b, p, d, c = 1, 32, 4, 2
    labels = np.zeros((b, p), np.int64)          # all pixels class 0
    preds = np.zeros((b, p), np.int64)
    hard_set = [0, 5, 9, 17]
    preds[0, hard_set] = 1                       # 4 hard pixels
    feats = np.zeros((b, p, d), np.float32)
    feats[0, :, 0] = np.arange(p)                # identify pixels by feature
    feats_j = jnp.asarray(feats)

    counts = np.zeros(p)
    trials = 300
    for t in range(trials):
        af, _, valid = _hard_anchor_sampling(
            feats_j, jnp.asarray(labels), jnp.asarray(preds), c,
            jax.random.PRNGKey(t))
        af = np.asarray(af)
        assert valid[0]
        pix = af[0, :, 0].astype(int)            # the two sampled pixel ids
        kinds = [int(px in hard_set) for px in pix]
        assert sorted(kinds) == [0, 1]           # exactly 1 hard + 1 easy
        hard_px = pix[kinds.index(1)]
        counts[hard_px] += 1
    freq = counts[hard_set] / trials
    # each of the 4 hard pixels should be picked ~25% of the time
    np.testing.assert_allclose(freq, 0.25, atol=0.08)


def test_masked_contrastive_equals_compacted(rng):
    """The validity-masked contrast must equal running the same math on the
    physically compacted (valid-only) anchor set — proving padding anchors
    are invisible."""
    a, v, d = 8, 2, 16
    feats = rng.standard_normal((a, v, d)).astype(np.float32)
    labels = rng.integers(0, 3, (a,))
    valid = np.array([1, 1, 0, 1, 0, 1, 1, 0], bool)
    got = float(_masked_contrastive(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(valid), 0.07, 0.07))
    want = float(_masked_contrastive(
        jnp.asarray(feats[valid]), jnp.asarray(labels[valid]),
        jnp.ones(valid.sum(), bool), 0.07, 0.07))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pixel_contrast_end_to_end(rng):
    b, h, w, d, c = 2, 12, 12, 16, 5
    feats = jnp.asarray(rng.standard_normal((b, h, w, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, (b, 4 * h, 4 * w)))
    logits = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    loss = pixel_contrast_loss(feats, labels, logits, jax.random.PRNGKey(0),
                               num_classes=c)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda f: pixel_contrast_loss(
        f, labels, logits, jax.random.PRNGKey(0), num_classes=c))(feats)
    assert float(jnp.abs(g).sum()) > 0


def test_pixel_contrast_no_valid_anchors_returns_zero():
    b, h, w, d, c = 1, 4, 4, 8, 3
    feats = jnp.ones((b, h, w, d))
    labels = jnp.full((b, 16, 16), 255)  # everything ignored
    logits = jnp.ones((b, h, w, c))
    loss = pixel_contrast_loss(feats, labels, logits, jax.random.PRNGKey(0),
                               num_classes=c)
    assert float(loss) == 0.0
