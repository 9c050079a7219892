"""On-device EDT (jump flooding) vs cv2/scipy; single-scale SwiftNet variants;
stereo train step convergence."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.ops.edt import (  # noqa: E402
    distance_transform,
    label_boundary_weights,
)


def test_distance_transform_matches_exact_edt(rng):
    from scipy.ndimage import distance_transform_edt

    mask = rng.random((48, 64)) > 0.7
    mask[20:30, 20:40] = True
    got = np.asarray(distance_transform(jnp.asarray(mask)))
    want = distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nearest_diff_label_collapse_matches_per_class_sum(rng):
    """The one-flood form must reproduce the summed per-class exact EDT:
    at each pixel only its own class term is nonzero, so the sum equals the
    distance to the nearest differently-labeled pixel."""
    from scipy.ndimage import distance_transform_edt, zoom

    from doubly_contrastive_semseg_tpu.ops.edt import nearest_diff_label_distance

    # blocky regions (realistic label structure) + ignore patch + salt noise
    base = rng.integers(0, 5, (12, 16))
    labels = zoom(base, 8, order=0)[:88, :120].astype(np.int32)
    labels[:11, :13] = 255
    salt = rng.random(labels.shape) < 0.003
    labels = np.where(salt, rng.integers(0, 5, labels.shape), labels)

    want = np.zeros(labels.shape, np.float64)
    for c in range(5):
        m = labels == c
        if m.any():
            want += np.where(m, distance_transform_edt(m), 0.0)
    got = np.asarray(nearest_diff_label_distance(jnp.asarray(labels)))
    # out-of-range (ignore) pixels belong to no class mask: the per-class sum
    # is 0 there while the raw flood returns a true distance —
    # label_boundary_weights applies exactly this in-range mask
    got = np.where((labels >= 0) & (labels < 5), got, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_label_boundary_weights_matches_host_transform(rng):
    from PIL import Image

    from doubly_contrastive_semseg_tpu.data.transforms import LabelBoundaryTransform

    labels = rng.integers(0, 5, (32, 32)).astype(np.uint8)
    labels[:4, :4] = 255
    host = LabelBoundaryTransform(num_classes=5)(
        {"label": Image.fromarray(labels)})["label_distance_weight"]
    dev = np.asarray(label_boundary_weights(jnp.asarray(labels.astype(np.int32)), 5))
    # cv2's maskSize=3 chamfer is approximate; exact-EDT weights stay within
    # a small relative band and agree exactly at ignore pixels
    assert (dev[labels == 255] == 0).all()
    np.testing.assert_allclose(dev, host, atol=0.06)


@pytest.mark.slow  # legacy single-scale variant; factory reachability covered in test_models
def test_single_scale_swiftnet(rng):
    from doubly_contrastive_semseg_tpu.models.swiftnet_single import (
        RGBDSwiftNet, SingleScaleSwiftNet)

    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    m = SingleScaleSwiftNet(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y, add = m.apply(v, x, train=False)
    assert y.shape == (1, 16, 16, 128)  # 1/4 resolution, 128 ch

    depth = jnp.asarray(rng.uniform(0, 80, (1, 64, 64)).astype(np.float32))
    m2 = RGBDSwiftNet(dtype=jnp.float32)
    v2 = m2.init(jax.random.PRNGKey(0), x, depth, train=False)
    y2, _ = m2.apply(v2, x, depth, train=False)
    assert y2.shape == (1, 16, 16, 128)


@pytest.mark.slow  # ~70s compile (two trunk passes + cost volume backward);
# the stereo trainer CLI is exercised by scripts/smoke_all.sh step 3 and
# stereo forwards by test_stereo / test_stereo_extras
def test_stereo_train_step_loss_decreases(rng):
    import optax

    from doubly_contrastive_semseg_tpu.config import parse_args
    from doubly_contrastive_semseg_tpu.data.synthetic import SyntheticStereoDataset
    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS
    from doubly_contrastive_semseg_tpu.train.state import TrainState
    from doubly_contrastive_semseg_tpu.train.steps import make_stereo_train_step

    cfg = parse_args(["--dataset", "synthetic", "--train_semantic",
                      "--criterion", "none", "--compute_dtype", "float32",
                      "--lr", "1e-3"])
    ds = SyntheticStereoDataset(size=2, image_hw=(32, 48), max_disp=8)
    batch = {
        "left": jnp.stack([jnp.asarray(ds[i]["left"]) for i in range(2)]),
        "right": jnp.stack([jnp.asarray(ds[i]["right"]) for i in range(2)]),
        "disp": jnp.stack([jnp.asarray(ds[i]["disp"]) for i in range(2)]),
        "label": jnp.stack([jnp.asarray(ds[i]["label"]) for i in range(2)]),
    }
    # stereonet aggregation/refinement: the adaptive/semantic pair compiles
    # ~1 min of deform-conv gather HLO on the 1-core CI host; the heavy
    # variants' forwards are covered by test_stereo / test_stereo_extras
    model = StereoDCSS(max_disp=16, num_classes=19, dtype=jnp.float32,
                       aggregation_type="stereonet",
                       refinement_type="stereonet")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["left"], batch["right"], train=True)
    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = jax.jit(make_stereo_train_step(model, cfg, tx))
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(m["disp_loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
