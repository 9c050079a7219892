"""Aux tools (t-SNE) + photometric transforms + hourglass variant +
in-process validate loop."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from doubly_contrastive_semseg_tpu.config import parse_args  # noqa: E402
from doubly_contrastive_semseg_tpu.data import ColorJitter, RandomHorizontalFlip  # noqa: E402


def _sample(h=32, w=40, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "left": Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)),
        "label": Image.fromarray(rng.integers(0, 5, (h, w)).astype(np.uint8)),
    }


def test_color_jitter_changes_image_only():
    s = _sample()
    before = np.array(s["left"]).copy()
    lbl_before = np.array(s["label"]).copy()
    out = ColorJitter(brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1,
                      rng=np.random.default_rng(1))(s)
    assert not np.array_equal(np.array(out["left"]), before)
    np.testing.assert_array_equal(np.array(out["label"]), lbl_before)


def test_color_jitter_single_op_matches_pil_backend():
    """Each jitter op is torchvision's PIL backend (fork
    custom_transforms.py:1060-1077): contrast blends against the GRAYSCALE
    mean (ImageEnhance.Contrast), not the RGB mean, and every op saturates
    to uint8; hue works without cv2."""
    from PIL import ImageEnhance

    s = _sample(seed=3)
    # reproduce the factor draw, then check the op IS ImageEnhance.Contrast
    rng = np.random.default_rng(7)
    f = float(np.random.default_rng(7).uniform(0.5, 1.5))
    out = ColorJitter(contrast=0.5, rng=rng)(dict(s))
    want = ImageEnhance.Contrast(s["left"]).enhance(f)
    np.testing.assert_array_equal(np.array(out["left"]), np.array(want))

    # hue-only must not be a silent no-op (the cv2-less path used to drop it)
    out_h = ColorJitter(hue=0.5, rng=np.random.default_rng(0))(dict(s))
    assert not np.array_equal(np.array(out_h["left"]), np.array(s["left"]))


def test_horizontal_flip_pairs_image_and_label():
    s = _sample()
    img = np.array(s["left"]).copy()
    lbl = np.array(s["label"]).copy()
    out = RandomHorizontalFlip(p=1.0)(s)
    np.testing.assert_array_equal(np.array(out["left"]), img[:, ::-1])
    np.testing.assert_array_equal(np.array(out["label"]), lbl[:, ::-1])


@pytest.mark.slow
def test_hourglass_swiftnet(rng):
    from doubly_contrastive_semseg_tpu.models.swiftnet_single import HourglassSwiftNet

    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    m = HourglassSwiftNet(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (1, 16, 16, 128)


def test_tsne_tool_runs(tmp_path):
    from doubly_contrastive_semseg_tpu.tools.tsne import Viz

    cfg = parse_args(["--dataset", "synthetic", "--criterion", "none",
                      "--train_semantic", "--debug", "--compute_dtype", "float32",
                      "--no_efficient",
                      "--run_root", str(tmp_path), "--batch_size", "4"])
    viz = Viz(cfg)
    out = viz.run(mode="image")
    import os

    assert os.path.isfile(out)


def test_trainer_validate_in_process(tmp_path):
    """Drive Trainer.validate directly: the on-device accumulators must land
    in the Evaluator and produce a coherent score dict."""
    from doubly_contrastive_semseg_tpu.train import Trainer

    cfg = parse_args(["--dataset", "synthetic", "--criterion", "none",
                      "--train_semantic", "--debug", "--compute_dtype", "float32",
                      "--no_efficient", "--batch_size", "2", "--val_batch_size", "2",
                      "--run_root", str(tmp_path), "--epochs", "1"])
    tr = Trainer(cfg)
    score = tr.validate()
    assert 0.0 <= score["Mean IoU"] <= 1.0
    assert tr.evaluator.confusion_matrix.sum() > 0
    # per-weather matrices decompose the overall matrix
    np.testing.assert_allclose(
        tr.evaluator.confusion_matrix_sem_weather.sum(0),
        tr.evaluator.confusion_matrix)
    # checkpoints written (latest; best too since first validate improves 0.0)
    import os

    ckpts = os.listdir(tr.saver.checkpoint_dir)
    assert any("latest_checkpoint" in c for c in ckpts)


def test_wandb_bridge_with_stub(tmp_path, monkeypatch):
    """Exercise the wandb mirror path (reference main.py:13-16) with a stub
    module — the real package is absent in this image, so without this the
    bridge would ship forever-untested."""
    import sys
    import types

    calls = {"init": [], "log": []}
    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: calls["init"].append(kw)
    stub.log = lambda d: calls["log"].append(d)
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from doubly_contrastive_semseg_tpu.utils.summaries import SummaryWriter

    w = SummaryWriter(str(tmp_path), enable_tb=False)
    w.init_wandb("dcss-test")
    w.add_scalar("train/total_loss", 1.25, step=3)
    w.close()

    assert calls["init"] == [{"project": "dcss-test", "sync_tensorboard": True}]
    assert calls["log"] == [{"train/total_loss": 1.25}]
    # jsonl sink wrote the same scalar
    import json as _json
    rows = [_json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[-1]["tag"] == "train/total_loss" and rows[-1]["value"] == 1.25


def _stereo_sample(h=40, w=56, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    return {
        "left": img.copy(),
        "right": np.roll(img, 3, axis=1),
        "disp": rng.uniform(0, 8, (h, w)).astype(np.float32),
        "label": rng.integers(0, 5, (h, w)).astype(np.uint8),
    }


def test_stereo_photometrics_pair_symmetric_and_pil_exact():
    """Reference dataloaders/transforms.py:173-258: one draw applied to BOTH
    eyes; the adjustments are torchvision's PIL backend — checked against
    PIL.ImageEnhance / the uint8-HSV rotate / the truncating gamma LUT."""
    from PIL import Image, ImageEnhance

    from doubly_contrastive_semseg_tpu.data.stereo_transforms import (
        RandomColor, adjust_brightness, adjust_gamma, adjust_hue)

    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (24, 32, 3)).astype(np.uint8))

    # brightness IS ImageEnhance.Brightness
    np.testing.assert_array_equal(
        np.asarray(adjust_brightness(img, 1.3)),
        np.asarray(ImageEnhance.Brightness(img).enhance(1.3)))

    # gamma LUT: truncating 255*(x/255)^g
    g = 0.8
    got = np.asarray(adjust_gamma(img, g))
    want = (255.0 * (np.arange(256) / 255.0) ** g).astype(np.int64)
    np.testing.assert_array_equal(got, want[np.asarray(img)])

    # hue: equals the verbatim uint8-HSV round trip (torchvision's PIL
    # backend — the quantization loss is part of the reference semantics)
    rt = np.asarray(adjust_hue(img, 0.0))
    want_rt = np.asarray(Image.merge(
        "HSV", img.convert("HSV").split()).convert("RGB"))
    np.testing.assert_array_equal(rt, want_rt)

    # NEGATIVE hue factors must wrap mod 256, not crash (NumPy 2.x raises
    # OverflowError converting a negative int to uint8): compare against the
    # explicit uint8-HSV rotation done in RGB space
    for f in (-0.1, -0.5, 0.37):
        got = np.asarray(adjust_hue(img, f))
        h0, s0, v0 = img.convert("HSV").split()
        h_rot = np.asarray(h0) + np.uint8(int(f * 255) % 256)  # wraps
        want = np.asarray(Image.merge(
            "HSV", (Image.fromarray(h_rot, "L"), s0, v0)).convert("RGB"))
        np.testing.assert_array_equal(got, want)

    # RandomColor applies the identical draw to both eyes: equal inputs in,
    # equal outputs out — across many random configurations
    for seed in range(6):
        s = _stereo_sample(seed=seed)
        s["right"] = s["left"].copy()
        out = RandomColor(rng=np.random.default_rng(seed))(dict(s))
        np.testing.assert_array_equal(out["left"], out["right"])
        assert out["left"].dtype == np.float32


def test_stereo_random_crop_and_flip():
    """StereoRandomCrop (reference transforms.py:63-133 + fork RandomCrop2):
    top/right zero-pad when smaller (labels take label_pad), one shared
    offset across all keys when larger; center crop in validate mode.
    StereoRandomVerticalFlip flips every key together."""
    from doubly_contrastive_semseg_tpu.data.stereo_transforms import (
        StereoRandomCrop, StereoRandomVerticalFlip)

    s = _stereo_sample()
    # pad path (48 > 40 rows): top pad, right pad; label filled with 255
    out = StereoRandomCrop(48, 64, label_pad=255)(dict(s))
    assert out["left"].shape == (48, 64, 3)
    np.testing.assert_array_equal(out["left"][8:, :56], s["left"])
    assert (out["left"][:8] == 0).all() and (out["left"][:, 56:] == 0).all()
    assert (out["label"][:8] == 255).all()
    assert (out["disp"][:8] == 0).all()

    # crop path: shared offset — the left/label crops stay aligned
    rng = np.random.default_rng(3)
    out = StereoRandomCrop(16, 24, rng=rng)(dict(s))
    assert out["left"].shape == (16, 24, 3)
    pos = None
    for oy in range(40 - 16 + 1):
        for ox in range(56 - 24 + 1):
            if np.array_equal(s["left"][oy:oy + 16, ox:ox + 24], out["left"]):
                pos = (oy, ox)
    assert pos is not None
    oy, ox = pos
    np.testing.assert_array_equal(s["label"][oy:oy + 16, ox:ox + 24], out["label"])
    np.testing.assert_array_equal(s["disp"][oy:oy + 16, ox:ox + 24], out["disp"])

    # validate => center crop
    out = StereoRandomCrop(16, 24, validate=True)(dict(s))
    np.testing.assert_array_equal(s["left"][12:28, 16:40], out["left"])

    # flip: all keys flip together (p forced via rng that draws < 0.5 first)
    out = StereoRandomVerticalFlip(p=1.1)(dict(s))
    np.testing.assert_array_equal(out["left"], s["left"][::-1])
    np.testing.assert_array_equal(out["disp"], s["disp"][::-1])
    np.testing.assert_array_equal(out["label"], s["label"][::-1])


def test_label_distance_transform_binned_alphas():
    """Fork custom_transforms.py:1664-1695: per-class L2 EDT (maskSize=5),
    summed, digitized into bins with per-bin alphas, zero at ignore."""
    import cv2

    from doubly_contrastive_semseg_tpu.data.stereo_transforms import (
        LabelDistanceTransform)

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, (32, 32)).astype(np.uint8)
    labels[:4, :4] = 255

    t = LabelDistanceTransform(num_classes=3, reduce=True)
    out = t({"label": labels.copy()})
    alphas = out["label_distance_alphas"]
    assert alphas.shape == labels.shape
    assert (alphas[labels == 255] == 0).all()
    assert set(np.unique(alphas)) <= {0.0, 8.0, 6.0, 4.0, 2.0, 1.0}

    # verbatim recomputation of the reference math
    dist = np.zeros((3,) + labels.shape, np.float32) - 1.0
    for i in range(3):
        m = labels == i
        if m.any():
            dist[i][m] = cv2.distanceTransform(np.uint8(m), cv2.DIST_L2, 5)[m]
    dist[dist < 0] = 0
    d = dist.sum(0)
    bins = np.digitize(d, (4, 16, 64, 128))
    want = np.zeros_like(d)
    for idx, a in enumerate((8.0, 6.0, 4.0, 2.0, 1.0)):
        want[bins == idx] = a
    want[labels == 255] = 0
    np.testing.assert_array_equal(alphas, want)

    # reduce=False keeps the per-class stack
    out2 = LabelDistanceTransform(num_classes=3)({"label": labels.copy()})
    assert out2["label_distance_transform"].shape == (3,) + labels.shape


def test_stereo_trainer_pipeline_unifies_mixed_kitti_sizes():
    """The stereo trainer's KITTI pipeline (RandomColor → StereoRandomCrop →
    ToArrays, trainer_stereo._stereo_dataset) must turn mixed-resolution
    frames (KITTI is 375×1242 / 370×1224 / …) into one batchable shape —
    previously they flowed through bare ToArrays and np.stack raised."""
    from doubly_contrastive_semseg_tpu.data.loader import collate
    from doubly_contrastive_semseg_tpu.data.stereo_transforms import (
        RandomColor, StereoRandomCrop)
    from doubly_contrastive_semseg_tpu.data.transforms import Compose, ToArrays
    from doubly_contrastive_semseg_tpu.train.trainer_stereo import (
        _STEREO_TRAIN_HW, _STEREO_VAL_HW)

    th, tw = _STEREO_TRAIN_HW["kitti_2015"]
    assert th % 32 == 0 and tw % 32 == 0  # pyramid-friendly
    vh, vw = _STEREO_VAL_HW["kitti_2015"]
    assert vh % 32 == 0 and vw % 32 == 0

    rng = np.random.default_rng(0)
    train_t = Compose([RandomColor(rng=rng),
                       StereoRandomCrop(th, tw, label_pad=255, rng=rng),
                       ToArrays()])
    sizes = [(375, 1242), (370, 1224), (376, 1241)]
    batch = collate([train_t(_stereo_sample(h, w, seed=i))
                     for i, (h, w) in enumerate(sizes)])
    assert batch["left"].shape == (3, th, tw, 3)
    assert batch["right"].shape == (3, th, tw, 3)
    assert batch["disp"].shape == (3, th, tw)
    # narrow wire dtype: uint8 labels (train ids ≤ 255), widened on device
    # by train/steps.py::ingest_batch
    assert batch["label"].dtype == np.uint8

    # val: KITTI pads (smaller both ways) to the standard 384×1248
    val_t = Compose([StereoRandomCrop(vh, vw, validate=True, label_pad=255),
                     ToArrays()])
    vbatch = collate([val_t(_stereo_sample(h, w, seed=i))
                      for i, (h, w) in enumerate(sizes)])
    assert vbatch["left"].shape == (3, vh, vw, 3)
    # padded disparity pixels are 0 → excluded by the gt>0 metric masks
    # (top pad is vh − h per sample; every sample pads at least vh − 376 rows)
    assert (vbatch["disp"][:, :vh - 376, :] == 0).all()
