"""Evaluator + deterministic-transform parity against the reference
implementation (black-box oracle from /root/reference). The validation
protocol and the EDT boundary weighting are what an ACDC mIoU number rides
on, so they get value-level parity checks, not just formula tests."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "metrics")),
    reason="reference repo not available")


def _ref_import(module: str):
    from test_reference_parity import _install_torchvision_stubs

    _install_torchvision_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        return importlib.import_module(module)
    finally:
        sys.path.remove(REFERENCE)


def test_evaluator_matches_reference(rng, tmp_path):
    """Confusion matrices, mIoU, pixel/class acc, per-weather mIoU, weather
    confusion + purity — same numbers as the reference Evaluator on the same
    prediction stream."""
    sm = _ref_import("metrics.stream_metrics")
    from doubly_contrastive_semseg_tpu.metrics.evaluator import Evaluator

    c, w = 19, 4
    ref = sm.Evaluator(c, w)
    mine = Evaluator(c, w)

    for step in range(3):
        gt = rng.integers(0, c, (2, 24, 32))
        gt[0, :3] = 255  # ignored pixels fall outside the reference's mask
        pred = rng.integers(0, c, (2, 24, 32))
        weather = rng.integers(0, w, (2,))
        ref.add_batch(gt, pred, weather)
        mine.add_batch(gt, pred, weather)

        wlogits = rng.standard_normal((2, w)).astype(np.float32)
        ref.add_batch_weather(torch.tensor(weather), torch.tensor(wlogits))
        mine.add_batch_weather(weather, wlogits)

    np.testing.assert_allclose(mine.confusion_matrix, ref.confusion_matrix)
    for wea in range(w):
        np.testing.assert_allclose(mine.confusion_matrix_sem_weather[wea],
                                   ref.confusion_matrix_sem_weather[str(wea)])
    np.testing.assert_allclose(mine.confusion_matrix_weather,
                               ref.confusion_matrix_weather)

    np.testing.assert_allclose(mine.Pixel_Accuracy(), ref.Pixel_Accuracy())
    np.testing.assert_allclose(mine.Pixel_Accuracy_Class(),
                               ref.Pixel_Accuracy_Class())
    f_ref = str(tmp_path / "ref_val_results.txt")
    f_my = str(tmp_path / "my_val_results.txt")
    np.testing.assert_allclose(mine.Mean_Intersection_over_Union(f_my),
                               ref.Mean_Intersection_over_Union(f_ref))

    # absent-class edge: a stream where some classes never appear must
    # produce the SAME NaN/nanmean behavior as the reference (wrapping both
    # sides in nan_to_num would mask exactly this divergence)
    ref2, mine2 = sm.Evaluator(c, w), Evaluator(c, w)
    gt2 = rng.integers(0, 3, (2, 24, 32))        # only classes 0-2 present
    pred2 = rng.integers(0, 3, (2, 24, 32))
    wea2 = rng.integers(0, w, (2,))
    ref2.add_batch(gt2, pred2, wea2)
    mine2.add_batch(gt2, pred2, wea2)
    want = ref2.Mean_Intersection_over_Union(str(tmp_path / "r2.txt"))
    got = mine2.Mean_Intersection_over_Union(str(tmp_path / "m2.txt"))
    assert np.isnan(want) == np.isnan(got)
    if not np.isnan(want):
        np.testing.assert_allclose(got, want)


def test_label_boundary_transform_matches_reference(rng):
    """EDT boundary weights: identical to the reference's cv2-based
    LabelBoundaryTransform on the same label map."""
    ct = _ref_import("dataloaders.custom_transforms_acdc")
    from doubly_contrastive_semseg_tpu.data.transforms import (
        LabelBoundaryTransform)

    label = rng.integers(0, 19, (48, 64)).astype(np.uint8)
    label[:6, :6] = 255
    ref_out = ct.LabelBoundaryTransform(num_classes=19, reduce=True)(
        {"label": Image.fromarray(label)})
    my_out = LabelBoundaryTransform(num_classes=19, reduce=True)(
        {"label": Image.fromarray(label)})
    np.testing.assert_allclose(my_out["label_distance_weight"],
                               ref_out["label_distance_weight"],
                               rtol=1e-6, atol=1e-7)


def test_gamma_correction_matches_reference(rng):
    """γ=0.4 LUT on night images only — byte-identical to the reference."""
    ct = _ref_import("dataloaders.custom_transforms_acdc")
    from doubly_contrastive_semseg_tpu.data.transforms import GammaCorrection

    img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    for weather, changed in ((1, True), (0, False)):
        ref_out = ct.GammaCorrection()( {"left": Image.fromarray(img.copy()),
                                         "weather": weather})
        my_out = GammaCorrection()({"left": Image.fromarray(img.copy()),
                                    "weather": weather})
        np.testing.assert_array_equal(np.asarray(my_out["left"]),
                                      np.asarray(ref_out["left"]))
        assert (np.asarray(ref_out["left"]) != img).any() == changed


def test_fixed_resize_matches_reference(rng):
    ct = _ref_import("dataloaders.custom_transforms_acdc")
    from doubly_contrastive_semseg_tpu.data.transforms import FixedResize

    img = Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8))
    lbl = Image.fromarray(rng.integers(0, 19, (40, 56)).astype(np.uint8))
    ref_out = ct.FixedResize(rescale_size=(28, 20))({"left": img.copy(),
                                             "label": lbl.copy()})
    my_out = FixedResize(size=(28, 20))({"left": img.copy(), "label": lbl.copy()})
    np.testing.assert_array_equal(np.asarray(my_out["left"]),
                                  np.asarray(ref_out["left"]))
    np.testing.assert_array_equal(np.asarray(my_out["label"]),
                                  np.asarray(ref_out["label"]))


def test_random_square_crop_and_scale_matches_reference(rng):
    """Given IDENTICAL random draws (np.random reseeded, adapter around the
    legacy module API), the crop box + pad + PIL bicubic/nearest resizes are
    byte-identical to the reference's RandomSquareCropAndScale."""
    ct = _ref_import("dataloaders.custom_transforms_acdc")
    from doubly_contrastive_semseg_tpu.data.transforms import (
        RandomSquareCropAndScale)

    img = Image.fromarray(rng.integers(0, 255, (90, 120, 3), dtype=np.uint8))
    lbl = Image.fromarray(rng.integers(0, 19, (90, 120)).astype(np.uint8))
    mean = (73, 82, 72)

    np.random.seed(42)
    ref_out = ct.RandomSquareCropAndScale(wh=(64, 64), mean=mean, ignore_id=255)(
        {"left": img.copy(), "label": lbl.copy(), "left_name": "x.png"})

    class _LegacyRng:
        """np.random-module adapter matching the Generator API my transform
        uses, drawing from the same legacy global stream as the reference."""

        uniform = staticmethod(np.random.uniform)

        def integers(self, low, high):
            return np.random.randint(low, high)

        def random(self):
            return np.random.random()

    np.random.seed(42)
    my_out = RandomSquareCropAndScale(wh=(64, 64), mean=mean, ignore_id=255,
                                      rng=_LegacyRng())(
        {"left": img.copy(), "label": lbl.copy()})

    np.testing.assert_array_equal(np.asarray(my_out["left"]),
                                  np.asarray(ref_out["left"]))
    np.testing.assert_array_equal(np.asarray(my_out["label"]),
                                  np.asarray(ref_out["label"]))
