"""Confusion-matrix / evaluator correctness: on-device path must agree with
the host numpy path (which itself mirrors reference stream_metrics.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.metrics import (  # noqa: E402
    Evaluator,
    confusion_matrix,
    confusion_matrix_per_weather,
    iou_from_confusion,
    weather_confusion_matrix,
)


def test_device_confusion_matches_numpy(rng):
    c = 5
    gt = rng.integers(0, c, (3, 8, 8))
    gt[0, 0, :] = 255  # ignore
    pred = rng.integers(0, c, (3, 8, 8))
    got = np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), c))
    ev = Evaluator(c, 4)
    ev.add_batch(gt, pred)
    np.testing.assert_array_equal(got, ev.confusion_matrix)


def test_per_weather_confusion(rng):
    c, w = 4, 3
    gt = rng.integers(0, c, (6, 5, 5))
    pred = rng.integers(0, c, (6, 5, 5))
    weather = rng.integers(0, w, (6,))
    got = np.asarray(confusion_matrix_per_weather(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(weather), c, w))
    ev = Evaluator(c, w)
    ev.add_batch(gt, pred, weather)
    np.testing.assert_array_equal(got, ev.confusion_matrix_sem_weather)
    # totals decompose: sum over weather == overall matrix
    np.testing.assert_array_equal(got.sum(0), ev.confusion_matrix)


def test_weather_clf_confusion(rng):
    w = 4
    gt = rng.integers(0, w, (10,))
    logits = rng.standard_normal((10, w)).astype(np.float32)
    cm, acc = weather_confusion_matrix(jnp.asarray(gt), jnp.asarray(logits), w)
    ev = Evaluator(5, w)
    ev.add_batch_weather(gt, logits)
    np.testing.assert_array_equal(np.asarray(cm), ev.confusion_matrix_weather)
    assert abs(float(acc) - ev.weather_acc[0]) < 1e-6


def test_iou_results_match_evaluator(rng):
    c = 6
    gt = rng.integers(0, c, (4, 16, 16))
    pred = rng.integers(0, c, (4, 16, 16))
    ev = Evaluator(c, 4)
    ev.add_batch(gt, pred)
    dev = iou_from_confusion(jnp.asarray(ev.confusion_matrix))
    ref = ev.get_results()
    for k in ("Overall Acc", "Mean Acc", "FreqW Acc", "Mean IoU"):
        np.testing.assert_allclose(float(dev[k]), ref[k], rtol=1e-6)


def test_perfect_prediction_miou_is_one(rng):
    gt = rng.integers(0, 19, (2, 10, 10))
    ev = Evaluator(19, 4)
    ev.add_batch(gt, gt)
    assert ev.get_results()["Mean IoU"] == pytest.approx(1.0)
    assert ev.Pixel_Accuracy() == pytest.approx(1.0)


def test_merge_device_batch_equivalent(rng):
    c, w = 5, 4
    gt = rng.integers(0, c, (3, 8, 8))
    pred = rng.integers(0, c, (3, 8, 8))
    weather = rng.integers(0, w, (3,))
    cm = confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), c)
    cmw = confusion_matrix_per_weather(jnp.asarray(gt), jnp.asarray(pred),
                                       jnp.asarray(weather), c, w)
    ev1 = Evaluator(c, w)
    ev1.merge_device_batch(cm, cmw)
    ev2 = Evaluator(c, w)
    ev2.add_batch(gt, pred, weather)
    np.testing.assert_array_equal(ev1.confusion_matrix, ev2.confusion_matrix)
    np.testing.assert_array_equal(ev1.confusion_matrix_sem_weather,
                                  ev2.confusion_matrix_sem_weather)


def test_report_files(tmp_path, rng):
    c = 19
    gt = rng.integers(0, c, (2, 8, 8))
    ev = Evaluator(c, 4)
    ev.add_batch(gt, gt, np.array([0, 1]))
    f = str(tmp_path / "val_results.txt")
    miou = ev.Mean_Intersection_over_Union(f)
    ev.Mean_Intersection_over_Union_each_weather(f)
    ev.add_batch_weather(np.array([0, 1]), np.eye(4, dtype=np.float32)[[0, 1]])
    ev.get_weather_results(f)
    text = open(f).read()
    assert "road" in text and "purity score" in text
    assert miou == pytest.approx(1.0)
