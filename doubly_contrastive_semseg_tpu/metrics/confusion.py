"""On-device streaming confusion matrices.

The reference pulls every prediction to the host and runs ``np.bincount``
per batch (``metrics/stream_metrics.py:330-342``) — a device→host sync in the
middle of the validation hot loop. Here the confusion matrix is a small
on-device accumulator updated inside the jitted eval step (one-hot
matmul → MXU), so validation runs sync-free and the matrix crosses to the
host once per epoch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def confusion_matrix(
    gt: jax.Array, pred: jax.Array, num_classes: int
) -> jax.Array:
    """(C, C) counts with rows = ground truth, cols = prediction.

    Pixels outside [0, num_classes) (ignore=255) are dropped — the reference's
    mask at ``stream_metrics.py:331``.
    """
    gt = gt.reshape(-1)
    pred = pred.reshape(-1)
    valid = (gt >= 0) & (gt < num_classes)
    # one-hot contraction: cm[i, j] = Σ_p [gt_p == i][pred_p == j]
    gt_oh = jax.nn.one_hot(jnp.where(valid, gt, num_classes), num_classes + 1,
                           dtype=jnp.float32)[:, :num_classes]
    pred_oh = jax.nn.one_hot(jnp.clip(pred, 0, num_classes - 1), num_classes,
                             dtype=jnp.float32)
    return (gt_oh.T @ pred_oh).astype(jnp.float32)


def confusion_matrix_per_weather(
    gt: jax.Array, pred: jax.Array, weather: jax.Array,
    num_classes: int, weather_num: int,
) -> jax.Array:
    """(W, C, C): per-weather-condition confusion matrices
    (reference ``stream_metrics.py:341-342`` keeps a dict of per-weather
    matrices; here one stacked tensor updated with a segment-sum)."""
    b = gt.shape[0]
    per_img = jax.vmap(lambda g, p: confusion_matrix(g, p, num_classes))(gt, pred)
    w_oh = jax.nn.one_hot(weather.reshape(-1), weather_num, dtype=jnp.float32)  # (B, W)
    return jnp.einsum("bw,bij->wij", w_oh, per_img)


def weather_confusion_matrix(
    gt_weather: jax.Array, weather_logits: jax.Array, weather_num: int
) -> Tuple[jax.Array, jax.Array]:
    """((W, W) confusion, batch top-1 accuracy) for the weather classifier
    (reference ``stream_metrics.py:345-352``)."""
    pred = jnp.argmax(weather_logits, axis=-1).reshape(-1)
    gt = gt_weather.reshape(-1)
    gt_oh = jax.nn.one_hot(gt, weather_num, dtype=jnp.float32)
    pred_oh = jax.nn.one_hot(pred, weather_num, dtype=jnp.float32)
    cm = gt_oh.T @ pred_oh
    acc = jnp.mean((pred == gt).astype(jnp.float32))
    return cm, acc


def iou_from_confusion(cm: jax.Array) -> Dict[str, jax.Array]:
    """mIoU / accuracies from a confusion matrix (reference
    ``stream_metrics.py:404-427`` ``get_results``). NaN-safe like np.nanmean."""
    diag = jnp.diagonal(cm)
    rows = cm.sum(axis=1)
    cols = cm.sum(axis=0)
    union = rows + cols - diag
    iu = diag / union  # NaN where class absent from both gt and pred
    acc = diag.sum() / cm.sum()
    acc_cls = jnp.nanmean(diag / rows)
    mean_iu = jnp.nanmean(iu)
    freq = rows / cm.sum()
    fwavacc = jnp.nansum(jnp.where(freq > 0, freq * iu, 0.0))
    return {
        "Overall Acc": acc,
        "Mean Acc": acc_cls,
        "FreqW Acc": fwavacc,
        "Mean IoU": mean_iu,
        "Class IoU": iu,
    }
