"""Jitted train / eval steps.

One compiled program per phase replaces the reference's eager hot loops
(``trainer.py:62-215`` train, ``trainer.py:303-402`` validate). Parallelism is
a sharding annotation: batches are sharded over the mesh's 'data' axis and
params replicated — XLA GSPMD inserts the gradient all-reduce (the
``nn.DataParallel`` replacement) and reduces BatchNorm's batch moments over
the *global* batch (the ``sync_batchnorm/`` replacement) automatically.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import compute_total_loss, weather_classifier_metrics
from ..metrics.confusion import (
    confusion_matrix,
    confusion_matrix_per_weather,
    weather_confusion_matrix,
)
from .state import TrainState


def ingest_batch(batch: Dict) -> Dict:
    """Device-side widening of the loader's narrow wire dtypes.

    The host pipeline ships images/labels as uint8 (``data/transforms.py::
    ToArrays`` — 3× fewer bytes through collate and the H2D copy); compute
    wants float images and int32 labels. uint8→float32/int32 is exact, and
    inside jit the cast fuses into the first consumer, so numerics are
    bit-identical to a float32 wire. Float inputs pass through untouched
    (device-resident benches, legacy callers)."""
    out = dict(batch)
    for k in ("left", "right"):
        if k in out and jnp.issubdtype(out[k].dtype, jnp.integer):
            out[k] = out[k].astype(jnp.float32)
    if "label" in out and out["label"].dtype != jnp.int32:
        out["label"] = out["label"].astype(jnp.int32)
    return out


def make_train_step(model, cfg, tx) -> Callable:
    """Returns train_step(state, batch, rng, class_weight) -> (state, metrics)."""
    use_supcon = cfg.use_supcon
    on_acdc = cfg.dataset in ("acdc", "acdc_city", "synthetic")

    def loss_fn(params, batch_stats, batch, rng):
        batch = ingest_batch(batch)
        rng_drop, rng_loss = jax.random.split(rng)
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["left"], train=True, return_supcon_feature=use_supcon,
            mutable=["batch_stats"], rngs={"dropout": rng_drop},
        )
        total, comps = compute_total_loss(cfg, outputs, batch, batch["class_weight"], rng_loss)
        aux = {"outputs": outputs, "batch_stats": mutated["batch_stats"], "comps": comps}
        return total, aux

    def train_step(state: TrainState, batch: Dict, rng: jax.Array) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, state.step)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        metrics = dict(aux["comps"])
        if on_acdc:
            # weather head monitoring, excluded from total (trainer.py:109-114,205-206)
            w_ce, w_acc = weather_classifier_metrics(
                aux["outputs"]["weather_logits"], batch["weather"])
            metrics["weather_loss"] = w_ce
            metrics["weather_clf_acc"] = w_acc
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg) -> Callable:
    """Returns eval_step(params, batch_stats, batch, accum) -> (preds, accum).

    ``accum`` carries the on-device confusion matrices
    ((C,C), (W,C,C), (W,W), weather-acc sum, batch count) so validation runs
    without per-batch host syncs (reference pulls preds to numpy every batch,
    ``trainer.py:349-354``).
    """
    c, w = cfg.num_classes, cfg.weather_num
    on_acdc = cfg.dataset in ("acdc", "acdc_city", "synthetic")

    # weather logits come from the same model apply: at eval there is no
    # two-view split, so fine_feat0 == fine_feat and the in-model classifier
    # output equals the reference's weather_clf(fine_feat) (trainer.py:345-347)
    def eval_step(params, batch_stats, batch, accum):
        batch = ingest_batch(batch)
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["left"], train=False, return_supcon_feature=False,
        )
        preds = jnp.argmax(outputs["seg"], axis=-1).astype(jnp.int32)
        if "label" in batch:
            labels = batch["label"]
            accum["cm"] = accum["cm"] + confusion_matrix(labels, preds, c)
            if on_acdc and "weather" in batch:
                accum["cm_weather_sem"] = accum["cm_weather_sem"] + \
                    confusion_matrix_per_weather(labels, preds, batch["weather"], c, w)
        if on_acdc and "weather" in batch:
            wcm, wacc = weather_confusion_matrix(
                batch["weather"], outputs["weather_logits"], w)
            accum["cm_weather"] = accum["cm_weather"] + wcm
            accum["weather_acc_sum"] = accum["weather_acc_sum"] + wacc
            accum["n_batches"] = accum["n_batches"] + 1
        return preds, accum

    return eval_step


def make_stereo_train_step(model, cfg, tx) -> Callable:
    """Train step for the joint disparity + semantics stack (RODSNet-era
    configuration): pyramid-weighted smooth-L1 disparity loss
    (reference ``utils/loss.py:478-516``) + optional boundary-aware focal on
    the left view, combined like the reference's disparity recipes."""
    from ..losses.disparity import disparity_loss
    from ..losses.focal import cross_entropy_loss

    train_semantic = cfg.train_semantic

    def loss_fn(params, batch_stats, batch, rng):
        batch = ingest_batch(batch)
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["left"], batch["right"], train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        d_loss = disparity_loss(
            [outputs["disp_pyramid"][0], outputs["disp"]], batch["disp"])
        comps = {"disp_loss": d_loss}
        total = d_loss
        if train_semantic and "label" in batch:
            seg_loss = cross_entropy_loss(outputs["seg"], batch["label"])
            comps["seg_loss"] = seg_loss
            total = total + seg_loss
        comps["total_loss"] = total
        return total, {"batch_stats": mutated["batch_stats"], "comps": comps}

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params,
                                  batch_stats=aux["batch_stats"],
                                  opt_state=new_opt_state, step=state.step + 1)
        return new_state, aux["comps"]

    return train_step


def init_eval_accum(cfg) -> Dict[str, jax.Array]:
    c, w = cfg.num_classes, cfg.weather_num
    return {
        "cm": jnp.zeros((c, c), jnp.float32),
        "cm_weather_sem": jnp.zeros((w, c, c), jnp.float32),
        "cm_weather": jnp.zeros((w, w), jnp.float32),
        "weather_acc_sum": jnp.zeros((), jnp.float32),
        "n_batches": jnp.zeros((), jnp.float32),
    }
