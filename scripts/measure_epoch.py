#!/usr/bin/env python
"""Measured ACDC-protocol training-epoch time on the attached TPU chip.

Replicates the reference's epoch accounting (train + validate,
``scripts/train_weather.sh``: 209.6 s/epoch on 1 GPU, ACDC RN18 bs 8, 1600
train samples / ~400 val frames) with the flagship doubly-contrastive
configuration: 768² two-crop batches through the REAL jitted train step
(supcon + pixel-contrast + boundary-aware focal, Adam param groups) and
full-resolution 1920×1088 validation through the REAL eval step with
on-device confusion accumulation.

Batches are staged on device once and cycled. That deliberately excludes
per-step host→device input feeding: in this development environment the
device link is a network tunnel (~seconds per 50 MB batch); on a real TPU
VM the host feeds over local DMA and the on-device augmentation pipeline
(``data/device_augment.py``) overlaps it with compute. Device compute is
the number being compared.

Usage:  python scripts/measure_epoch.py [--steps 200] [--val_batches 50]
Prints one JSON line: {"metric": "acdc_epoch_train_plus_val", ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache shared with bench.py: repeat runs skip the slow
# remote compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200,
                    help="train steps per epoch (1600 samples / bs 8)")
    ap.add_argument("--val_batches", type=int, default=50,
                    help="val batches (400 frames / bs 8)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--unique_batches", type=int, default=4)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=("float32", "bfloat16"),
                    help="activation compute dtype for the train/eval steps; "
                         "bfloat16 is the framework's production default "
                         "(config.py), params stay fp32 either way (the "
                         "reference's --amp flag is dead code, options.py:168)")
    ap.add_argument("--device_augment", action="store_true",
                    help="stage RAW uint8 ACDC-size frames and run the "
                         "on-device augmentation (data/device_augment.py: "
                         "crop/scale + EDT weights + two-crop) in front of "
                         "every train step — the --no_host_augment "
                         "configuration, where the host's only duty is PNG "
                         "decode (HOSTPIPE decode_only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from doubly_contrastive_semseg_tpu.config import parse_args
    from doubly_contrastive_semseg_tpu.models import build_model
    from doubly_contrastive_semseg_tpu.train.state import init_state_and_optimizer
    from doubly_contrastive_semseg_tpu.train.steps import (
        init_eval_accum, make_eval_step, make_train_step)

    cfg = parse_args([
        "--dataset", "synthetic", "--train_semantic",
        "--criterion", "supcon_pixelcontrast_focal",
        "--batch_size", str(args.batch_size), "--no_use_balanced_weights",
        "--synthetic_hw", "1088x1920", "--compute_dtype", args.compute_dtype,
    ])
    model = build_model(cfg)
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    b = args.batch_size

    def train_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "left": r.uniform(0, 255, (2 * b, 768, 768, 3)).astype(np.float32),
            "label": r.integers(0, 19, (b, 768, 768)).astype(np.int64),
            "label_distance_weight": r.uniform(0, 1, (b, 768, 768)).astype(np.float32),
            "weather": r.integers(0, 4, (b,)).astype(np.int32),
            "class_weight": np.ones((19,), np.float32),
        }

    def val_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "left": r.uniform(0, 255, (b, 1088, 1920, 3)).astype(np.float32),
            "label": r.integers(0, 19, (b, 1088, 1920)).astype(np.int64),
            "weather": r.integers(0, 4, (b,)).astype(np.int32),
        }

    def raw_batch(seed):
        # --no_host_augment wire: raw uint8 frames + uint8 labels, B (not 2B)
        r = np.random.default_rng(seed)
        return {
            "left": r.integers(0, 256, (b, 1088, 1920, 3)).astype(np.uint8),
            "label": r.integers(0, 19, (b, 1088, 1920)).astype(np.uint8),
            "weather": r.integers(0, 4, (b,)).astype(np.int32),
            "class_weight": np.ones((19,), np.float32),
        }

    tb = [jax.device_put({k: jnp.asarray(v) for k, v in train_batch(i).items()}, dev)
          for i in range(args.unique_batches)]
    vb = [jax.device_put({k: jnp.asarray(v) for k, v in val_batch(100 + i).items()}, dev)
          for i in range(args.unique_batches)]
    rawb = None
    if args.device_augment:
        from doubly_contrastive_semseg_tpu.data.device_augment import augment_batch
        import functools

        rawb = [jax.device_put({k: jnp.asarray(v) for k, v in raw_batch(200 + i).items()},
                               dev) for i in range(args.unique_batches)]
        aug_fn = jax.jit(functools.partial(
            augment_batch, crop=768, num_classes=cfg.num_classes,
            two_crop=True, use_gamma=True))

        def augment(raw, key):
            out = dict(raw)
            out.update(aug_fn(raw["left"], raw["label"], raw["weather"], key))
            return out

    key = jax.random.PRNGKey(0)
    state, tx = init_state_and_optimizer(model, cfg, tb[0], key,
                                         steps_per_epoch=args.steps)
    state = jax.device_put(state, dev)
    train_step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model, cfg), donate_argnums=(3,))

    def fence(v):
        # D2H readback: the only reliable completion fence on remote-tunneled
        # backends (block_until_ready acks at dispatch; same as bench.py)
        return float(jax.device_get(v))

    # compile (excluded, like the reference's warm epochs)
    tc = time.perf_counter()
    if rawb is not None:
        aug0 = augment(rawb[0], key)
        fence(aug0["label_distance_weight"][0, 0, 0])
        print(f"[compile] augment: {time.perf_counter() - tc:.1f} s",
              flush=True)
        tc = time.perf_counter()
        state, m = train_step(state, aug0, key)
    else:
        state, m = train_step(state, tb[0], key)
    fence(m["total_loss"])
    print(f"[compile] train_step: {time.perf_counter() - tc:.1f} s", flush=True)
    accum = jax.device_put(init_eval_accum(cfg), dev)
    preds, accum = eval_step(state.params, state.batch_stats, vb[0], accum)
    fence(accum["cm"][0, 0])

    t0 = time.perf_counter()
    if rawb is not None:
        for i in range(args.steps):
            state, m = train_step(
                state, augment(rawb[i % len(rawb)], jax.random.fold_in(key, i)),
                key)
    else:
        for i in range(args.steps):
            state, m = train_step(state, tb[i % len(tb)], key)
    fence(m["total_loss"])
    t_train = time.perf_counter() - t0

    accum = jax.device_put(init_eval_accum(cfg), dev)
    t1 = time.perf_counter()
    for i in range(args.val_batches):
        preds, accum = eval_step(state.params, state.batch_stats,
                                 vb[i % len(vb)], accum)
    fence(accum["cm"][0, 0])
    t_val = time.perf_counter() - t1

    total = t_train + t_val
    print(f"train: {args.steps} steps in {t_train:.1f} s "
          f"({t_train / args.steps * 1e3:.1f} ms/step)")
    print(f"val:   {args.val_batches} batches (1088x1920) in {t_val:.1f} s")
    print(json.dumps({
        "metric": ("acdc_epoch_train_plus_val_device_augment"
                   if rawb is not None else "acdc_epoch_train_plus_val"),
        "value": round(total, 2), "unit": "s/epoch",
        "vs_baseline": round(209.6 / total, 2),
        "train_s": round(t_train, 2), "val_s": round(t_val, 2),
        "ms_per_train_step": round(t_train / args.steps * 1e3, 1),
        "compute_dtype": args.compute_dtype,
    }))


if __name__ == "__main__":
    main()
