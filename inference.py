#!/usr/bin/env python
"""Semantic inference CLI: run a trained checkpoint over images and save
gray-id / colorized prediction PNGs.

Re-designed counterpart of the reference's inference entrypoints
(``inference.py:78-167`` / ``inference_color.py:81-193`` — both dead in the
reference: they import models that no longer exist, see SURVEY.md "known
defects"). This one drives the active semantic models.

Usage:
  python inference.py --resume <ckpt_dir> --model resnet18 \
      --input <img|dir> --output_dir output [--save_color]
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=str, required=True, help="image file or directory")
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--resume", type=str, default=None, help="orbax checkpoint dir")
    p.add_argument("--model", type=str, default="resnet18")
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--img_width", type=int, default=None,
                   help="resize width (default: native)")
    p.add_argument("--img_height", type=int, default=None)
    p.add_argument("--save_color", action="store_true", default=True)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from doubly_contrastive_semseg_tpu.config import Config
    from doubly_contrastive_semseg_tpu.data.acdc import ACDC
    from doubly_contrastive_semseg_tpu.models import build_model

    cfg = Config(model=args.model, num_classes=args.num_classes,
                 compute_dtype=args.compute_dtype, dataset="acdc").finalize()
    model = build_model(cfg)

    paths = ([args.input] if os.path.isfile(args.input)
             else sorted(sum([glob.glob(os.path.join(args.input, e))
                              for e in ("*.png", "*.jpg", "*.jpeg")], [])))
    if not paths:
        raise SystemExit(f"no images under {args.input}")

    os.makedirs(args.output_dir, exist_ok=True)

    variables = None
    forward = None
    times = []
    for i, path in enumerate(paths):
        img = Image.open(path).convert("RGB")
        if args.img_width and args.img_height:
            img = img.resize((args.img_width, args.img_height), Image.BILINEAR)
        x = jnp.asarray(np.asarray(img, np.float32))[None]

        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                x, train=False)
            if args.resume:
                from doubly_contrastive_semseg_tpu.train.checkpoints import CheckpointManager
                from doubly_contrastive_semseg_tpu.train.state import TrainState

                state = TrainState(params=variables["params"],
                                   batch_stats=variables.get("batch_stats", {}),
                                   opt_state=(), step=jnp.zeros((), jnp.int32))
                mgr = CheckpointManager(os.path.dirname(args.resume) or ".")
                state, _ = mgr.restore(args.resume, state)
                variables = {"params": state.params, "batch_stats": state.batch_stats}

            @jax.jit
            def forward(v, x):
                out = model.apply(v, x, train=False)
                return jnp.argmax(out["seg"], axis=-1).astype(jnp.int32)

        t0 = time.perf_counter()
        pred = np.asarray(forward(variables, x))[0]
        dt = time.perf_counter() - t0
        if i > 0:  # skip compile batch (reference inference.py:139-145 protocol)
            times.append(dt)

        stem = os.path.splitext(os.path.basename(path))[0]
        gray = pred.astype(np.uint8)
        gray[pred == 19] = 255
        Image.fromarray(gray).save(os.path.join(args.output_dir, stem + "_pred.png"))
        if args.save_color:
            color = ACDC.decode_target(pred.copy()).astype(np.uint8)
            Image.fromarray(color).save(
                os.path.join(args.output_dir, stem + "_color.png"))
        print(f"[{i + 1}/{len(paths)}] {path} -> {stem}_pred.png ({dt:.3f}s)")

    if times:
        print(f"mean forward time: {np.mean(times):.4f}s "
              f"({1.0 / np.mean(times):.1f} FPS)")


if __name__ == "__main__":
    main()
