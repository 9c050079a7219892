#!/usr/bin/env python
"""Inference CLI: semantic label maps and/or stereo disparity from a trained
checkpoint.

Re-designed counterpart of the reference's inference entrypoints
(``inference.py:78-167`` / ``inference_color.py:81-193`` — both dead in the
reference: they import models that no longer exist, see SURVEY.md "known
defects"). This one drives the active semantic models, plus the stereo path
with the reference's KITTI-submission output format: 16-bit PNGs storing
``disparity * 256`` (``inference.py:160-166``), with the pad-to-eval-size /
crop-back protocol (``inference.py:128-158``).

Usage:
  python inference.py --resume <ckpt_dir> --model resnet18 \
      --input <img|dir> --output_dir output [--save_color]
  python inference.py --stereo --input <left dir> --right_input <right dir> \
      --resume <ckpt_dir> --output_dir output
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
    # BooleanOptionalAction so color dumps are on by default (like the
    # reference's color script) but can actually be disabled
    p.add_argument("--save_color", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--stereo", action="store_true", default=False,
                   help="disparity inference: 16-bit disp*256 PNG dumps")
    p.add_argument("--right_input", type=str, default=None,
                   help="right-view image file or directory (stereo mode)")
    p.add_argument("--max_disp", type=int, default=192)
    # model composition must match the trained checkpoint (StereoTrainer
    # passes the same three through; a mismatched tree would silently
    # partial-restore and run random refinement weights)
    p.add_argument("--train_semantic", action="store_true", default=False,
                   help="checkpoint was trained with the semantic head")
    p.add_argument("--backbone", default="resnet18",
                   choices=["resnet18", "resnet34", "efficientnetb0"],
                   help="stereo trunk (BASELINE config 5 pairs efficientnetb0 "
                        "with deformable refinement + the disparity head)")
    p.add_argument("--aggregation_type", default="adaptive",
                   choices=["adaptive", "stereonet", "psmnet_basic",
                            "psmnet_hg", "gcnet"])
    p.add_argument("--refinement_type", default="semantic",
                   choices=["semantic", "stereonet", "stereodrnet",
                            "hourglass", "disp_sem", "new1", "new2", "new3",
                            "new4", "new5", "new9", "new10", "new12"])
    p.add_argument("--deform_impl", default="window",
                   choices=["window", "gather"],
                   help="stereo deform conv impl: dense-window TPU fast path "
                        "(offsets clamped to ±2px) vs exact gather")
    p.add_argument("--val_img_height", type=int, default=None,
                   help="pad inputs up to this eval size before the forward, "
                        "crop the disparity back after (KITTI protocol)")
    p.add_argument("--val_img_width", type=int, default=None)
    return p.parse_args()


def _list_images(root):
    if os.path.isfile(root):
        return [root]
    return sorted(sum([glob.glob(os.path.join(root, e))
                       for e in ("*.png", "*.jpg", "*.jpeg")], []))


def stereo_main(args):
    """Disparity inference with 16-bit KITTI-submission PNGs (reference
    ``inference.py:120-167``)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS

    lefts = _list_images(args.input)
    rights = _list_images(args.right_input or args.input.replace("left", "right"))
    if not lefts or len(lefts) != len(rights):
        raise SystemExit(f"need paired left/right lists, got {len(lefts)} vs "
                         f"{len(rights)}")
    os.makedirs(args.output_dir, exist_ok=True)

    model = StereoDCSS(max_disp=args.max_disp, num_classes=args.num_classes,
                       train_semantic=args.train_semantic,
                       backbone=args.backbone,
                       aggregation_type=args.aggregation_type,
                       refinement_type=args.refinement_type,
                       deform_impl=args.deform_impl,
                       dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
                       else jnp.float32)
    variables = None
    forward = None
    times = []
    for i, (lp, rp) in enumerate(zip(lefts, rights)):
        left = np.asarray(Image.open(lp).convert("RGB"), np.float32)
        right = np.asarray(Image.open(rp).convert("RGB"), np.float32)
        oh, ow = left.shape[:2]
        th = args.val_img_height or oh
        tw = args.val_img_width or ow
        top_pad, right_pad = th - oh, tw - ow
        if top_pad or right_pad:  # zero-pad top/right (inference.py:128-136)
            pad = ((top_pad, 0), (0, right_pad), (0, 0))
            left = np.pad(left, pad)
            right = np.pad(right, pad)
        # host-side space-to-depth pack (the TPU serving fast path; the trunk
        # and the SemRefine stem consume it directly — see models/stereo.py)
        from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

        if left.shape[0] % 2 == 0 and left.shape[1] % 2 == 0:
            xl = jnp.asarray(s2d_pack(left[None]))
            xr = jnp.asarray(s2d_pack(right[None]))
        else:
            xl = jnp.asarray(left)[None]
            xr = jnp.asarray(right)[None]

        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), xl, xr, train=False)
            if args.resume:
                from doubly_contrastive_semseg_tpu.train.checkpoints import (
                    CheckpointManager)
                from doubly_contrastive_semseg_tpu.train.state import TrainState

                state = TrainState(params=variables["params"],
                                   batch_stats=variables.get("batch_stats", {}),
                                   opt_state=(), step=jnp.zeros((), jnp.int32))
                mgr = CheckpointManager(os.path.dirname(args.resume) or ".")
                state, _ = mgr.restore(args.resume, state)
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}

            @jax.jit
            def forward(v, xl, xr):
                return model.apply(v, xl, xr, train=False)["disp"]

        t0 = time.perf_counter()
        disp = np.asarray(forward(variables, xl, xr))[0]
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)

        if top_pad or right_pad:  # crop back (inference.py:153-158)
            disp = disp[top_pad:, :disp.shape[1] - right_pad or None]
        out_path = os.path.join(args.output_dir, os.path.basename(lp))
        disp16 = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
        Image.fromarray(disp16).save(out_path)  # PIL infers I;16 from uint16
        print(f"[{i + 1}/{len(lefts)}] {lp} -> {out_path} ({dt:.3f}s)")
    if times:
        print(f"mean forward time: {np.mean(times):.4f}s")


def main():
    args = parse_args()
    if args.stereo:
        return stereo_main(args)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from doubly_contrastive_semseg_tpu.config import Config
    from doubly_contrastive_semseg_tpu.data.acdc import ACDC
    from doubly_contrastive_semseg_tpu.models import build_model

    cfg = Config(model=args.model, num_classes=args.num_classes,
                 compute_dtype=args.compute_dtype, dataset="acdc").finalize()
    model = build_model(cfg)

    paths = _list_images(args.input)
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
        # argmax over num_classes channels never emits an ignore id — the
        # grayscale dump is the raw train-id map
        gray = pred.astype(np.uint8)
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
