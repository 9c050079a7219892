#!/usr/bin/env python
"""Benchmark: joint stereo+semseg (StereoDCSS) full-res inference per chip.

The reference's RODSNet-era recorded numbers (BASELINE.md, from
``scripts/tjsong_train.sh``): Cityscapes 2048×1024 joint disparity+semantics
at 0.054 s/img = 18.5 FPS on one GPU. This script times the TPU-native
``StereoDCSS`` (SwiftNet-RN18 trunk shared across both views, correlation
cost volume, adaptive aggregation with deformable blocks, soft-argmin,
semantic-guided refinement) with bench.py's enqueue-K/fence-last protocol.

Run on the TPU chip:  python scripts/bench_stereo.py [--height 1024 --width 2048]
Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_FPS = 18.5  # RODSNet cityscapes full-res, 1 GPU (tjsong_train.sh)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--refinement_type", default="disp_sem",
                   help="default matches the baseline protocol: the 18.5-fps "
                        "run used --refinement_type ours = Refine_disp_sem "
                        "(reference scripts/tjsong_train.sh:31-35)")
    p.add_argument("--backbone", default="resnet18",
                   choices=["resnet18", "resnet34", "efficientnetb0"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = StereoDCSS(max_disp=args.max_disp, num_classes=19,
                       backbone=args.backbone,
                       refinement_type=args.refinement_type, dtype=dtype)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ls = jnp.ones((1, 128, 256, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            ls, ls, train=False)
    device = jax.devices()[0]
    variables = jax.device_put(variables, device)

    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

    b, h, w = args.batch_size, args.height, args.width
    x_host = np.ones((b, h, w, 3), np.float32)
    # production loader path: host packs space-to-depth(2) (untimed
    # DataLoader work, same story as bench.py's mono headline); the
    # plain-NHWC number is measured and reported alongside
    packed = s2d_pack(x_host)
    if args.dtype == "bfloat16":
        x_host = x_host.astype(jnp.bfloat16)
        packed = packed.astype(jnp.bfloat16)
    left = jax.device_put(jnp.asarray(packed), device)
    right = left
    left_nhwc = jax.device_put(jnp.asarray(x_host), device)

    from doubly_contrastive_semseg_tpu.models.serving import make_stereo_serving_fn

    # materialize exactly the user-facing outputs: full-res disparity + the
    # argmax label map (same contract as the reference's test loop). The
    # serving fn routes the label map through the fused Pallas seg head, so
    # the (B, H, W, 19) f32 logit tensor is never written to HBM.
    forward = jax.jit(make_stereo_serving_fn(model))

    def fence(out):
        return float(jax.device_get(out[0][0, 0, 0]))

    def measure(l, r):
        for _ in range(args.warmup):
            fence(forward(variables, l, r))
        mean_t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):  # retain only the last output (HBM)
                out = forward(variables, l, r)
            fence(out)
            mean_t = min(mean_t, (time.perf_counter() - t0) / args.iters)
        return mean_t

    mean_t = measure(left, right)
    fps = b / mean_t
    print(f"batch {b}: {mean_t * 1000:.1f} ms/batch, {fps:.2f} frames/sec",
          file=sys.stderr)
    nhwc_fps = b / measure(left_nhwc, left_nhwc)
    print(f"plain-NHWC input: {nhwc_fps:.2f} frames/sec", file=sys.stderr)
    print(json.dumps({
        "metric": f"stereo_dcss_{args.backbone}_{w}x{h}_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "nhwc_input_fps": round(nhwc_fps, 2),
    }))


if __name__ == "__main__":
    main()
