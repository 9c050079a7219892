#!/usr/bin/env python
"""Benchmark: SwiftNet-RN18 full-res 2048×1024 inference throughput per chip.

Protocol follows the reference's FPS measurement (``trainer.py:341-368`` /
``inference.py:139-145``): time the forward only, skip warm-up iterations,
report mean frames/sec. Baseline: 66.7 FPS on an RTX 3080 Mobile
(reference README.md:7). Target (BASELINE.json): ≥ 3× per v5e chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent compile cache: repeated bench runs skip the (slow, remote) compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_FPS = 66.7


V5E_BF16_PEAK_FLOPS = 197e12  # per-chip bf16 peak (public v5e spec)


def run_bench(height: int, width: int, batch_size: int, iters: int,
              warmup: int, dtype: str, layout: str = "s2d") -> dict:
    """layout='s2d': host loader feeds space-to-depth-packed frames (the
    production path; the pack is untimed DataLoader work, like the
    reference's workers). layout='nhwc': plain NHWC frames — the device pays
    the s2d relayout; reported alongside so the headline can't be read as
    hiding a device cost."""
    import jax
    import jax.numpy as jnp

    from doubly_contrastive_semseg_tpu.models import DCSSModel

    model = DCSSModel(
        backbone="resnet18", num_classes=19, weather_num=4,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    # init on the host CPU backend (eager init over the TPU tunnel pays a
    # per-op round trip — minutes), then ship the params across once
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x_small = jnp.ones((1, 128, 256, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x_small, train=False)
    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    # the host loader supplies images pre-packed in space-to-depth(2) layout
    # (the standard TPU conv0 optimization; a cache-friendly memcpy during
    # host preprocessing, analogous to the reference's untimed DataLoader
    # work) — see ops/input_pipeline.py::s2d_pack. The model accepts plain
    # NHWC / NCHW too; s2d just skips the on-device relayout shuffle.
    import numpy as np

    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

    # uint8 pixel data is exact in bf16 (8 mantissa bits cover 0..255);
    # feeding bf16 halves the normalize pass's input read traffic
    if layout == "s2d":
        x_host = s2d_pack(np.ones((batch_size, height, width, 3), np.float32))
    else:
        x_host = np.ones((batch_size, height, width, 3), np.float32)
    if dtype == "bfloat16":
        x_host = x_host.astype(jnp.bfloat16)
    x = jax.device_put(jnp.asarray(x_host), device)

    from doubly_contrastive_semseg_tpu.models.serving import make_serving_fn

    serve = make_serving_fn(model)

    @jax.jit
    def forward(params, batch_stats, image):
        # serving output is the full-res label map via the fused Pallas head
        # (BN→ReLU→1×1 → ×4 bilinear → argmax in one pass)
        return serve({"params": params, "batch_stats": batch_stats}, image)

    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def fence(out):
        # a D2H readback is the only reliable completion fence on
        # remote-tunneled backends (block_until_ready acks at dispatch)
        return int(jax.device_get(out[0, 0, 0]))

    for _ in range(warmup):
        fence(forward(params, batch_stats, x))

    # throughput protocol: enqueue K batches, fence the last. The TPU
    # executes dispatches in order, so the window covers all K forwards plus
    # one host↔device latency (amortized by K). Headline = MEAN over 3
    # windows ± spread (protocol parity with the reference's mean-with-
    # first-batch-skip, trainer.py:356-368; earlier rounds reported the
    # best window, which flattered tunnel jitter by ~1-2%). Per-frame
    # *latency* is a separate single-fenced measurement on stderr.
    window_t = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):  # keep only the last output — retaining all
            out = forward(params, batch_stats, x)  # K would pin O(K) HBM
        fence(out)
        window_t.append((time.perf_counter() - t0) / iters)
    mean_t = sum(window_t) / len(window_t)

    t1 = time.perf_counter()
    fence(forward(params, batch_stats, x))
    latency = time.perf_counter() - t1
    print(f"batch {batch_size}: latency {latency * 1000:.1f} ms "
          f"(incl. tunnel round trip)", file=sys.stderr)

    # roofline accounting from XLA's own cost analysis of the compiled
    # program (Pallas custom calls are opaque to it — the fused seg head's
    # interp/argmax FLOPs are uncounted, a small deflation of true MFU)
    flops_per_batch = 0.0
    try:
        cost = forward.lower(params, batch_stats, x).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_batch = float(cost.get("flops", 0.0))
    except Exception as e:
        print(f"cost analysis unavailable: {e}", file=sys.stderr)

    fps_windows = [batch_size / t for t in window_t]
    return {
        "fps": batch_size / mean_t,
        "fps_min": min(fps_windows),
        "fps_max": max(fps_windows),
        "flops_per_frame": flops_per_batch / batch_size,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small shape smoke run")
    p.add_argument("--batch_size", type=int, default=0, help="0 = auto-pick")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--height", type=int, default=0, help="override frame height")
    p.add_argument("--width", type=int, default=0, help="override frame width")
    args = p.parse_args()

    if args.quick:
        h, w = 256, 512
        candidates = [args.batch_size] if args.batch_size else [1]
        iters, warmup = 5, 2
    else:
        h, w = 1024, 2048
        # batch 16 measured identical fps to 8 (device-time bound) — one size
        # keeps the driver's bench run short
        candidates = [args.batch_size] if args.batch_size else [8]
        iters, warmup = args.iters, args.warmup
    if bool(args.height) != bool(args.width):
        raise SystemExit("--height and --width must be given together")
    if args.height and args.width:
        h, w = args.height, args.width

    best: dict = {}
    for bs in candidates:
        try:
            r = run_bench(h, w, bs, iters, warmup, args.dtype)
        except Exception as e:  # OOM at large batch: keep the best so far
            print(f"batch_size={bs} failed: {e}", file=sys.stderr)
            continue
        print(f"batch_size={bs}: {r['fps']:.2f} frames/sec "
              f"(windows {r['fps_min']:.1f}..{r['fps_max']:.1f})",
              file=sys.stderr)
        if r["fps"] > best.get("fps", 0.0):
            best = r

    # plain-NHWC companion number: device pays the s2d relayout (~6.5 ms /
    # batch-8) — reported so the headline can't be read as hiding it
    nhwc_fps = 0.0
    if not args.quick:
        try:
            nhwc_fps = run_bench(h, w, candidates[0], max(10, iters // 3),
                                 warmup, args.dtype, layout="nhwc")["fps"]
            print(f"plain-NHWC input: {nhwc_fps:.2f} frames/sec",
                  file=sys.stderr)
        except Exception as e:
            print(f"nhwc run failed: {e}", file=sys.stderr)

    fps = best.get("fps", 0.0)
    out = {
        "metric": f"swiftnet_rn18_{w}x{h}_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    if best:
        out["fps_window_min"] = round(best["fps_min"], 2)
        out["fps_window_max"] = round(best["fps_max"], 2)
        if best["flops_per_frame"]:
            tflops = best["flops_per_frame"] * fps / 1e12
            out["flops_per_frame_g"] = round(best["flops_per_frame"] / 1e9, 1)
            out["achieved_tflops"] = round(tflops, 1)
            out["mfu_pct"] = round(100 * tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 1)
    if nhwc_fps:
        out["nhwc_input_fps"] = round(nhwc_fps, 2)
    if fps == 0.0:
        # every candidate failed — make the failure unmistakable instead of
        # a success-shaped 0.0 line with exit code 0
        out["error"] = "all batch sizes failed; see stderr"
        print(json.dumps(out))
        raise SystemExit(1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
