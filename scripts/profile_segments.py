#!/usr/bin/env python
"""Per-segment device-time breakdown of SwiftNet-RN18 serving at 2048x1024.

Times each compute stage of the flagship inference path in isolation with the
same enqueue-K/fence-last protocol bench.py uses, so the sum can be compared
against the end-to-end number to find fusion wins/losses.

Run on the TPU chip:  python scripts/profile_segments.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=20, warmup=2):
    jitted = jax.jit(fn)
    jitted(*args)  # compile

    def fence(o):
        l = jax.tree_util.tree_leaves(o)[0]
        return np.asarray(jax.device_get(l.ravel()[0]))

    for _ in range(warmup):
        fence(jitted(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):  # async dispatch; don't retain outputs (HBM!)
        out = jitted(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1000.0  # ms


def conv(x, k, stride=1, pad=None):
    kh = k.shape[0]
    p = kh // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(p, p), (p, p)] if isinstance(p, int) else p,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_relu(x, c):
    s = jnp.ones((c,), x.dtype)
    b = jnp.zeros((c,), x.dtype)
    return jax.nn.relu(x * s + b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    B = args.batch
    H, W = 1024, 2048
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)

    def rand(shape, dtype=dt):
        return jax.device_put(jax.random.normal(key, shape, jnp.float32).astype(dtype), dev)

    results = {}

    # ---- fence-overhead calibration: a trivial op (diagnostic, not summed) ----
    tiny = rand((8, 128))
    calib = timeit(lambda x: x + 1, (tiny,), args.iters)

    # ---- input pyramid (fused s2d form) ----
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import (
        fused_pyramid_s2d)

    # feed the pyramid what the flagship serving path feeds it: host-packed
    # s2d frames in the bench dtype — plain NHWC f32 here would charge the
    # pyramid rows a ~6.5 ms/batch-8 on-device relayout that bench.py's
    # headline never pays, biasing every fusion conclusion
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

    img_host = s2d_pack(np.ones((B, H, W, 3), np.float32))
    img = jax.device_put(jnp.asarray(img_host).astype(dt), dev)
    mean = (73.15, 82.90, 72.3)
    std = (47.67, 48.49, 47.73)
    results["pyramid_s2d(3 lvls)"] = timeit(
        lambda im: fused_pyramid_s2d(im, 3, mean, std, dt), (img,), args.iters)
    # lvl0-only is a diagnostic SUBSET of the 3-lvl row — excluded from SUM
    diagnostics = {}
    diagnostics["pyramid_s2d(lvl0 only)"] = timeit(
        lambda im: fused_pyramid_s2d(im, 1, mean, std, dt), (img,), args.iters)

    # ---- stem per level: 4x4 s2d conv 12->64 + bn/relu + maxpool 3x3/2 ----
    kstem = rand((4, 4, 12, 64))
    for lvl, (h2, w2) in enumerate([(H // 2, W // 2), (H // 4, W // 4), (H // 8, W // 8)]):
        x = rand((B, h2, w2, 12))

        def stem(x, k):
            y = conv(x, k, 1, [(2, 1), (2, 1)])
            y = bn_relu(y, 64)
            return jax.lax.reduce_window(
                y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
                jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])

        results[f"stem_L{lvl} ({h2}x{w2})"] = timeit(stem, (x, kstem), args.iters)

    # ---- trunk stages per level ----
    def basic_block(x, k1, k2, stride=1, kd=None):
        r = x
        y = conv(x, k1, stride)
        y = bn_relu(y, k1.shape[-1])
        y = conv(y, k2, 1)
        if kd is not None:
            r = conv(x, kd, stride, 0)
        return jax.nn.relu(y + r)

    stage_specs = [  # (planes, in_ch, stride)
        (64, 64, 1), (128, 64, 2), (256, 128, 2), (512, 256, 2)]
    for lvl, (h4, w4) in enumerate([(H // 4, W // 4), (H // 8, W // 8), (H // 16, W // 16)]):
        h, w = h4, w4
        for si, (planes, cin, stride) in enumerate(stage_specs):
            x = rand((B, h, w, cin))
            k1a = rand((3, 3, cin, planes))
            k2a = rand((3, 3, planes, planes))
            kd = rand((1, 1, cin, planes)) if (stride != 1 or cin != planes) else None
            k1b = rand((3, 3, planes, planes))
            k2b = rand((3, 3, planes, planes))

            def stage(x, k1a, k2a, k1b, k2b, kd=None):
                y = basic_block(x, k1a, k2a, stride, kd)
                return basic_block(y, k1b, k2b, 1, None)

            sargs = (x, k1a, k2a, k1b, k2b) + ((kd,) if kd is not None else ())
            results[f"L{lvl}_layer{si+1} ({h}x{w}x{cin}->{planes})"] = timeit(
                stage, sargs, args.iters)
            h, w = h // stride, w // stride
        # bnecks at this level (4x 1x1 conv to 128)
    # ---- bnecks (dominated by layer1's 256x512x64->128) ----
    for lvl in range(3):
        h4, w4 = H // (4 * 2 ** lvl), W // (4 * 2 ** lvl)
        tot = 0.0
        for si, planes in enumerate([64, 128, 256, 512]):
            hh, ww = h4 // (2 ** si), w4 // (2 ** si)
            x = rand((B, hh, ww, planes))
            kb = rand((1, 1, planes, 128))
            tot += timeit(lambda x, k: conv(x, k, 1, 0), (x, kb), args.iters)
        results[f"L{lvl}_bnecks(4x 1x1)"] = tot

    # ---- decoder blends: 5 UpsampleBlend steps ----
    from doubly_contrastive_semseg_tpu.ops.interpolate import resize_bilinear

    def blend(x, skip, k):
        y = resize_bilinear(x, (skip.shape[1], skip.shape[2]))
        y = y + skip
        y = bn_relu(y, 128)
        return conv(y, k, 1)

    sizes = [(H // 128, W // 128)]
    while sizes[-1][0] < H // 4:
        sizes.append((sizes[-1][0] * 2, sizes[-1][1] * 2))
    for i in range(1, len(sizes)):
        x = rand((B, *sizes[i - 1], 128))
        skip = rand((B, *sizes[i], 128))
        kb = rand((3, 3, 128, 128))
        results[f"blend{i} (->{sizes[i][0]}x{sizes[i][1]})"] = timeit(
            blend, (x, skip, kb), args.iters)

    # ---- fused serving head ----
    from doubly_contrastive_semseg_tpu.ops.seghead_pallas import (
        fused_seghead_upsample_argmax)

    feat = rand((B, H // 4, W // 4, 128))
    s = rand((128,), jnp.float32)
    b = rand((128,), jnp.float32)
    m = rand((128,), jnp.float32)
    v = jnp.abs(rand((128,), jnp.float32)) + 1.0
    kh = rand((1, 1, 128, 19), jnp.float32)
    bh = rand((19,), jnp.float32)
    results["fused_head (->1024x2048 argmax)"] = timeit(
        lambda f: fused_seghead_upsample_argmax(f, s, b, m, v, kh, bh),
        (feat,), args.iters)

    total = sum(results.values())
    print(f"\n=== segment breakdown, batch {B}, {W}x{H}, {args.dtype} ===")
    print(f"{'calib_null(+1 on 8x128), not summed':45s} {calib:8.3f} ms")
    for k, v in diagnostics.items():
        print(f"{k + ', not summed':45s} {v:8.3f} ms")
    for k, v in results.items():
        print(f"{k:45s} {v:8.3f} ms")
    print(f"{'SUM':45s} {total:8.3f} ms   ({B / total * 1000:.1f} fps equiv)")


if __name__ == "__main__":
    main()
