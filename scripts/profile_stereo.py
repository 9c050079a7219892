#!/usr/bin/env python
"""Per-segment device-time breakdown of StereoDCSS serving at 2048x1024.

Times each stage of the joint disparity+semantics forward in isolation
(trunk over both views, cost volume, adaptive aggregation, soft-argmin,
semantic-guided refinement, seg head) with the enqueue-K/fence-last protocol
bench.py uses, so the sum can be compared against scripts/bench_stereo.py's
end-to-end number.

Run on the TPU chip:  python scripts/profile_stereo.py [--batch 2]
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
    jitted(*args)

    def fence(o):
        l = jax.tree_util.tree_leaves(o)[0]
        return np.asarray(jax.device_get(l.ravel()[0]))

    for _ in range(warmup):
        fence(jitted(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = jitted(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max_disp", type=int, default=192)
    ap.add_argument("--deform_impl", default="window")
    args = ap.parse_args()

    from doubly_contrastive_semseg_tpu.models.resnet_pyramid import resnet18_pyramid
    from doubly_contrastive_semseg_tpu.models.stereo import (
        AdaptiveAggregation, SemanticGuidedRefinement)
    from doubly_contrastive_semseg_tpu.ops.cost_volume import (
        cost_volume_pyramid, soft_argmin_disparity)
    from doubly_contrastive_semseg_tpu.ops.interpolate import resize_bilinear

    B, H, W = args.batch, 1024, 2048
    dt = jnp.bfloat16
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    key = jax.random.PRNGKey(0)

    def rand(shape, dtype=dt):
        return jax.device_put(
            jax.random.normal(key, shape, jnp.float32).astype(dtype), dev)

    results = {}

    # ---- trunk: one shared pass over both views (2B batch) ----
    fe = resnet18_pyramid(dtype=dt)
    with jax.default_device(cpu):
        fv = fe.init(jax.random.PRNGKey(0), jnp.ones((1, 128, 256, 3)), train=False)
    fv = jax.device_put(fv, dev)
    both = rand((2 * B, H, W, 3))
    results["trunk_2B"] = timeit(
        lambda v, x: fe.apply(v, x, train=False)[0], (fv, both), args.iters)

    # production path: host loader feeds space-to-depth-packed frames
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack
    host = np.random.default_rng(0).standard_normal(
        (2 * B, H, W, 3)).astype(np.float32)
    both_s2d = jax.device_put(
        jnp.asarray(s2d_pack(host)).astype(dt), dev)
    results["trunk_2B_s2d"] = timeit(
        lambda v, x: fe.apply(v, x, train=False)[0], (fv, both_s2d), args.iters)

    feat = rand((B, H // 4, W // 4, 128))
    feat_r = rand((B, H // 4, W // 4, 128))

    # ---- cost volume (correlation) ----
    d4 = args.max_disp // 4
    results["cost_volume"] = timeit(
        lambda l, r: cost_volume_pyramid([l], [r], d4, "correlation")[0],
        (feat, feat_r), args.iters)

    # ---- adaptive aggregation (3 fusions, 2 deform) ----
    vol = rand((B, H // 4, W // 4, d4))
    agg = AdaptiveAggregation(num_scales=1, num_fusions=3, num_deform_blocks=2,
                              deform_impl=args.deform_impl, dtype=dt)
    with jax.default_device(cpu):
        av = agg.init(jax.random.PRNGKey(0), [jnp.ones((1, 64, 128, d4))], False)
    av = jax.device_put(av, dev)
    results["aggregation"] = timeit(
        lambda v, x: agg.apply(v, [x], False)[0], (av, vol), args.iters)

    # ---- soft-argmin ----
    results["soft_argmin"] = timeit(
        lambda x: soft_argmin_disparity(x), (vol,), args.iters)

    # ---- semantic refinement (full res) ----
    disp_low = rand((B, H // 4, W // 4), jnp.float32)
    img = rand((B, H, W, 3))
    ref = SemanticGuidedRefinement(dtype=dt)
    with jax.default_device(cpu):
        rv = ref.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 64)),
                      jnp.ones((1, 128, 256, 3)), jnp.ones((1, 32, 64, 128)),
                      False)
    rv = jax.device_put(rv, dev)
    results["refinement"] = timeit(
        lambda v, d, i, f: ref.apply(v, d, i, f, False), (rv, disp_low, img, feat),
        args.iters)

    # ---- reference-faithful disp_sem refinement (U-net at /4) ----
    from doubly_contrastive_semseg_tpu.models.stereo_extras import make_refinement
    sr = make_refinement("disp_sem", dtype=dt)
    with jax.default_device(cpu):
        sv = sr.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 64)),
                     jnp.ones((1, 128, 256, 3)), jnp.ones((1, 32, 64, 128)),
                     False)
    sv = jax.device_put(sv, dev)
    results["refine_disp_sem"] = timeit(
        lambda v, d, i, f: sr.apply(v, d, i, f, False)[0],
        (sv, disp_low, img, feat), args.iters)

    # ---- seg head: 1x1 conv + full-res bilinear + argmax ----
    def seghead(f):
        k = jnp.ones((1, 1, 128, 19), dt)
        s = jax.lax.conv_general_dilated(
            f, k, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
        return jnp.argmax(resize_bilinear(s, (H, W)), axis=-1).astype(jnp.uint8)

    results["seg_head"] = timeit(seghead, (feat,), args.iters)

    total = sum(results.values())
    for k, v in results.items():
        print(f"{k:14s} {v:8.2f} ms")
    print(f"{'SUM':14s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
