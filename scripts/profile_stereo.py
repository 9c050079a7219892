#!/usr/bin/env python
"""Per-stage timing decomposition of the StereoDCSS serving path.

Times each stage as a standalone jitted module at the exact shapes the full
model runs them (timing needs architecture + shapes, not shared weights), so
optimization effort lands where the milliseconds are. Shapes assume the
headline protocol: batch 2, 2048×1024, max_disp 192, bf16, s2d-packed input
(scripts/bench_stereo.py).

Run on the TPU chip: python scripts/profile_stereo.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16
    b, h, w, d4 = args.batch_size, args.height, args.width, args.max_disp // 4
    dev = jax.devices()[0]

    def bench(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else a, out)
        # D2H fence like bench.py (block_until_ready acks at dispatch over
        # the axon tunnel)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(jnp.ravel(leaf.astype(jnp.float32))[0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = f(*xs)
            leaf = jax.tree_util.tree_leaves(o)[0]
            float(jax.device_get(jnp.ravel(leaf.astype(jnp.float32))[0]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{name:42s} {best * 1e3:8.2f} ms")
        return best

    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    # --- trunk: shared over both views = batch 2B, s2d-packed input --------
    from doubly_contrastive_semseg_tpu.models.resnet_pyramid import (
        resnet18_pyramid)
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import s2d_pack

    trunk = resnet18_pyramid(dtype=dt)
    x = jax.device_put(jnp.asarray(
        s2d_pack(np.ones((2 * b, h, w, 3), np.float32)).astype(np.float32),
        dt), dev)
    with jax.default_device(jax.devices("cpu")[0]):
        tv = trunk.init(rng, jnp.ones((1, 128, 256, 3)), train=False)
    tv = jax.device_put(tv, dev)
    bench("trunk (2B views, s2d)", lambda v, a: trunk.apply(v, a, train=False),
          tv, x)

    # --- correlation cost volume at 1/4 ------------------------------------
    from doubly_contrastive_semseg_tpu.ops.cost_volume import (
        correlation_cost_volume, soft_argmin_disparity)

    lf = jax.device_put(jnp.ones((b, h // 4, w // 4, 128), dt), dev)
    bench(f"correlation volume D={d4}",
          lambda a, c: correlation_cost_volume(a, c, d4), lf, lf)

    # --- adaptive aggregation (3 fusions, 2 deform, window impl) -----------
    from doubly_contrastive_semseg_tpu.models.stereo import AdaptiveAggregation

    agg = AdaptiveAggregation(num_scales=1, num_fusions=3, num_deform_blocks=2,
                              deform_impl="window", dtype=dt)
    vol = jax.device_put(jnp.ones((b, h // 4, w // 4, d4), dt), dev)
    with jax.default_device(jax.devices("cpu")[0]):
        av = agg.init(rng, [jnp.ones((1, 32, 64, d4))], train=False)
    av = jax.device_put(av, dev)
    bench("adaptive aggregation (3 fusions)",
          lambda v, a: agg.apply(v, [a], train=False), av, vol)

    bench("soft-argmin", lambda a: soft_argmin_disparity(a), vol)

    # --- SemRefine disp_sem head at full res -------------------------------
    from doubly_contrastive_semseg_tpu.models.stereo_extras import (
        make_refinement)

    ref = make_refinement("disp_sem", dtype=dt)
    ld = jax.device_put(jnp.ones((b, h // 4, w // 4), dt), dev)
    sem = jax.device_put(jnp.ones((b, h // 4, w // 4, 128), dt), dev)
    with jax.default_device(jax.devices("cpu")[0]):
        rv = ref.init(rng, jnp.ones((1, 32, 64)), jnp.ones((1, 128, 256, 3)),
                      jnp.ones((1, 32, 64, 128)), train=False)
    rv = jax.device_put(rv, dev)
    xi = jax.device_put(jnp.asarray(
        s2d_pack(np.ones((b, h, w, 3), np.float32)).astype(np.float32), dt),
        dev)
    bench("SemRefine disp_sem (full res)",
          lambda v, a, im, s: ref.apply(v, a, im, s, train=False),
          rv, ld, xi, sem)

    # --- fused Pallas seg head ---------------------------------------------
    from doubly_contrastive_semseg_tpu.ops.seghead_pallas import (
        fused_seghead_upsample_argmax)

    k = jax.device_put(jnp.ones((1, 1, 128, 19), jnp.float32), dev)
    bias = jax.device_put(jnp.zeros((19,), jnp.float32), dev)
    ones = jax.device_put(jnp.ones((128,), jnp.float32), dev)
    zeros = jax.device_put(jnp.zeros((128,), jnp.float32), dev)
    bench("fused seg head (pallas)",
          lambda f: fused_seghead_upsample_argmax(f, ones, zeros, zeros, ones,
                                                  k, bias), lf)


if __name__ == "__main__":
    main()
