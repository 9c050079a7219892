#!/usr/bin/env python
"""On-chip validation + isolated timing of the fused serving head.

Compares fused_seghead_upsample_argmax against the unfused XLA path
(BN→ReLU→1×1 → ×4 bilinear → argmax, bf16 compute like the kernel) at the
headline shape plus ragged shapes, then times both with the enqueue-K/fence
protocol bench.py uses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from doubly_contrastive_semseg_tpu.ops.interpolate import resize_bilinear
from doubly_contrastive_semseg_tpu.ops.seghead_pallas import (
    fused_seghead_upsample_argmax,
)


def xla_path(feat, scale, bias, mean, var, kernel, cbias):
    a = scale / jnp.sqrt(var + 1e-5)
    sh = bias - mean * a
    h = jnp.maximum(feat.astype(jnp.float32) * a + sh, 0.0).astype(jnp.bfloat16)
    logits = jnp.einsum("bhwc,co->bhwo", h, kernel.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + cbias
    up = resize_bilinear(logits, (feat.shape[1] * 4, feat.shape[2] * 4))
    return jnp.argmax(up, axis=-1).astype(jnp.int8)


def timeit(jitted, args, iters=20, warmup=3):
    def fence(o):
        return np.asarray(jax.device_get(o.ravel()[0]))

    fence(jitted(*args))
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
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    cin, c = 128, 19

    scale = rng.uniform(0.5, 1.5, cin).astype(np.float32)
    bias = rng.standard_normal(cin).astype(np.float32)
    mean = rng.standard_normal(cin).astype(np.float32)
    var = rng.uniform(0.5, 2.0, cin).astype(np.float32)
    kernel = rng.standard_normal((cin, c)).astype(np.float32) * 0.1
    cbias = rng.standard_normal(c).astype(np.float32)
    small = [jax.device_put(jnp.asarray(v), dev)
             for v in (scale, bias, mean, var, kernel, cbias)]

    fused = jax.jit(lambda f: fused_seghead_upsample_argmax(f, *small))
    ref = jax.jit(lambda f: xla_path(f, *small))

    # parity: headline (8,256,512), ragged rows (2,270,480), unaligned W
    for shp in [(8, 256, 512), (2, 270, 480), (1, 30, 61)]:
        b, h, w = shp
        feat = jax.device_put(jnp.asarray(
            rng.standard_normal((b, h, w, cin)).astype(np.float32)
            ).astype(jnp.bfloat16), dev)
        got = np.asarray(jax.device_get(fused(feat)))
        want = np.asarray(jax.device_get(ref(feat)))
        agree = (got == want).mean()
        print(f"shape {shp}: argmax agreement {agree:.5f}")
        assert agree > 0.995, f"parity regression at {shp}: {agree}"

    feat = jax.device_put(jnp.asarray(
        rng.standard_normal((8, 256, 512, cin)).astype(np.float32)
        ).astype(jnp.bfloat16), dev)
    t_fused = timeit(fused, (feat,))
    t_ref = timeit(ref, (feat,))
    print(f"headline (8,256,512,128) -> (8,1024,2048): "
          f"fused {t_fused:.3f} ms, XLA {t_ref:.3f} ms "
          f"({t_ref / t_fused:.2f}x)")


if __name__ == "__main__":
    main()
