#!/usr/bin/env python
"""Microbench: NHWC -> s2d(2) device relayout formulations at serving shape.

The headline serving path feeds host-packed s2d batches; the plain-NHWC
companion number pays an on-device relayout that XLA lowers as a ~6.5 ms
shuffle at (8, 1024, 2048, 3) bf16 (TODO.md roofline; VERDICT r3 weak #1).
This bench times candidate formulations of that relayout on the real chip:

  A. current   reshape(B,H/2,2,W/2,2,C) + 6-D transpose (c-major channels,
               c*4 + dy*2 + dx — ops/input_pipeline.py::space_to_depth2_nhwc)
  B. dy-major  concat(even-H-rows view, odd-H-rows view) on channels:
               x[:, dy::2].reshape(B, H/2, W/2, 2C) is the SAME bytes in
               row-major order ((W,3) -> (W/2,6) merges minor dims), so the
               only data movement is two strided row copies + a lane concat,
               at the price of the dy*6 + dx*3 + c channel order -- which
               every downstream consumer absorbs as a free static
               permutation of its conv kernel's input-channel axis.
  C. B + take  dy-major copy then gather back to c-major (measures what the
               12-channel permutation costs if a consumer insisted on it).
  D. copy floor elementwise x+1 at input shape (read+write bandwidth bound).

Run:  python scripts/bench_s2d_relayout.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 1024, 2048


def t_op(fn, x, iters):
    f = jax.jit(fn)
    out = f(x)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = f(x)
        jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def s2d_current(x):
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w // 2, 2, c)
             .transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, 4 * c))


def s2d_dymajor(x):
    b, h, w, c = x.shape
    even = x[:, 0::2].reshape(b, h // 2, w // 2, 2 * c)
    odd = x[:, 1::2].reshape(b, h // 2, w // 2, 2 * c)
    return jnp.concatenate([even, odd], axis=-1)


# new-index -> old-c-major-index: P[dy*6+dx*3+c] = c*4 + dy*2 + dx
P_DY2C = np.array([c * 4 + dy * 2 + dx
                   for dy in range(2) for dx in range(2) for c in range(3)])
# inverse: c-major index k sits at dy-major position INV[k]
INV = np.argsort(P_DY2C)


def s2d_dymajor_perm(x):
    return jnp.take(s2d_dymajor(x), jnp.asarray(INV), axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}")
    x = jax.device_put(jnp.asarray(
        np.random.rand(B, H, W, 3).astype(np.float32), jnp.bfloat16), dev)

    # correctness first (tiny shapes, on CPU semantics via the same tracer)
    xs = jnp.asarray(np.random.rand(2, 8, 12, 3).astype(np.float32))
    a = np.asarray(s2d_current(xs))
    bdy = np.asarray(s2d_dymajor(xs))
    np.testing.assert_allclose(bdy[..., INV], a, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s2d_dymajor_perm(xs)), a)
    print("correctness: dy-major[INV] == c-major  OK")

    for name, fn in [
        ("A current transpose (c-major)", s2d_current),
        ("B dy-major slice+concat      ", s2d_dymajor),
        ("C dy-major + take to c-major ", s2d_dymajor_perm),
        ("D elementwise copy floor     ", lambda v: v + 1),
    ]:
        ms = t_op(fn, x, args.iters)
        print(f"{name}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
