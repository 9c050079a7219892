#!/usr/bin/env python
"""Crossover microbenchmark: fused Pallas contrastive loss vs plain XLA.

The XLA path (losses/supcon.py) materializes the N x N similarity matrix in
HBM; the Pallas kernel (ops/contrastive_pallas.py) streams column tiles and
never writes it. At the reference's scale (N = 2*bsz = 16) XLA wins on
dispatch overhead alone; this script measures where the kernel's regime
begins. Run on the TPU chip:

    python scripts/bench_contrastive.py

The measured table is recorded in the module docstring of
ops/contrastive_pallas.py and decides the default routing threshold
(losses/supcon.py::PALLAS_MIN_N).
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


def timeit(fn, args, iters=20, warmup=3):
    j = jax.jit(fn)

    def fence(o):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]))

    for _ in range(warmup):
        fence(j(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = j(*args)
        fence(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    from doubly_contrastive_semseg_tpu.losses.supcon import supcon_loss
    from doubly_contrastive_semseg_tpu.ops.contrastive_pallas import (
        supcon_loss_pallas)

    grad_mode = "--grad" in sys.argv

    d = 128
    dev = jax.devices()[0]
    print(f"device: {dev}  mode: {'value_and_grad' if grad_mode else 'fwd'}")
    print(f"{'N (=2B)':>9} {'xla ms':>9} {'pallas ms':>10} {'speedup':>8}  "
          f"NxN bf16 MB")

    def xla_fn(f, l):
        loss = supcon_loss(f, l, use_pallas=False)   # force: measure true XLA
        return loss

    def pallas_fn(f, l):
        return supcon_loss_pallas(f, l)

    if grad_mode:
        # grad wrt features only (labels are int): the Pallas path runs the
        # custom-VJP chunked backward, XLA runs autodiff of the N x N graph
        xla_t = jax.value_and_grad(xla_fn)
        pallas_t = jax.value_and_grad(pallas_fn)
    else:
        xla_t, pallas_t = xla_fn, pallas_fn

    for n in (512, 1024, 4096, 8192, 16384, 32768, 65536):
        b = n // 2
        key = jax.random.PRNGKey(0)
        feats = jax.device_put(
            jax.random.normal(key, (b, 2, d), jnp.float32), dev)
        labels = jax.device_put(
            jnp.asarray(np.random.default_rng(0).integers(0, 4, (b,))), dev)
        try:
            t_x = timeit(xla_t, (feats, labels))
        except Exception as e:
            t_x = float("nan")
            print(f"xla failed at N={n}: {type(e).__name__}", file=sys.stderr)
        try:
            t_p = timeit(pallas_t, (feats, labels))
        except Exception as e:
            t_p = float("nan")
            print(f"pallas failed at N={n}: {type(e).__name__}", file=sys.stderr)
        mb = n * n * 2 / 1e6
        print(f"{n:>9} {t_x:>9.3f} {t_p:>10.3f} {t_x / t_p:>8.2f}x  {mb:10.1f}",
              flush=True)

        # agreement at every scale we claim a win for
        if not (np.isnan(t_x) or np.isnan(t_p)):
            if grad_mode:
                va, ga = jax.jit(xla_t)(feats, labels)
                vb, gb = jax.jit(pallas_t)(feats, labels)
                ga, gb = np.asarray(ga), np.asarray(gb)
                rel = np.max(np.abs(ga - gb)) / (np.max(np.abs(ga)) + 1e-30)
                # on the MXU both paths round z to bf16 inputs (default
                # matmul precision) along DIFFERENT contraction orders, so
                # agreement is bf16-level here; the exact-math check is the
                # CPU interpret test (~1e-7, test_pallas_contrastive.py)
                assert rel < 3e-2, (n, rel)
            else:
                va = float(supcon_loss(feats, labels, use_pallas=False))
                vb = float(supcon_loss_pallas(feats, labels))
            assert abs(float(va) - float(vb)) / max(abs(float(va)), 1e-6) \
                < 2e-4, (n, float(va), float(vb))


if __name__ == "__main__":
    main()
