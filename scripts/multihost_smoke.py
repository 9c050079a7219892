#!/usr/bin/env python
"""Two-process ``jax.distributed`` smoke — multi-HOST, not just multi-device.

The reference's only parallelism is single-process ``nn.DataParallel``
(``utils/init_trainer.py:310-313``), so this is TPU-native headroom, not
parity debt: the claim under test is that the ONE GSPMD training-step
program we ship (batch sharded over a ``Mesh(('data',))``, params
replicated, gradient all-reduce + global-batch BN inserted by XLA) runs
UNCHANGED when the mesh spans multiple processes — the DCN/multi-host
topology — with every process computing the identical loss.

Mechanics: the parent spawns 2 children, each exposing 4 virtual CPU
devices (8 global). Children call ``jax.distributed.initialize`` against a
shared coordinator, build the global mesh, assemble global arrays from
process-local shards (``jax.make_array_from_process_local_data``), run ONE
step of the full doubly-contrastive criterion, run one EVAL step (on-device
confusion accumulation), round-trip the resulting state through a collective
orbax save/restore, and print loss + cm hash + restore verdict. The parent
asserts all processes agree bit-for-bit and writes ``MULTIHOST_r<N>.json``
when invoked with ``--artifact``.

Usage:
    python scripts/multihost_smoke.py              # run, print verdict
    python scripts/multihost_smoke.py --artifact MULTIHOST_r03.json
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

DEVICES_PER_PROC = 4
NUM_PROCS = 2
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(process_id: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=NUM_PROCS,
        process_id=process_id,
        local_device_ids=list(range(DEVICES_PER_PROC)),
    )
    import numpy as np

    from doubly_contrastive_semseg_tpu.config import parse_args
    from doubly_contrastive_semseg_tpu.models import build_model
    from doubly_contrastive_semseg_tpu.parallel import (
        batch_sharding, make_mesh, replicate_sharding)
    from doubly_contrastive_semseg_tpu.train.state import init_state_and_optimizer
    from doubly_contrastive_semseg_tpu.train.steps import make_train_step

    n_global = NUM_PROCS * DEVICES_PER_PROC
    assert len(jax.devices()) == n_global, jax.devices()
    assert len(jax.local_devices()) == DEVICES_PER_PROC
    mesh = make_mesh(n_global)

    cfg = parse_args([
        "--dataset", "synthetic", "--train_semantic",
        "--criterion", "supcon_pixelcontrast_focal",
        "--batch_size", str(n_global), "--compute_dtype", "float32",
        "--no_use_balanced_weights", "--no_efficient",
    ])
    model = build_model(cfg)

    b, s = n_global, 96
    rng = np.random.default_rng(0)  # same global batch on every process
    global_batch = {
        "left": rng.uniform(0, 255, (2 * b, s, s, 3)).astype(np.float32),
        "label": rng.integers(0, 19, (b, s, s)).astype(np.int64),
        "label_distance_weight": rng.uniform(0, 1, (b, s, s)).astype(np.float32),
        "weather": rng.integers(0, 4, (b,)).astype(np.int32),
        "class_weight": np.ones((19,), np.float32),
    }

    with mesh:
        bs_shard = batch_sharding(mesh)
        repl = replicate_sharding(mesh)

        def to_global(arr, sharding):
            # each process contributes the rows its addressable devices own
            if sharding is bs_shard:
                rows = arr.shape[0]
                per = rows // n_global
                lo = process_id * DEVICES_PER_PROC * per
                hi = lo + DEVICES_PER_PROC * per
                local = arr[lo:hi]
            else:
                local = arr
            return jax.make_array_from_process_local_data(
                sharding, local, arr.shape)

        db = {k: to_global(v, bs_shard if v.ndim >= 1 and
                           v.shape[0] % n_global == 0 else repl)
              for k, v in global_batch.items()}

        key = jax.random.PRNGKey(0)
        # identical init on every process (same key, same model), promoted to
        # globally-replicated arrays
        state, tx = init_state_and_optimizer(model, cfg, db, key,
                                             steps_per_epoch=10)
        state = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x), np.shape(x)), state)

        train_step = jax.jit(make_train_step(model, cfg, tx))
        new_state, metrics = train_step(state, db, key)
        total = float(metrics["total_loss"])
        step_no = int(new_state.step)

        # ---- eval pass: the validate path's on-device metric accumulation
        # must also run under jax.distributed (VERDICT r3 item 6) ----
        import hashlib

        from doubly_contrastive_semseg_tpu.train.steps import (
            init_eval_accum, make_eval_step)

        edb = {
            "left": to_global(global_batch["left"][:b], bs_shard),
            "label": to_global(global_batch["label"], bs_shard),
            "weather": to_global(global_batch["weather"], bs_shard),
        }
        accum = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x), np.shape(x)), init_eval_accum(cfg))
        eval_step = jax.jit(make_eval_step(model, cfg))
        _, accum = eval_step(new_state.params, new_state.batch_stats, edb, accum)
        cm = np.asarray(jax.device_get(accum["cm"]))
        eval_cm = hashlib.sha256(cm.tobytes()).hexdigest()[:12]

        # ---- orbax save/restore under jax.distributed: every process joins
        # the collective save, then restores and must get the step-1 params
        # back bit-exactly ----
        from doubly_contrastive_semseg_tpu.train.checkpoints import CheckpointManager

        io = CheckpointManager(os.environ["MULTIHOST_CKPT_DIR"])
        io.save("multihost", new_state, epoch=0)
        restored, _ = io.restore(os.path.join(io.directory, "multihost"),
                                 state, continue_training=True)

        def leaf(s):
            return np.asarray(jax.device_get(
                s.params["net"]["segmentation"]["conv"]["kernel"]))

        ckpt_ok = (np.array_equal(leaf(restored), leaf(new_state))
                   and int(restored.step) == step_no)

    print(f"MULTIHOST-RESULT pid={process_id} loss={total!r} step={step_no} "
          f"eval_cm={eval_cm} ckpt_ok={ckpt_ok}", flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
        return 0

    artifact = None
    if "--artifact" in sys.argv:
        artifact = sys.argv[sys.argv.index("--artifact") + 1]

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}").strip()
    import tempfile

    env["MULTIHOST_CKPT_DIR"] = tempfile.mkdtemp(prefix="multihost_ckpt_")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "child", str(i), str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(NUM_PROCS)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    losses, eval_cms, ckpt_oks = {}, {}, {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        for line in out.splitlines():
            if line.startswith("MULTIHOST-RESULT"):
                parts = dict(kv.split("=", 1) for kv in line.split()[1:])
                losses[i] = parts["loss"]
                eval_cms[i] = parts.get("eval_cm", "")
                ckpt_oks[i] = parts.get("ckpt_ok", "")
        if p.returncode != 0:
            sys.stderr.write(out[-4000:])
            print(f"FAIL: process {i} rc={p.returncode}")
            return 1
    if len(losses) != NUM_PROCS:
        sys.stderr.write("\n".join(o[-2000:] for o in outs))
        print("FAIL: missing results")
        return 1
    agree = (len(set(losses.values())) == 1
             and len(set(eval_cms.values())) == 1
             and set(ckpt_oks.values()) == {"True"})
    result = {
        "ok": agree,
        "num_processes": NUM_PROCS,
        "devices_per_process": DEVICES_PER_PROC,
        "loss_per_process": losses,
        "eval_cm_per_process": eval_cms,
        "ckpt_ok_per_process": ckpt_oks,
        "detail": "2-process jax.distributed CPU run: sharded doubly-"
                  "contrastive train step (losses must agree exactly), eval "
                  "step with on-device confusion accumulation (cm hashes must "
                  "agree), and a collective orbax save/restore round-trip "
                  "(bit-exact params + step on every process)",
    }
    print(json.dumps(result))
    if artifact:
        with open(os.path.join(REPO, artifact), "w") as f:
            json.dump(result, f, indent=1)
    return 0 if agree else 1


if __name__ == "__main__":
    sys.exit(main())
