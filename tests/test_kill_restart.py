"""Kill-and-restart integration test (SURVEY §5 failure recovery).

SIGKILLs a real ``main.py`` training subprocess mid-epoch and proves the
restarted process continues **bit-faithfully**: the final checkpoint params
are bit-equal to an uninterrupted run's, and the validation history matches.

This is the scenario the checkpointable input pipeline exists for:
``--loader grain`` serializes the iterator's mid-epoch position into the
periodic ``rescue_checkpoint`` (``--rescue_interval``, trainer.py
``_write_rescue``), and ``--no_host_augment`` keys augmentation off
``fold_in(rng, num_iter)`` inside the jitted step, so a fresh process replays
the exact sample stream AND the exact augmentation draws. The reference has
no equivalent: a killed run restarts its epoch from scratch with new draws
(torch DataLoader keeps no position; SURVEY §5 "failure detection: none").

SIGKILL (uncatchable) is the point — the SIGTERM/SIGINT rescue handler
(trainer.py::_install_signal_rescue) never runs; only the periodic rescue
written BEFORE the kill can save the run.
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "--dataset", "synthetic", "--debug", "--model", "resnet18",
    "--train_semantic", "--criterion", "none",
    "--no_host_augment", "--loader", "grain", "--num_workers", "0",
    "--epochs", "2", "--batch_size", "2", "--val_batch_size", "2",
    "--compute_dtype", "float32", "--no_use_balanced_weights",
    "--print_freq", "1", "--random_seed", "7",
]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the axon TPU-claim handshake
    env.pop("XLA_FLAGS", None)        # single CPU device is enough
    return env


def _run(run_root: str, checkname: str, extra=(), wait=True):
    cmd = [sys.executable, os.path.join(REPO, "main.py"), *COMMON,
           "--run_root", run_root, "--checkname", checkname, *extra]
    proc = subprocess.Popen(cmd, cwd=REPO, env=_env(),
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    if not wait:
        return proc
    out, _ = proc.communicate(timeout=1800)
    assert proc.returncode == 0, f"{checkname} failed:\n{out[-4000:]}"
    return out


def _latest(run_root: str, checkname: str, name: str) -> str:
    paths = glob.glob(os.path.join(
        run_root, "synthetic", checkname, "*", "checkpoints", name))
    assert paths, f"no {name} under {checkname}"
    return sorted(paths)[-1]


def _params(ckpt_path: str):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(ckpt_path)


def _val_history(run_root: str, checkname: str) -> str:
    paths = glob.glob(os.path.join(
        run_root, "synthetic", checkname, "*", "val_results.txt"))
    text = ""
    for p in sorted(paths):
        with open(p) as f:
            text += f.read()
    return text


def test_sigkill_and_restart_bit_faithful(tmp_path):
    root = str(tmp_path)

    # --- uninterrupted reference run: 2 epochs × 4 batches = 8 steps -------
    _run(root, "full")

    # --- killed run: rescue every 2 steps, SIGKILL once step 3 is in flight
    proc = _run(root, "killed", extra=["--rescue_interval", "2"], wait=False)
    deadline = time.time() + 1500
    seen = ""
    try:
        for line in proc.stdout:  # type: ignore[union-attr]
            seen += line
            # print_freq=1: one log line per step; step 3 in flight means the
            # num_iter=2 rescue has already been written (same loop iteration,
            # before the next batch starts)
            if "][  3/" in line:
                os.kill(proc.pid, signal.SIGKILL)
                break
        else:
            pytest.fail(f"never reached step 3:\n{seen[-4000:]}")
    finally:
        proc.wait(timeout=60)
        if proc.stdout:
            proc.stdout.close()
    assert time.time() < deadline
    assert proc.returncode == -signal.SIGKILL

    rescue = _latest(root, "killed", "rescue_checkpoint")
    with open(rescue + ".meta.json") as f:
        meta = json.load(f)
    assert meta.get("mid_epoch") is True
    assert int(meta.get("num_iter", -1)) == 2

    # --- restart from the rescue: continue the SAME epoch at batch 2 -------
    out = _run(root, "resumed",
               extra=["--resume", rescue, "--continue_training",
                      "--rescue_interval", "2"])
    # the resumed process trains only the REMAINING 2 batches of epoch 0
    # (batches 2-3; the full run trained 4), then all of epoch 1
    ep0 = [l for l in out.splitlines() if "Epoch: [  0/" in l]
    ep1 = [l for l in out.splitlines() if "Epoch: [  1/" in l]
    assert len(ep0) == 2, ep0
    assert len(ep1) == 4, ep1

    # --- bit-faithful: final params identical to the uninterrupted run -----
    p_full = _params(_latest(root, "full", "latest_checkpoint"))
    p_res = _params(_latest(root, "resumed", "latest_checkpoint"))
    import jax

    lf, tf = jax.tree_util.tree_flatten(p_full)
    lr, tr = jax.tree_util.tree_flatten(p_res)
    assert tf == tr
    for a, b in zip(lf, lr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --- and the validation history (epoch-end mIoU/acc) matches exactly ---
    assert _val_history(root, "resumed") == _val_history(root, "full")
