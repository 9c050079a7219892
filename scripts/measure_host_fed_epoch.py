#!/usr/bin/env python
"""MEASURED host-fed training-feed proof (VERDICT r4 missing #1 / weak #1-2).

Round 4's `HOSTPIPE_r04.json` established per-sample costs and EXTRAPOLATED
"19.9 loader cores sustain training". This script replaces the extrapolation
with measurements of everything this 1-core dev host can physically measure,
and is explicit about the one thing it cannot (augmentation C-library work
scaling across cores it does not have):

1. ``real_chain``     — the full TwoCrop ACDC augmentation per-sample cost,
   with a per-stage breakdown (PIL crop/scale vs cv2 EDT vs numpy ToArrays)
   so the GIL-free C-library share is visible.
2. ``loader_at_scale``— the REWORKED cross-batch windowed loader
   (``data/loader.py``) run at the claimed worker scale (20 workers).
   Workers sleep the measured per-sample time (emulating GIL-free C-library
   augmentation on a host that has the cores) but allocate REAL full-size
   sample arrays; the loader does REAL two-crop collation at full data
   volume. What this measures for real: the loader architecture (window,
   queue, GIL-held numpy plumbing, collate) sustains the target batch rate
   within ONE core's budget — the part round 4 could not claim.
3. ``paced_consumer`` — same at-scale loader consumed at the measured
   223.7 ms device-step cadence for a synthetic epoch: achieved end-to-end
   step time vs the device-resident step.
4. ``real_feed_1core``— the honest number for THIS host: the real
   augmentation chain through the real loader, achieved batches/s (the
   deficit VERDICT flagged, now measured end-to-end instead of implied).
5. ``decode_only``    — per-frame PNG decode cost: the host's entire
   per-sample duty under ``--no_host_augment`` (device-side augmentation),
   the designed answer for feed-starved hosts.

Writes one JSON line per measurement + a combined HOSTPIPE_r05.json.
Reference behavior compared against: 4 overlapped DataLoader workers,
``/root/reference/utils/init_trainer.py:86-93``.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_STEP_S = 0.2237          # measured device train step, bs 8 two-crop (BENCH r3/r4)
TRAIN_BS = 8
NEED_BATCHES_PER_S = 1.0 / TRAIN_STEP_S          # 4.47
NEED_SAMPLES_PER_S = TRAIN_BS / TRAIN_STEP_S     # 35.8 two-crop samples/s
CLAIMED_WORKERS = 20


def _acdc_like_sample(seed: int = 0):
    """A realistic ACDC frame: 1920x1080 RGB + labelIds with ~10 regions."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w]
    k = 10
    cx, cy = rng.uniform(0, w, k), rng.uniform(0, h, k)
    region = np.argmin((xx[None] - cx[:, None, None]) ** 2 +
                       (yy[None] - cy[:, None, None]) ** 2, axis=0)
    ids = rng.integers(0, 19, k)
    label = Image.fromarray(ids[region].astype(np.uint8))
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
    return img, label


def _build_chain(two_crop: bool):
    from doubly_contrastive_semseg_tpu.data.transforms import (
        Compose, LabelBoundaryTransform, RandomSquareCropAndScale,
        SetTargetSize, ThreadSafeRng, ToArrays, TwoCropTransform)

    stages = [
        ("crop_scale", RandomSquareCropAndScale(
            (768, 768), mean=(73, 82, 72), ignore_id=255,
            rng=ThreadSafeRng(np.random.default_rng(1)))),
        ("set_target", SetTargetSize(target_size=(768, 768),
                                     target_size_feats=(192, 192))),
        ("edt", LabelBoundaryTransform(num_classes=19, reduce=True)),
        ("to_arrays", ToArrays()),
    ]
    chain = Compose([s for _, s in stages])
    return (TwoCropTransform(chain) if two_crop else chain), stages


def measure_real_chain(n_iter: int = 10) -> Dict:
    img, label = _acdc_like_sample()
    two, stages = _build_chain(two_crop=True)

    def fresh():
        return {"left": img, "label": label, "weather": np.array([0])}

    two(fresh())  # warm
    t0 = time.perf_counter()
    for _ in range(n_iter):
        two(fresh())
    two_s = (time.perf_counter() - t0) / n_iter

    # per-stage breakdown (single view)
    stage_ms = {}
    sample = fresh()
    for name, t in stages:
        t(dict(sample))  # warm on current representation
        t0 = time.perf_counter()
        for _ in range(max(4, n_iter)):
            out = t(dict(sample))
        stage_ms[name] = (time.perf_counter() - t0) / max(4, n_iter) * 1e3
        sample = out
    return {"metric": "real_chain_twocrop_ms", "value": round(two_s * 1e3, 1),
            "unit": "ms/sample/core", "stage_ms_single_view": {
                k: round(v, 1) for k, v in stage_ms.items()}}


class _EmulatedDataset:
    """Sleeps the measured per-sample augmentation time (C-library work
    releases the GIL; sleep emulates it on a host without spare cores), then
    allocates the REAL output arrays a TwoCrop sample carries — the GIL-held
    numpy plumbing is exercised at full data volume."""

    def __init__(self, n: int, sample_s: float):
        self.n = n
        self.sample_s = sample_s

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.sample_s)
        # dtypes = the loader's narrow wire format (ToArrays: uint8
        # image/label, float32 EDT weight; widened on device by
        # train/steps.py::ingest_batch)
        view = lambda: {  # noqa: E731
            "left": np.empty((768, 768, 3), np.uint8),
            "label": np.empty((768, 768), np.uint8),
            "label_distance_weight": np.empty((768, 768), np.float32),
            "weather": np.array(0),
        }
        v0, v1 = view(), view()
        v0["left"].fill(128); v0["label"].fill(1)  # touch the pages
        v1["left"].fill(128); v1["label"].fill(1)
        v0["label_distance_weight"].fill(0.1)
        return [v0, v1]


def measure_loader_at_scale(sample_s: float, n_batches: int = 40) -> Dict:
    from doubly_contrastive_semseg_tpu.data.loader import DataLoader

    ds = _EmulatedDataset(n_batches * TRAIN_BS, sample_s)
    dl = DataLoader(ds, batch_size=TRAIN_BS, num_workers=CLAIMED_WORKERS,
                    prefetch=2)
    it = iter(dl)
    next(it)  # pool spin-up + window fill excluded (steady-state rate)
    t0 = time.perf_counter()
    n = sum(1 for _ in it)
    wall = time.perf_counter() - t0
    rate = n / wall
    return {"metric": "loader_at_scale_batches_per_s", "value": round(rate, 2),
            "unit": f"batches/s ({CLAIMED_WORKERS} workers, emulated "
                    f"{sample_s * 1e3:.0f} ms GIL-free sample cost, real "
                    f"arrays+collate)",
            "needed_batches_per_s": round(NEED_BATCHES_PER_S, 2),
            "sustains_train_step": bool(rate >= NEED_BATCHES_PER_S),
            "n_batches": n, "wall_s": round(wall, 2)}


def measure_paced_consumer(sample_s: float, n_batches: int = 40) -> Dict:
    """End-to-end achieved step cadence with a consumer paced at the device
    step time (emulating the TPU chip consuming one batch per 223.7 ms)."""
    from doubly_contrastive_semseg_tpu.data.loader import DataLoader

    ds = _EmulatedDataset(n_batches * TRAIN_BS, sample_s)
    dl = DataLoader(ds, batch_size=TRAIN_BS, num_workers=CLAIMED_WORKERS,
                    prefetch=2)
    it = iter(dl)
    next(it)  # warm: window filled
    t0 = time.perf_counter()
    n = 0
    for _ in it:
        time.sleep(TRAIN_STEP_S)  # the device step
        n += 1
    wall = time.perf_counter() - t0
    step_ms = wall / n * 1e3
    return {"metric": "paced_end_to_end_step_ms", "value": round(step_ms, 1),
            "unit": "ms/step (loader + 223.7 ms paced device step)",
            "device_resident_step_ms": round(TRAIN_STEP_S * 1e3, 1),
            "overhead_pct": round((step_ms / (TRAIN_STEP_S * 1e3) - 1) * 100, 1),
            "n_steps": n}


def measure_real_feed_this_host(n_batches: int = 4) -> Dict:
    """The honest 1-core number: real augmentation through the real loader."""
    from doubly_contrastive_semseg_tpu.data.loader import DataLoader

    img, label = _acdc_like_sample()
    two, _ = _build_chain(two_crop=True)

    class _RealDs:
        def __len__(self):
            return (n_batches + 1) * TRAIN_BS

        def __getitem__(self, i):
            return two({"left": img, "label": label, "weather": np.array([0])})

    dl = DataLoader(_RealDs(), batch_size=TRAIN_BS, num_workers=4, prefetch=2)
    it = iter(dl)
    next(it)  # exclude spin-up
    t0 = time.perf_counter()
    n = sum(1 for _ in it)
    wall = time.perf_counter() - t0
    rate = n / wall
    return {"metric": "real_feed_this_host_batches_per_s",
            "value": round(rate, 3), "unit": "batches/s (1-core host, real "
            "TwoCrop chain, 4 workers)",
            "needed_batches_per_s": round(NEED_BATCHES_PER_S, 2),
            "deficit_x": round(NEED_BATCHES_PER_S / rate, 1),
            "honest_step_ms_on_this_host": round(1e3 / rate, 0)}


def measure_decode_only(n_iter: int = 12) -> Dict:
    """--no_host_augment host duty: PNG decode of one 1920x1080 frame."""
    from PIL import Image

    img, label = _acdc_like_sample()
    buf_i, buf_l = io.BytesIO(), io.BytesIO()
    img.save(buf_i, format="PNG")
    label.save(buf_l, format="PNG")

    def decode():
        im = Image.open(io.BytesIO(buf_i.getvalue())); im.load()
        lb = Image.open(io.BytesIO(buf_l.getvalue())); lb.load()
        return np.asarray(im), np.asarray(lb)

    decode()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        decode()
    dec_s = (time.perf_counter() - t0) / n_iter
    # device augmentation consumes B=8 raw frames per step (two-crop happens
    # on device), so the host needs 35.8 decodes/s
    cores = NEED_SAMPLES_PER_S * dec_s
    return {"metric": "decode_only_ms", "value": round(dec_s * 1e3, 1),
            "unit": "ms/frame/core (PNG 1920x1080 rgb+label)",
            "cores_to_feed_train_step": round(cores, 2),
            "note": "--no_host_augment: host decodes only; crop/EDT/gamma/"
                    "two-crop run inside the jitted step (data/device_augment.py)"}


def main() -> None:
    rows: List[Dict] = []

    real = measure_real_chain()
    rows.append(real)
    print(json.dumps(real))
    sample_s = real["value"] / 1e3

    scale = measure_loader_at_scale(sample_s)
    rows.append(scale)
    print(json.dumps(scale))

    paced = measure_paced_consumer(sample_s)
    rows.append(paced)
    print(json.dumps(paced))

    host1 = measure_real_feed_this_host()
    rows.append(host1)
    print(json.dumps(host1))

    dec = measure_decode_only()
    rows.append(dec)
    print(json.dumps(dec))

    summary = {
        "round": 5,
        "loader": "data/loader.py cross-batch windowed producer (r5 rework): "
                  "per-sample futures over a sliding window of batches; "
                  "throughput scales with num_workers instead of capping at "
                  "batch_size/t_sample",
        "measurements": rows,
        "what_is_proven": [
            "the loader architecture + ALL GIL-held plumbing (futures, "
            "queue, full-size arrays, two-crop collate) sustains the device "
            "step's batch rate within one core's budget at 20 workers "
            "(loader_at_scale, paced_consumer — measured, not extrapolated)",
            "the honest 1-core end-to-end deficit with real augmentation "
            "(real_feed_this_host)",
            "the --no_host_augment escape hatch's host duty is decode-only "
            "(decode_only)"],
        "what_is_assumed": [
            "PIL/cv2 augmentation compute scales across physical cores on a "
            "multi-core production host (they release the GIL; this box has "
            "1 core, so C-library parallelism itself cannot be demonstrated "
            "here — emulated by GIL-free sleeps of the measured duration)"],
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "HOSTPIPE_r05.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"written": out,
                      "sustains": scale["sustains_train_step"],
                      "end_to_end_overhead_pct": paced["overhead_pct"]}))


if __name__ == "__main__":
    main()
