#!/usr/bin/env python
"""Reference-side driver for the whole-program A/B parity harness.

Runs the ACTUAL reference program from ``/root/reference`` (its own
``main.py:18-56`` → ``trainer.py:27-666``) on torch CPU, untouched on disk.
The only interventions are environment shims, applied in-process before
``runpy`` executes ``main.py``:

- torchvision / model_zoo stubs (the packages are absent / offline) — same
  stubs the oracle tests use (``tests/test_reference_parity.py``);
- ``torch.cuda.device`` no-op context when CUDA is unavailable (the
  reference wraps ``empty_cache`` in it unconditionally, ``trainer.py:44``,
  which raises on CPU-only builds);
- ``torch.utils.data.DataLoader`` pinned to ``num_workers=0, shuffle=False``
  (the reference hard-codes ``num_workers=4, shuffle=True``,
  ``utils/init_trainer.py:86-93``) so the augmentation RNG stream and the
  sample visit order are deterministic and reproducible by the JAX program
  (``--reference_rng --no_shuffle`` on our side).

None of these change the reference's computation — they pin its
nondeterminism sources so the two programs are comparable function-for-
function.

Modes:
  make-init --out ckpt.pth --torch-seed N [--backbone resnet18]
      Save a trainer-format checkpoint of a freshly-initialized reference
      WeatherNet (``trainer.py:407-421`` layout). Both programs start from
      these exact weights (reference via --resume, ours via --pretrained).
  train -- <reference main.py argv...>
      Execute the reference's own main.py with the given argv.
"""

from __future__ import annotations

import argparse
import sys
import types

REFERENCE = "/root/reference"


def install_stubs():
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv_f.normalize = lambda t, mean, std, inplace=False: (
            (t - torch.tensor(mean).view(-1, 1, 1))
            / torch.tensor(std).view(-1, 1, 1))
        tv.transforms = tv_t
        tv_t.functional = tv_f
        tv_d = types.ModuleType("torchvision.datasets")
        tv_du = types.ModuleType("torchvision.datasets.utils")
        tv_du.download_url = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("offline"))
        tv_du.check_integrity = lambda *a, **k: False
        tv_d.utils = tv_du
        tv.datasets = tv_d
        tv_u = types.ModuleType("torchvision.utils")
        tv_u.make_grid = lambda t, *a, **k: t
        tv.utils = tv_u
        tv_m = types.ModuleType("torchvision.models")
        tv_mu = types.ModuleType("torchvision.models.utils")
        tv_mu.load_state_dict_from_url = lambda *a, **k: {}
        tv_m.utils = tv_mu
        tv.models = tv_m
        for name, mod in [
            ("torchvision", tv),
            ("torchvision.transforms", tv_t),
            ("torchvision.transforms.functional", tv_f),
            ("torchvision.datasets", tv_d),
            ("torchvision.datasets.utils", tv_du),
            ("torchvision.utils", tv_u),
            ("torchvision.models", tv_m),
            ("torchvision.models.utils", tv_mu),
        ]:
            sys.modules[name] = mod

    # offline: pretrained=True is hard-coded in the reference
    # (weathernet.py:41); strict=False makes {} a clean no-op
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}

    if not torch.cuda.is_available():
        class _NoOpCudaDevice:
            def __init__(self, *a, **k):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        torch.cuda.device = _NoOpCudaDevice


def pin_dataloader_determinism():
    """Force num_workers=0 / shuffle=False on every DataLoader the reference
    constructs, so all augmentation draws come from the main process's seeded
    global np.random stream in list order."""
    import torch.utils.data as tud

    real = tud.DataLoader

    class PinnedDataLoader(real):  # type: ignore[misc, valid-type]
        def __init__(self, *args, **kwargs):
            kwargs["num_workers"] = 0
            kwargs["shuffle"] = False
            super().__init__(*args, **kwargs)

    tud.DataLoader = PinnedDataLoader
    # the reference binds `from torch.utils import data` then data.DataLoader
    sys.modules["torch.utils.data"].DataLoader = PinnedDataLoader


def make_init(out: str, torch_seed: int, backbone: str) -> None:
    install_stubs()
    sys.path.insert(0, REFERENCE)
    import torch

    import network.classifier as ref_clf
    import network.weathernet as ref_wn
    import utils.loss as ref_loss

    torch.manual_seed(torch_seed)
    opts = types.SimpleNamespace(deeplab=False)
    model = ref_wn.WeatherNet(opts, num_classes=19, backbone=backbone,
                              train_semantic=True)
    # the SupCon projection and the weather classifier live OUTSIDE
    # model_state in the reference (utils/loss.py:104-109 inside the
    # criterion; init_trainer.py:112 as a separate module) — both are frozen
    # random-init heads, so the A/B must pin them to shared weights too
    # (pin_shared_heads below loads these on the reference side; our
    # load_pretrained maps them into the in-model heads)
    supcon = ref_loss.SupConLoss(temperature=0.07, contrast_mode="all",
                                 base_temperature=0.07, weight=None,
                                 device="cpu", opts=opts)
    wclf = ref_clf.WeatherClassifier(opts, weather_class_num=4)
    torch.save({"model_state": model.state_dict(),
                "supcon_projection": supcon.projection.state_dict(),
                "weather_clf": wclf.state_dict()}, out)
    print(f"saved init checkpoint ({sum(p.numel() for p in model.parameters())}"
          f" params + shared supcon/weather heads) to {out}")


def perturb_init(src: str, out: str, eps: float, seed: int) -> None:
    """Copy a make-init checkpoint with ~eps relative fp32 noise added to
    every model_state tensor (shared frozen heads untouched). Running the
    REFERENCE itself from src vs out measures the chaos floor of the A/B
    regime — how far two runs of the *same program* drift when their
    parameters differ by backend-noise scale — which calibrates the gates
    applied to the cross-framework comparison."""
    import torch

    blob = torch.load(src, map_location="cpu", weights_only=False)
    g = torch.Generator().manual_seed(seed)
    sd = blob["model_state"]
    for k, v in sd.items():
        if torch.is_floating_point(v):
            scale = v.detach().abs().mean().clamp_min(1e-3)
            sd[k] = v + eps * scale * torch.randn(v.shape, generator=g)
    torch.save(blob, out)
    print(f"saved eps={eps} perturbed copy of {src} to {out}")


def pin_shared_heads(ckpt_path: str) -> None:
    """Load the shared frozen heads saved by make-init into every
    SupConLoss / WeatherClassifier the reference constructs (weights-only
    intervention; the computation is untouched)."""
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    proj_sd = blob.get("supcon_projection")
    wclf_sd = blob.get("weather_clf")
    if proj_sd is None and wclf_sd is None:
        return

    import network.classifier as ref_clf
    import utils.loss as ref_loss

    if proj_sd is not None:
        orig_supcon = ref_loss.SupConLoss.__init__

        def supcon_init(self, *a, **k):
            orig_supcon(self, *a, **k)
            self.projection.load_state_dict(proj_sd)

        ref_loss.SupConLoss.__init__ = supcon_init
    if wclf_sd is not None:
        orig_wc = ref_clf.WeatherClassifier.__init__

        def wc_init(self, *a, **k):
            orig_wc(self, *a, **k)
            self.load_state_dict(wclf_sd)

        ref_clf.WeatherClassifier.__init__ = wc_init


def pin_randperm_identity():
    """AB_PIN_RANDPERM=1: pin ``torch.randperm`` to the identity permutation.
    The reference's PixelContrastLoss draws hard/easy anchors with
    ``torch.randperm`` (``utils/loss.py:327-329``) — a backend-private RNG no
    JAX program can replay. Identity pinning keeps the reference's own
    selection RULES (hard/easy split, count thresholds, raster-ordered
    nonzero lists) and makes the pick the FIRST indices of each list, which
    our ``--reference_rng`` pixel-contrast sampler reproduces exactly
    (losses/pixel_contrast.py deterministic_select). Shuffling is already
    disabled, so no other reference code path consumes randperm."""
    import torch

    real_arange = torch.arange

    def identity_perm(n, *a, **k):
        k.pop("generator", None)
        return real_arange(n, **{kk: vv for kk, vv in k.items()
                                 if kk in ("dtype", "device")})

    torch.randperm = identity_perm


def train(argv) -> None:
    import os

    install_stubs()
    pin_dataloader_determinism()
    if os.environ.get("AB_PIN_RANDPERM") == "1":
        pin_randperm_identity()
    sys.path.insert(0, REFERENCE)
    argv = list(argv)
    if "--resume" in argv:
        pin_shared_heads(argv[argv.index("--resume") + 1])
    import runpy

    sys.argv = ["main.py"] + argv
    runpy.run_path(f"{REFERENCE}/main.py", run_name="__main__")


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)
    mi = sub.add_parser("make-init")
    mi.add_argument("--out", required=True)
    mi.add_argument("--torch-seed", type=int, default=123)
    mi.add_argument("--backbone", default="resnet18")
    pe = sub.add_parser("perturb-init")
    pe.add_argument("--src", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--eps", type=float, default=1e-6)
    pe.add_argument("--seed", type=int, default=999)
    tr = sub.add_parser("train")
    tr.add_argument("argv", nargs=argparse.REMAINDER)
    args = p.parse_args()
    if args.mode == "make-init":
        make_init(args.out, args.torch_seed, args.backbone)
    elif args.mode == "perturb-init":
        perturb_init(args.src, args.out, args.eps, args.seed)
    else:
        argv = args.argv
        if argv and argv[0] == "--":
            argv = argv[1:]
        train(argv)


if __name__ == "__main__":
    main()
