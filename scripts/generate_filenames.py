#!/usr/bin/env python
"""Offline file-list generators (reference ``filenames/*/generate_filenames*.py``,
6 scripts): walk a dataset root and emit the ``filenames/**/*.txt`` manifests
the datasets consume.

ACDC line format:   ``rgb_anon_path weather gt_labelIds_path``
                    (reference ``filenames/acdc/acdc_train.txt``)
Cityscapes format:  ``left right disparity gt_labelIds``
                    (reference ``filenames/cityscapes/cityscapes_semantic_*.txt``)

Usage:
  python scripts/generate_filenames.py acdc --root /data/acdc --out filenames/acdc
  python scripts/generate_filenames.py cityscapes --root /data/cityscapes --out filenames/cityscapes
"""

from __future__ import annotations

import argparse
import os
from typing import List

WEATHERS = ("fog", "night", "rain", "snow")


def generate_acdc(root: str, out_dir: str, small: int = 16) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        lines: List[str] = []
        for weather in WEATHERS:
            rgb_root = os.path.join(root, "rgb_anon_trainvaltest", "rgb_anon",
                                    weather, split)
            if not os.path.isdir(rgb_root):
                continue
            for dirpath, _, files in sorted(os.walk(rgb_root)):
                for f in sorted(files):
                    if not f.endswith("_rgb_anon.png"):
                        continue
                    rgb = os.path.relpath(os.path.join(dirpath, f), root)
                    gt = rgb.replace(
                        "rgb_anon_trainvaltest/rgb_anon", "gt_trainval/gt"
                    ).replace("_rgb_anon.png", "_gt_labelIds.png")
                    if split == "test" or not os.path.isfile(os.path.join(root, gt)):
                        lines.append(f"{rgb} {weather}")
                    else:
                        lines.append(f"{rgb} {weather} {gt}")
        path = os.path.join(out_dir, f"acdc_{split}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        with open(os.path.join(out_dir, f"acdc_{split}_small.txt"), "w") as fh:
            fh.write("\n".join(lines[:small]) + ("\n" if lines else ""))
        print(f"{path}: {len(lines)} entries")


def generate_cityscapes(root: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        lines: List[str] = []
        left_root = os.path.join(root, "leftImg8bit", split)
        if not os.path.isdir(left_root):
            continue
        for dirpath, _, files in sorted(os.walk(left_root)):
            for f in sorted(files):
                if not f.endswith("_leftImg8bit.png"):
                    continue
                left = os.path.relpath(os.path.join(dirpath, f), root)
                right = left.replace("leftImg8bit", "rightImg8bit")
                disp = left.replace("leftImg8bit", "disparity")
                gt = left.replace("leftImg8bit/", "gtFine/").replace(
                    "_leftImg8bit.png", "_gtFine_labelIds.png")
                lines.append(f"{left} {right} {disp} {gt}")
        path = os.path.join(out_dir, f"cityscapes_semantic_{split}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        print(f"{path}: {len(lines)} entries")


def generate_city_lost(root: str, out_dir: str, debug_dir: str = "filenames/debug",
                       small: int = 16) -> None:
    """Cityscapes + Lost&Found mixed stereo lists (``city_lost_{split}.txt``:
    ``left right disparity gt`` lines, ``filenames/city_lost`` — the reference
    loader reads these (``citylostfound.py:100-102``) but the reference repo
    never shipped them or a generator). Lost&Found labels live under
    ``gtCoarse`` with the ``_gtCoarse_labelIds`` suffix; Cityscapes under
    ``gtFine``. Also emits ``lostfound_{split}.txt`` (Lost&Found-only lists
    for the `lostfound` dataset) and a tiny ``debug`` split."""
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(debug_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        mixed: List[str] = []
        lf_only: List[str] = []
        for sub, gt_dir, gt_suffix in (
                ("cityscapes", "gtFine", "_gtFine_labelIds.png"),
                ("lostandfound", "gtCoarse", "_gtCoarse_labelIds.png")):
            left_root = os.path.join(root, sub, "leftImg8bit", split)
            if not os.path.isdir(left_root):
                continue
            for dirpath, _, files in sorted(os.walk(left_root)):
                for f in sorted(files):
                    if not f.endswith("_leftImg8bit.png"):
                        continue
                    left = os.path.relpath(os.path.join(dirpath, f), root)
                    right = left.replace("leftImg8bit", "rightImg8bit")
                    disp = left.replace("leftImg8bit", "disparity")
                    gt = left.replace("leftImg8bit/", gt_dir + "/").replace(
                        "_leftImg8bit.png", gt_suffix)
                    line = f"{left} {right} {disp} {gt}"
                    mixed.append(line)
                    if sub == "lostandfound":
                        lf_only.append(line)
        for name, lines in ((f"city_lost_{split}.txt", mixed),
                            (f"lostfound_{split}.txt", lf_only)):
            path = os.path.join(out_dir, name)
            with open(path, "w") as fh:
                fh.write("\n".join(lines) + ("\n" if lines else ""))
            print(f"{path}: {len(lines)} entries")
        if split == "train":
            with open(os.path.join(debug_dir, "city_lost_train_debug.txt"), "w") as fh:
                fh.write("\n".join(mixed[:small]) + ("\n" if mixed else ""))


def generate_acdc_city(acdc_root: str, city_root: str, out_dir: str,
                       small: int = 16) -> None:
    """ACDC + Cityscapes mixed lists (``acdc_city_{split}.txt``): ACDC lines
    (``rgb weather gt``) followed by Cityscapes lines with weather ``sunny``
    (reference ``filenames/acdc_city/*``; those ship absolute paths — here
    they are absolute against the two roots given, same consumer behavior)."""
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        lines: List[str] = []
        for weather in WEATHERS:
            rgb_root = os.path.join(acdc_root, "rgb_anon_trainvaltest",
                                    "rgb_anon", weather, split)
            for dirpath, _, files in sorted(os.walk(rgb_root)) if os.path.isdir(rgb_root) else []:
                for f in sorted(files):
                    if not f.endswith("_rgb_anon.png"):
                        continue
                    rgb = os.path.join(dirpath, f)
                    gt = rgb.replace(
                        "rgb_anon_trainvaltest/rgb_anon", "gt_trainval/gt"
                    ).replace("_rgb_anon.png", "_gt_labelIds.png")
                    lines.append(f"{rgb} {weather} {gt}" if os.path.isfile(gt)
                                 else f"{rgb} {weather}")
        left_root = os.path.join(city_root, "leftImg8bit", split)
        if os.path.isdir(left_root):
            for dirpath, _, files in sorted(os.walk(left_root)):
                for f in sorted(files):
                    if not f.endswith("_leftImg8bit.png"):
                        continue
                    left = os.path.join(dirpath, f)
                    gt = left.replace("leftImg8bit/", "gtFine/").replace(
                        "_leftImg8bit.png", "_gtFine_labelIds.png")
                    lines.append(f"{left} sunny {gt}" if os.path.isfile(gt)
                                 else f"{left} sunny")
        path = os.path.join(out_dir, f"acdc_city_{split}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        with open(os.path.join(out_dir, f"acdc_city_{split}_small.txt"), "w") as fh:
            fh.write("\n".join(lines[:small]) + ("\n" if lines else ""))
        print(f"{path}: {len(lines)} entries")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["acdc", "cityscapes", "city_lost", "acdc_city"])
    p.add_argument("--root", default=None)
    p.add_argument("--acdc_root", default=None)
    p.add_argument("--city_root", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    out = args.out or os.path.join("filenames", args.dataset)
    if args.dataset == "acdc":
        generate_acdc(args.root, out)
    elif args.dataset == "cityscapes":
        generate_cityscapes(args.root, out)
    elif args.dataset == "city_lost":
        generate_city_lost(args.root, out)
    else:
        generate_acdc_city(args.acdc_root or args.root, args.city_root, out)


if __name__ == "__main__":
    main()
