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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["acdc", "cityscapes"])
    p.add_argument("--root", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    out = args.out or os.path.join("filenames", args.dataset)
    if args.dataset == "acdc":
        generate_acdc(args.root, out)
    else:
        generate_cityscapes(args.root, out)


if __name__ == "__main__":
    main()
