"""Cityscapes dataset (also serves kitti_2015 / kitti_mix / sceneflow lists).

Re-implementation of reference ``dataloaders/datasets/cityscapes.py:15-217``:
stereo-format file lists ``left right [disp] [label]``; shares the Cityscapes
label tables with ACDC. ALL disparity PNGs decode as the KITTI 16-bit v/256
convention — the reference applies ``_read_kitti_disp`` to every .png
(``utils/file_io.py:110-113``), including Cityscapes frames whose official
cityscapesScripts encoding is (v-1)/256 with v==0 invalid; we reproduce the
reference's uniform v/256 for parity (a constant +1/256 px bias on
Cityscapes gt that its recorded numbers already bake in).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image

from .acdc import ACDC, read_text_lines

LIST_FILES = {
    "cityscapes": "filenames/cityscapes/cityscapes_semantic_{mode}.txt",
    "kitti_2015": "filenames/kitti_2015/KITTI_2015_{mode}.txt",
    "kitti_mix": "filenames/kitti_mix/KITTI_MIX_{mode}.txt",
    "sceneflow": "filenames/sceneflow/SceneFlow_finalpass_{mode}.txt",
}


def read_disp(path: str) -> np.ndarray:
    """Disparity loader (reference ``utils/file_io.py:18-37``): .pfm
    (SceneFlow), 16-bit .png (KITTI), .npy."""
    if path.endswith(".pfm"):
        return _read_pfm(path)
    if path.endswith(".png"):
        arr = np.array(Image.open(path)).astype(np.float32)
        return arr / 256.0
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    raise ValueError(f"invalid disparity file: {path}")


def _read_pfm(path: str) -> np.ndarray:
    """Minimal PFM reader (format spec: header PF/Pf, dims, scale/endianness)."""
    with open(path, "rb") as f:
        header = f.readline().decode("ascii").strip()
        if header not in ("PF", "Pf"):
            raise ValueError("not a PFM file")
        color = header == "PF"
        dims = f.readline().decode("ascii").split()
        width, height = int(dims[0]), int(dims[1])
        scale = float(f.readline().decode("ascii").strip())
        dtype = "<f" if scale < 0 else ">f"
        data = np.frombuffer(f.read(), dtype=dtype)
        shape = (height, width, 3) if color else (height, width)
        img = data.reshape(shape)
        return np.flipud(img).astype(np.float32).copy()


class Cityscapes:
    ignore_index = 255
    weather_dict = {"sunny": 4}
    encode_target = ACDC.encode_target
    decode_target = ACDC.decode_target
    convert_color_to_eval_id = ACDC.convert_color_to_eval_id

    def __init__(self, root: str, dataset_name: str = "cityscapes", mode: str = "train",
                 transform: Optional[Callable] = None, opts=None,
                 filelist_root: str = "filenames",
                 load_disp: Optional[bool] = None):
        self.root = root
        self.mode = mode
        self.transform = transform
        self.dataset_name = dataset_name
        self.opts = opts
        # cityscapes lists carry a disparity column, but the semantic trainer
        # (the only CLI route for dataset=cityscapes) never consumes it —
        # decoding the 2048×1024 16-bit PNG per sample and shipping ~8 MB/
        # sample to the device as a dead jit argument is pure waste. Stereo
        # datasets (and the stereo trainer, which passes load_disp=True)
        # keep it.
        self.load_disp = (dataset_name != "cityscapes") if load_disp is None \
            else load_disp
        rel = LIST_FILES[dataset_name].format(mode=mode).split("/", 1)[1]
        list_path = os.path.join(filelist_root, rel)

        self.samples: List[Dict] = []
        for line in read_text_lines(list_path):
            parts = line.split()
            left_img, right_img = parts[:2]
            gt_disp = parts[2] if len(parts) > 2 else None
            gt_label = parts[3] if len(parts) > 3 else None
            self.samples.append({
                "left": os.path.join(root, left_img),
                "right": os.path.join(root, right_img),
                "left_name": left_img.split("/", 1)[-1],
                "frame_name": os.path.basename(left_img),
                "disp": os.path.join(root, gt_disp) if gt_disp else None,
                "label": os.path.join(root, gt_label) if gt_label else None,
            })

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        rec = self.samples[index]
        sample: Dict = {
            "left": Image.open(rec["left"]).convert("RGB"),
            "left_name": rec["left_name"],
            "frame_name": rec["frame_name"],
        }
        if rec["right"] is not None and os.path.exists(rec["right"]):
            sample["right"] = Image.open(rec["right"]).convert("RGB")
        if rec["disp"] is not None and self.load_disp:
            sample["disp"] = Image.fromarray(read_disp(rec["disp"]))
        if rec["label"] is not None:
            enc = self.encode_target(Image.open(rec["label"]))
            sample["label"] = Image.fromarray(enc.astype("uint8"))
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
