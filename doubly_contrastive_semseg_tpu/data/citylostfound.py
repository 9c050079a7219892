"""Cityscapes + Lost&Found datasets (reference
``dataloaders/datasets/citylostfound.py`` (223 LoC) and ``lostfound.py``
(195 LoC)): 19 Cityscapes classes + class 19 'small obstacles'. Lost&Found
label maps arrive with obstacle ids that must be relabeled into train id 19;
Cityscapes frames use the standard id→train-id table."""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image

from .acdc import CITYSCAPES_ID_TO_TRAIN_ID, TRAIN_ID_TO_COLOR, read_text_lines

# 20-class palette: cityscapes colors + magenta obstacles
TRAIN_ID_TO_COLOR_CLF = np.concatenate(
    [TRAIN_ID_TO_COLOR[:19], np.array([[255, 0, 255], [0, 0, 0]], np.uint8)], axis=0)


def _encode_lostfound(target: np.ndarray) -> np.ndarray:
    """Lost&Found gtCoarse labelIds: 0=out-of-roi/void, 1=road, ≥2=obstacles
    (reference ``lostfound.py`` relabeling)."""
    out = np.full(target.shape, 255, np.uint8)
    out[target == 1] = 0            # road train id
    out[target >= 2] = 19           # small obstacle class
    return out


class LostFound:
    ignore_index = 255
    weather_dict = {"sunny": 4}

    def __init__(self, root: str, dataset_name: str = "city_lost", mode: str = "train",
                 transform: Optional[Callable] = None, opts=None,
                 filelist_root: str = "filenames"):
        self.root = root
        self.transform = transform
        list_path = os.path.join(filelist_root, "city_lost", f"lostfound_{mode}.txt")
        self.samples: List[Dict] = []
        if os.path.isfile(list_path):
            for line in read_text_lines(list_path):
                parts = line.split()
                self.samples.append({
                    "left": os.path.join(root, parts[0]),
                    "left_name": parts[0].split("/", 1)[-1],
                    "frame_name": os.path.basename(parts[0]),
                    "label": os.path.join(root, parts[-1]) if len(parts) > 1 else None,
                    "kind": "lostfound",
                })

    @classmethod
    def decode_target(cls, target):
        target = np.array(target).copy()
        target[target == 255] = 20
        return TRAIN_ID_TO_COLOR_CLF[target]

    def __len__(self):
        return len(self.samples)

    def _load(self, rec: Dict) -> Dict:
        sample: Dict = {
            "left": Image.open(rec["left"]).convert("RGB"),
            "left_name": rec["left_name"],
            "frame_name": rec["frame_name"],
        }
        if rec["label"]:
            raw = np.array(Image.open(rec["label"]))
            if rec["kind"] == "lostfound":
                enc = _encode_lostfound(raw)
            else:
                enc = CITYSCAPES_ID_TO_TRAIN_ID[
                    np.minimum(raw.astype(np.uint8), len(CITYSCAPES_ID_TO_TRAIN_ID) - 1)]
            sample["label"] = Image.fromarray(enc.astype("uint8"))
        return sample

    def __getitem__(self, index: int):
        sample = self._load(self.samples[index])
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class CityLostFound(LostFound):
    """Mixed Cityscapes + Lost&Found (reference ``citylostfound.py``):
    cityscapes samples keep 19 classes (obstacle class never appears),
    lost&found contributes road/obstacle/void."""

    def __init__(self, root: str, dataset_name: str = "city_lost", mode: str = "train",
                 transform: Optional[Callable] = None, opts=None,
                 filelist_root: str = "filenames"):
        super().__init__(root, dataset_name, mode, transform, opts, filelist_root)
        city_list = os.path.join(filelist_root, "cityscapes",
                                 f"cityscapes_semantic_{mode}.txt")
        city_root = root.replace("city_lost", "cityscapes")
        if os.path.isfile(city_list):
            for line in read_text_lines(city_list):
                parts = line.split()
                self.samples.append({
                    "left": os.path.join(city_root, parts[0]),
                    "left_name": parts[0].split("/", 1)[-1],
                    "frame_name": os.path.basename(parts[0]),
                    "label": os.path.join(city_root, parts[3]) if len(parts) > 3 else None,
                    "kind": "cityscapes",
                })
