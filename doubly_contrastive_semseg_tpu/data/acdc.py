"""ACDC adverse-weather dataset (fog / night / rain / snow).

Re-implementation of reference ``dataloaders/datasets/acdc.py:15-280``:
file-list driven (``filenames/acdc/acdc_{train,val,test}.txt``, line format
``rgb_path weather gt_labelIds_path``), Cityscapes 34-class id → train-id
encoding, color palettes, weather-condition filtering, ``--debug`` small
splits. The label tables are the standard public Cityscapes constants
(mcordts/cityscapesScripts).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image

WEATHER_DICT = {"fog": 0, "night": 1, "rain": 2, "snow": 3}
WEATHER_DICT_WITH_SUNNY = {**WEATHER_DICT, "sunny": 4}

# Cityscapes label table: (id, train_id, color) for ids 0..33 (+license plate -1)
_CITYSCAPES_LABELS = [
    (0, 255, (0, 0, 0)), (1, 255, (0, 0, 0)), (2, 255, (0, 0, 0)),
    (3, 255, (0, 0, 0)), (4, 255, (0, 0, 0)), (5, 255, (111, 74, 0)),
    (6, 255, (81, 0, 81)), (7, 0, (128, 64, 128)), (8, 1, (244, 35, 232)),
    (9, 255, (250, 170, 160)), (10, 255, (230, 150, 140)), (11, 2, (70, 70, 70)),
    (12, 3, (102, 102, 156)), (13, 4, (190, 153, 153)), (14, 255, (180, 165, 180)),
    (15, 255, (150, 100, 100)), (16, 255, (150, 120, 90)), (17, 5, (153, 153, 153)),
    (18, 255, (153, 153, 153)), (19, 6, (250, 170, 30)), (20, 7, (220, 220, 0)),
    (21, 8, (107, 142, 35)), (22, 9, (152, 251, 152)), (23, 10, (70, 130, 180)),
    (24, 11, (220, 20, 60)), (25, 12, (255, 0, 0)), (26, 13, (0, 0, 142)),
    (27, 14, (0, 0, 70)), (28, 15, (0, 60, 100)), (29, 255, (0, 0, 90)),
    (30, 255, (0, 0, 110)), (31, 16, (0, 80, 100)), (32, 17, (0, 0, 230)),
    (33, 18, (119, 11, 32)),
]

CITYSCAPES_ID_TO_TRAIN_ID = np.array(
    [t for (_, t, _) in _CITYSCAPES_LABELS] + [255], dtype=np.uint8
)  # index 34 catches the license-plate id (-1 → uint8 wrap handled by caller)

TRAIN_ID_TO_COLOR = np.array(
    [c for (_, t, c) in _CITYSCAPES_LABELS if t not in (255,)] + [(0, 0, 0)],
    dtype=np.uint8,
)  # 19 classes + black for ignore/void

# Last-wins on duplicate colors, like the reference's dict comprehension
# (acdc.py:72): pole (153,153,153) resolves to polegroup's 255 on both sides.
# ONE deliberate deviation: the reference's table ends with the license-plate
# row sharing car's (0,0,142), so its saved gray_pred_sem dumps
# (trainer.py:549-560) turn every predicted CAR pixel into ignore-255; our
# table has no license-plate row, so car correctly maps to 13.
COLOR_TO_EVAL_ID = {c: t for (_, t, c) in _CITYSCAPES_LABELS}


def read_text_lines(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


class ACDC:
    """Sample dicts: ``left`` (PIL RGB), ``label`` (PIL 'L' of train ids),
    ``weather`` (int), ``left_name``, ``frame_name``."""

    ignore_index = 255
    weather_dict = WEATHER_DICT

    def __init__(self, root: str, dataset_name: str = "acdc", mode: str = "train",
                 transform: Optional[Callable] = None, opts=None,
                 filelist_root: str = "filenames"):
        self.root = root
        self.mode = mode
        self.transform = transform
        self.opts = opts
        debug = bool(getattr(opts, "debug", False))
        suffix = "_small" if debug else ""
        list_path = os.path.join(filelist_root, "acdc", f"acdc_{mode}{suffix}.txt")
        if not os.path.isfile(list_path) and debug:
            list_path = os.path.join(filelist_root, "acdc", f"acdc_{mode}.txt")

        weather_condition = getattr(opts, "weather_condition", None)
        self.samples: List[Dict] = []
        for line in read_text_lines(list_path):
            parts = line.split()
            left_img, gt_weather = parts[0], parts[1]
            gt_label = parts[2] if len(parts) > 2 else None
            if weather_condition is not None and gt_weather != weather_condition:
                continue
            self.samples.append({
                "left": os.path.join(root, left_img),
                "left_name": left_img.split("/", 1)[-1],
                "frame_name": os.path.basename(left_img).replace("_rgb_anon", "*"),
                "weather": self.weather_dict[gt_weather],
                "label": os.path.join(root, gt_label) if gt_label else None,
            })

    # -------------------------------------------------- label id conversions
    @classmethod
    def encode_target(cls, target) -> np.ndarray:
        """gt labelIds png → train ids (reference ``acdc.py:166-168``)."""
        arr = np.array(target).astype(np.uint8)
        arr = np.minimum(arr, len(CITYSCAPES_ID_TO_TRAIN_ID) - 1)
        return CITYSCAPES_ID_TO_TRAIN_ID[arr]

    @classmethod
    def decode_target(cls, target) -> np.ndarray:
        """train ids → RGB (reference ``acdc.py:170-174``)."""
        target = np.array(target).copy()
        target[target == 255] = 19
        return TRAIN_ID_TO_COLOR[target]

    @classmethod
    def convert_color_to_eval_id(cls, pixel_rgb) -> int:
        tid = COLOR_TO_EVAL_ID[tuple(pixel_rgb)]
        return 255 if tid == 19 else tid

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        rec = self.samples[index]
        sample: Dict = {
            "left": Image.open(rec["left"]).convert("RGB"),
            "left_name": rec["left_name"],
            "frame_name": rec["frame_name"],
            "weather": np.array([rec["weather"]]),
        }
        if rec["label"] is not None:
            enc = self.encode_target(Image.open(rec["label"]))
            sample["label"] = Image.fromarray(enc.astype("uint8"))
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
