"""Synthetic in-memory dataset with the same sample contract as ACDC.

No reference counterpart — this backs `--dataset synthetic` so the entire
train/validate path (including the EDT transform) can run end-to-end in CI
and smoke tests without ACDC on disk. Images are blocky random class layouts
rendered to RGB so segmentation losses have learnable structure.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
from PIL import Image

from .acdc import TRAIN_ID_TO_COLOR, WEATHER_DICT


class SyntheticStereoDataset:
    """Random stereo pairs with exact ground-truth disparity: the right view
    is the left view shifted by a per-image constant disparity (plus noise),
    giving the stereo stack a learnable, verifiable target."""

    def __init__(self, size: int = 8, image_hw=(64, 96), max_disp: int = 16,
                 seed: int = 0):
        self.size = size
        self.image_hw = image_hw
        self.max_disp = max_disp
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng(self.seed * 9176 + index)
        h, w = self.image_hw
        left = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        # smooth the texture so bilinear matching is well-posed
        k = np.ones((1, 5, 1)) / 5.0
        for _ in range(2):
            left = np.apply_along_axis(
                lambda v: np.convolve(v, np.ones(5) / 5, mode="same"), 1, left)
        d = float(rng.integers(2, self.max_disp - 2))
        right = np.zeros_like(left)
        right[:, : w - int(d)] = left[:, int(d):]
        disp = np.full((h, w), d, np.float32)
        disp[:, : int(d)] = 0.0  # invalid at the left border
        return {
            "left": left,
            "right": right,
            "disp": disp,
            "label": rng.integers(0, 19, (h, w)).astype(np.int64),
            "left_name": f"stereo/{index}",
            "frame_name": f"{index}",
        }


class SyntheticDataset:
    ignore_index = 255
    weather_dict = WEATHER_DICT

    def __init__(self, size: int = 16, image_hw=(128, 128), num_classes: int = 19,
                 weather_num: int = 4, transform: Optional[Callable] = None,
                 seed: int = 0, mode: str = "train", opts=None):
        self.size = size
        self.image_hw = image_hw
        self.num_classes = num_classes
        self.weather_num = weather_num
        self.transform = transform
        self.seed = seed
        self.mode = mode

    @classmethod
    def decode_target(cls, target):
        target = np.array(target).copy()
        target[target == 255] = 19
        return TRAIN_ID_TO_COLOR[target]

    def __len__(self) -> int:
        return self.size

    _MAX_UNIQUE = 64  # distinct generated frames; beyond this, reuse (the
    # generator is benchmark infrastructure, not a learning target — large
    # --synthetic_size runs must measure device throughput, not numpy RNG)

    def _frame(self, index: int):
        key = index % self._MAX_UNIQUE
        cached = getattr(self, "_frame_cache", None)
        if cached is None:
            cached = self._frame_cache = {}
        if key in cached:
            return cached[key]
        rng = np.random.default_rng(self.seed * 100003 + key)
        h, w = self.image_hw
        # blocky label layout: a few random rectangles of random classes
        label = np.full((h, w), rng.integers(0, self.num_classes), np.uint8)
        for _ in range(6):
            c = int(rng.integers(0, self.num_classes))
            y0, x0 = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
            y1, x1 = int(rng.integers(y0 + 4, h)), int(rng.integers(x0 + 4, w))
            label[y0:y1, x0:x1] = c
        # a small ignore patch
        label[: h // 8, : w // 8] = 255
        color = self.decode_target(label).astype(np.float32)
        noise = rng.normal(0, 12, color.shape)
        img = np.clip(color + noise, 0, 255).astype(np.uint8)
        cached[key] = (img, label)
        return img, label

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng(self.seed * 100003 + index)
        img, label = self._frame(index)

        sample: Dict = {
            "left": Image.fromarray(img),
            "label": Image.fromarray(label),
            "weather": np.array([int(rng.integers(0, self.weather_num))]),
            "left_name": f"synthetic/{index}.png",
            "frame_name": f"{index}*",
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
