"""Stereo-pair transform suite (host side, numpy/PIL).

Re-implementation of the reference's RODSNet-era stereo machinery:

- ``dataloaders/transforms.py:9-258`` — the numpy stereo-pair photometric
  suite: RandomContrast / RandomGamma / RandomBrightness / RandomHue /
  RandomSaturation (each draw applied to BOTH eyes), the RandomColor
  driver (single transform or shuffled combination), pad-or-crop
  ``RandomCrop`` and stereo ``RandomVerticalFlip``. Never imported by the
  reference's active path (legacy), re-implemented for inventory
  completeness and exercised by the stereo trainer's optional pipeline.
- ``dataloaders/custom_transforms.py:497-590`` — ``RandomCrop2``, the
  PIL-keyed variant whose only semantic difference is padding labels with
  the ignore id (255) instead of 0 (the ``label_pad`` argument here).
- ``dataloaders/custom_transforms.py:1664-1695`` — ``LabelDistanceTransform``
  (binned-alpha EDT weights, ``cv2.distanceTransform`` maskSize=5), the
  fork's alternative to the exp-weighted ``LabelBoundaryTransform``.

The photometric adjustments reproduce torchvision's PIL backend exactly:
``F.adjust_{brightness,contrast,saturation}`` are ``PIL.ImageEnhance``
calls, ``adjust_hue`` is the uint8 HSV-rotate round trip, ``adjust_gamma``
the truncating 256-entry LUT. All randomness flows through an injectable
``numpy.random.Generator`` (the reference uses the global ``np.random`` /
``random`` state).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
from PIL import Image, ImageEnhance

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in the image
    cv2 = None

_EYES = ("left", "right")


# ---------------------------------------------------------------- functional
def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Color(img).enhance(factor)


def adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    """torchvision PIL backend: rotate the H channel of the uint8 HSV image
    by ``hue_factor * 255`` with wraparound."""
    if not -0.5 <= hue_factor <= 0.5:
        raise ValueError(f"hue_factor {hue_factor} not in [-0.5, 0.5]")
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    # NumPy 2.x raises OverflowError converting a negative python int to
    # uint8, so wrap the shift explicitly (uint8 addition wraps mod 256,
    # matching torchvision's intended hue rotation)
    np_h += np.uint8(int(hue_factor * 255) % 256)
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert(img.mode)


def adjust_gamma(img: Image.Image, gamma: float,
                 gain: float = 1.0) -> Image.Image:
    """torchvision PIL backend: per-channel 256-entry LUT
    ``255 · gain · (x/255)^γ`` applied with PIL's truncating ``point``."""
    if gamma < 0:
        raise ValueError("gamma must be non-negative")
    lut = [int(255 * gain * ((ele / 255.0) ** gamma)) for ele in range(256)]
    return img.point(lut * len(img.getbands()))


# ------------------------------------------------------------- pair plumbing
class StereoToPIL:
    """``ToPILImage`` (reference ``transforms.py:154-160``): float arrays →
    uint8 PIL for the photometric stage."""

    def __call__(self, sample: Dict) -> Dict:
        for k in _EYES:
            if not isinstance(sample[k], Image.Image):
                sample[k] = Image.fromarray(np.asarray(sample[k]).astype("uint8"))
        return sample


class StereoToNumpy:
    """``ToNumpyArray`` (reference ``transforms.py:163-168``)."""

    def __call__(self, sample: Dict) -> Dict:
        for k in _EYES:
            sample[k] = np.array(sample[k]).astype(np.float32)
        return sample


# ------------------------------------------------------------- geometric
class StereoRandomCrop:
    """Pad-or-crop to (img_height, img_width) over every stereo key
    (reference ``transforms.py:63-133`` / fork ``RandomCrop2``): smaller
    inputs are padded TOP and RIGHT with zeros (labels with ``label_pad``),
    larger ones take a shared random crop (center crop when
    ``validate=True``)."""

    def __init__(self, img_height: int, img_width: int, validate: bool = False,
                 label_pad: int = 0,
                 rng: Optional[np.random.Generator] = None):
        self.img_height = img_height
        self.img_width = img_width
        self.validate = validate
        self.label_pad = label_pad
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Dict) -> Dict:
        keys_img = [k for k in _EYES if k in sample]
        keys_flat = [k for k in ("disp", "pseudo_disp", "label") if k in sample]
        for k in keys_img + keys_flat:
            sample[k] = np.asarray(sample[k])
        oh, ow = sample["left"].shape[:2]
        if self.img_height > oh or self.img_width > ow:
            tp, rp = self.img_height - oh, self.img_width - ow
            if tp < 0 or rp < 0:
                # the reference's RandomCrop (transforms.py:63-133) has the
                # same all-pad-or-all-crop constraint (its asserts fire on
                # mixed cases); surface it as a clear error rather than a
                # bare AssertionError
                raise ValueError(
                    f"StereoRandomCrop target ({self.img_height}, "
                    f"{self.img_width}) mixes pad and crop against input "
                    f"({oh}, {ow}); pad-one-axis/crop-the-other is not "
                    "supported (reference parity)")
            for k in keys_img:
                sample[k] = np.pad(sample[k], ((tp, 0), (0, rp), (0, 0)))
            for k in keys_flat:
                fill = self.label_pad if k == "label" else 0
                sample[k] = np.pad(sample[k], ((tp, 0), (0, rp)),
                                   constant_values=fill)
            return sample
        if self.validate:
            ox = (ow - self.img_width) // 2
            oy = (oh - self.img_height) // 2
        else:
            ox = int(self.rng.integers(0, ow - self.img_width + 1))
            oy = int(self.rng.integers(0, oh - self.img_height + 1))
        for k in keys_img + keys_flat:
            sample[k] = sample[k][oy:oy + self.img_height,
                                  ox:ox + self.img_width]
        return sample


class StereoRandomVerticalFlip:
    """Flip both eyes + disparity + label together with p=0.5 (reference
    ``transforms.py:136-151``; disparity values are unchanged — vertical
    flips preserve horizontal disparity)."""

    def __init__(self, p: float = 0.5, rng: Optional[np.random.Generator] = None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() < self.p:
            for k in ("left", "right", "disp", "label", "pseudo_disp"):
                if k in sample:
                    sample[k] = np.copy(np.flipud(np.asarray(sample[k])))
        return sample


# ------------------------------------------------------------- photometric
class _PairPhotometric:
    """One draw, both eyes (reference ``transforms.py:173-231``)."""

    p: float = 0.5

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def _apply(self, img: Image.Image, draw: float) -> Image.Image:
        raise NotImplementedError

    def _draw(self) -> float:
        raise NotImplementedError

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() < self.p:
            draw = self._draw()
            for k in _EYES:
                sample[k] = self._apply(sample[k], draw)
        return sample


class RandomContrast(_PairPhotometric):
    def _draw(self):
        return float(self.rng.uniform(0.8, 1.2))

    def _apply(self, img, f):
        return adjust_contrast(img, f)


class RandomGamma(_PairPhotometric):
    def _draw(self):
        return float(self.rng.uniform(0.7, 1.5))  # adopted from FlowNet

    def _apply(self, img, f):
        return adjust_gamma(img, f)


class RandomBrightness(_PairPhotometric):
    def _draw(self):
        return float(self.rng.uniform(0.5, 2.0))

    def _apply(self, img, f):
        return adjust_brightness(img, f)


class RandomHue(_PairPhotometric):
    def _draw(self):
        return float(self.rng.uniform(-0.1, 0.1))

    def _apply(self, img, f):
        return adjust_hue(img, f)


class RandomSaturation(_PairPhotometric):
    def _draw(self):
        return float(self.rng.uniform(0.8, 1.2))

    def _apply(self, img, f):
        return adjust_saturation(img, f)


class RandomColor:
    """Reference ``transforms.py:234-258``: with p=0.5 apply ONE random
    photometric transform, otherwise all five in shuffled order; operates on
    PIL and hands back float numpy arrays."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Dict) -> Dict:
        transforms = [RandomContrast(self.rng), RandomGamma(self.rng),
                      RandomBrightness(self.rng), RandomHue(self.rng),
                      RandomSaturation(self.rng)]
        sample = StereoToPIL()(sample)
        if self.rng.random() < 0.5:
            t = transforms[int(self.rng.integers(0, len(transforms)))]
            sample = t(sample)
        else:
            order = list(self.rng.permutation(len(transforms)))
            for i in order:
                sample = transforms[int(i)](sample)
        return StereoToNumpy()(sample)


# ------------------------------------------------------------- label weights
class LabelDistanceTransform:
    """Binned-alpha EDT weighting (fork ``custom_transforms.py:1664-1695``):
    per-class ``cv2.distanceTransform`` (L2, maskSize=5), summed when
    ``reduce=True`` and bucketed into per-bin alphas, zero at ignore.
    The active pipeline uses the exp-weighted ``LabelBoundaryTransform``;
    this is the fork's alternative weighting."""

    def __init__(self, num_classes: int, bins: Sequence[int] = (4, 16, 64, 128),
                 alphas: Sequence[float] = (8.0, 6.0, 4.0, 2.0, 1.0),
                 reduce: bool = False, ignore_id: int = 255):
        self.num_classes = num_classes
        self.bins = bins
        self.alphas = alphas
        self.reduce = reduce
        self.ignore_id = ignore_id

    def __call__(self, example: Dict) -> Dict:
        labels = np.array(example["label"])
        present = np.unique(labels)
        distances = np.zeros([self.num_classes] + list(labels.shape),
                             np.float32) - 1.0
        for i in range(self.num_classes):
            if i not in present:
                continue
            mask = labels == i
            distances[i][mask] = cv2.distanceTransform(
                np.uint8(mask), cv2.DIST_L2, maskSize=5)[mask]
        if self.reduce:
            ignore_mask = labels == self.ignore_id
            distances[distances < 0] = 0
            dist = distances.sum(axis=0)
            bins_idx = np.digitize(dist, self.bins)
            alphas = np.zeros(bins_idx.shape, np.float32)
            for idx, a in enumerate(self.alphas):
                alphas[bins_idx == idx] = a
            alphas[ignore_mask] = 0
            example["label_distance_alphas"] = alphas
        else:
            example["label_distance_transform"] = distances
        return example
