"""Host-side augmentation pipeline (dict-sample transforms).

Re-implementation of the reference's ACDC transform suite
(``dataloaders/custom_transforms_acdc.py``) with identical sampling/geometry
semantics, producing NHWC numpy arrays ready for device upload. The genuinely
non-XLA-friendly op — the per-class Euclidean distance transform — runs here
with cv2 exactly as the reference does (``custom_transforms_acdc.py:656-693``);
an on-device jump-flood variant lives in ``ops/edt.py`` for the fused
pipeline. Everything downstream of these transforms is static-shape.
"""

from __future__ import annotations

import random
import threading
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is baked into the image
    cv2 = None

RESAMPLE_IMG = Image.BICUBIC  # reference RESAMPLE for images


class ThreadSafeRng:
    """Lock-protected ``np.random.Generator`` proxy. The threaded DataLoader
    maps ``dataset.__getitem__`` over a worker pool, so the transforms'
    shared generator is drawn from several threads at once — raw Generator
    state mutation is not thread-safe (racing draws can duplicate or corrupt
    the stream). The lock makes every draw atomic; which sample gets which
    draw still depends on worker scheduling, exactly like the torch
    reference's per-worker RNG streams with ``num_workers>0``."""

    def __init__(self, rng: np.random.Generator):
        self._rng = rng
        self._lock = threading.Lock()

    def __getattr__(self, name):
        attr = getattr(self._rng, name)
        if not callable(attr):
            return attr

        def locked(*args, **kwargs):
            with self._lock:
                return attr(*args, **kwargs)

        return locked


class ReferenceRng:
    """Legacy ``np.random`` stream adapter for whole-program A/B parity.

    The reference's train transforms draw from the GLOBAL ``np.random``
    module (``custom_transforms_acdc.py:459-483``: ``np.random.uniform`` then
    two ``np.random.randint``), seeded once by ``seed_all_rng``
    (``utils/logger.py:47``). ``np.random.RandomState(seed)`` reproduces that
    exact stream without touching the global state, so a single-worker,
    unshuffled run of this pipeline consumes draw-for-draw the same crop
    boxes/scales as the reference program given the same seed
    (``scripts/ab_reference.py``). Maps the ``np.random.Generator`` method
    surface my transforms use onto the legacy RandomState equivalents.
    """

    def __init__(self, seed: int):
        self._rs = np.random.RandomState(seed)

    def uniform(self, low=0.0, high=1.0, size=None):
        return self._rs.uniform(low, high, size)

    def integers(self, low, high=None, size=None):
        return self._rs.randint(low, high, size)

    def random(self, size=None):
        return self._rs.random_sample(size)

    def permutation(self, x):
        return self._rs.permutation(x)

    def get_state(self):
        return self._rs.get_state()

    def set_state(self, state) -> None:
        self._rs.set_state(state)


def iter_transform_rngs(transform):
    """Yield every snapshot-able rng reachable from a transform pipeline
    (Compose / TwoCropTransform / leaf transforms with an ``rng`` attr) —
    used by the trainer to leave augmentation streams untouched when it
    pulls a throwaway sample for shape-only model init."""
    if transform is None:
        return
    stack = [transform]
    seen = set()
    while stack:
        t = stack.pop()
        if id(t) in seen:
            continue
        seen.add(id(t))
        if isinstance(t, Compose):
            stack.extend(t.transforms)
        elif isinstance(t, TwoCropTransform):
            stack.append(t.transform)
        rng = getattr(t, "rng", None)
        if rng is not None and hasattr(rng, "get_state") \
                and hasattr(rng, "set_state"):
            yield rng


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample: Dict) -> Dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


class TwoCropTransform:
    """Run the full pipeline twice per sample for the two contrastive views
    (reference ``dataloaders/utils.py:13-22``)."""

    def __init__(self, transform):
        self.transform = transform

    def __call__(self, sample: Dict):
        return [self.transform(dict(sample)), self.transform(dict(sample))]


def _crop_and_scale_img(img: Image.Image, crop_box, target_size, pad_size,
                        resample, blank_value):
    """Pad-to-max → crop box → resize (reference
    ``custom_transforms_acdc.py:530-535``)."""
    target = Image.new(img.mode, pad_size, color=blank_value)
    target.paste(img)
    return target.crop(crop_box).resize(target_size, resample=resample)


class RandomSquareCropAndScale:
    """Random scale ∈ U(min, max) of the crop box, random location, pad with
    dataset mean / ignore id, resize to ``wh``
    (reference ``custom_transforms_acdc.py:444-525``)."""

    def __init__(self, wh: Tuple[int, int], mean: Tuple[int, int, int],
                 ignore_id: int = 255, min: float = 0.5, max: float = 2.0,
                 rng: Optional[np.random.Generator] = None):
        self.wh = wh
        self.mean = tuple(int(m) for m in mean)
        self.ignore_id = ignore_id
        self.min = min
        self.max = max
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Dict) -> Dict:
        left: Image.Image = sample["left"]
        scale = float(self.rng.uniform(self.min, self.max))
        w_img, h_img = left.size
        box_w = int(scale * self.wh[0])
        box_h = int(scale * self.wh[1])
        pad_size = (max(box_w, w_img), max(box_h, h_img))
        # random top-left such that the box fits the padded canvas
        try:
            x0 = int(self.rng.integers(0, pad_size[0] - box_w + 1))
            y0 = int(self.rng.integers(0, pad_size[1] - box_h + 1))
        except ValueError:
            x0 = y0 = 0
        crop_box = (x0, y0, x0 + box_w, y0 + box_h)
        target_size = (self.wh[0], self.wh[1])

        out = dict(sample)
        out["left"] = _crop_and_scale_img(left, crop_box, target_size, pad_size,
                                          RESAMPLE_IMG, self.mean)
        if "label" in sample and sample["label"] is not None:
            out["label"] = _crop_and_scale_img(sample["label"], crop_box, target_size,
                                               pad_size, Image.NEAREST, self.ignore_id)
        return out


class LabelBoundaryTransform:
    """Per-class Euclidean distance transform → summed → exp(-d / 2σ) boundary
    weight, zero at ignore pixels (reference
    ``custom_transforms_acdc.py:656-693``). Produces the ``alphas`` of the
    boundary-aware focal loss."""

    def __init__(self, num_classes: int, reduce: bool = True, ignore_id: int = 255):
        self.num_classes = num_classes
        self.reduce = reduce
        self.ignore_id = ignore_id

    def __call__(self, sample: Dict) -> Dict:
        labels = np.array(sample["label"])
        present = np.unique(labels)
        distances = np.zeros((self.num_classes,) + labels.shape, np.float32) - 1.0
        for i in range(self.num_classes):
            if i not in present:
                continue
            mask = labels == i
            if cv2 is not None:
                dt = cv2.distanceTransform(mask.astype(np.uint8), cv2.DIST_L2, maskSize=3)
            else:  # pragma: no cover
                from scipy.ndimage import distance_transform_edt

                dt = distance_transform_edt(mask).astype(np.float32)
            distances[i][mask] = dt[mask]
        if self.reduce:
            ignore_mask = labels == self.ignore_id
            distances[distances < 0] = 0
            summed = distances.sum(axis=0)
            std = np.std(summed)
            if std == 0:  # all-ignore images (reference :681-684)
                std = 1.0
            weights = np.exp(-summed / (2.0 * std))
            weights[ignore_mask] = 0.0
            sample["label_distance_weight"] = weights.astype(np.float32)
        else:
            sample["label_distance_transform"] = distances
        return sample


class GammaCorrection:
    """γ=0.4 LUT applied to night images only (weather id 1; reference
    ``custom_transforms_acdc.py:695-711``)."""

    def __init__(self, gamma: float = 0.4):
        self.gamma = gamma
        x = np.arange(256, dtype=np.float64)
        self.lut = np.clip((x / 255.0) ** gamma * 255.0, 0, 255).astype(np.uint8)

    def __call__(self, sample: Dict) -> Dict:
        weather = sample.get("weather")
        if weather is not None and int(np.asarray(weather).reshape(-1)[0]) == 1:
            arr = np.array(sample["left"])
            sample["left"] = Image.fromarray(self.lut[arr])
        return sample


class FixedResize:
    """Deterministic val resize: bilinear image, nearest label
    (reference ``custom_transforms_acdc.py:579-594``). ``size`` is (w, h)."""

    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, sample: Dict) -> Dict:
        if sample.get("label") is not None:
            sample["label"] = sample["label"].resize(self.size, Image.NEAREST)
        sample["left"] = sample["left"].resize(self.size, Image.BILINEAR)
        return sample


class SetTargetSize:
    """Attach (h, w) target metadata (reference
    ``custom_transforms_acdc.py:597-613``)."""

    def __init__(self, target_size, target_size_feats, stride: int = 4):
        self.target_size = target_size
        self.target_size_feats = target_size_feats
        self.stride = stride

    def __call__(self, sample: Dict) -> Dict:
        sample["target_size"] = self.target_size[::-1]
        sample["target_size_feats"] = self.target_size_feats[::-1]
        sample["alphas"] = [-1]
        sample["target_level"] = 0
        return sample


class CropBlackArea:
    """Fixed crop (140, 30, 2030, 900) then resize back — removes the black
    rectification border of the CityLostFound frames
    (reference ``custom_transforms_acdc.py:617-648`` / custom_transforms2)."""

    BOX = (140, 30, 2030, 900)

    def __call__(self, sample: Dict) -> Dict:
        w, h = sample["left"].size
        sample["left"] = sample["left"].crop(self.BOX).resize((w, h), Image.BILINEAR)
        if sample.get("label") is not None:
            sample["label"] = sample["label"].crop(self.BOX).resize((w, h), Image.NEAREST)
        return sample


class ColorJitter:
    """Photometric jitter (brightness/contrast/saturation/hue) applied to the
    image only — the torchvision-fork machinery the reference vendors in
    ``custom_transforms.py:1007-1098``. Semantics match torchvision's PIL
    backend: factors sampled U(max(0, 1−v), 1+v) (hue: U(−v, v)) in fixed
    b/c/s/h draw order, the enabled ops applied in SHUFFLED order
    (``get_params`` does ``random.shuffle``), each op saturating to uint8 —
    contrast blends against the grayscale mean via ``ImageEnhance.Contrast``,
    hue rotates the uint8 HSV H channel (no cv2 dependency)."""

    def __init__(self, brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0,
                 rng: Optional[np.random.Generator] = None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng or np.random.default_rng()

    def _factor(self, v: float) -> float:
        return float(self.rng.uniform(max(0.0, 1.0 - v), 1.0 + v))

    def __call__(self, sample: Dict) -> Dict:
        from .stereo_transforms import (
            adjust_brightness,
            adjust_contrast,
            adjust_hue,
            adjust_saturation,
        )

        img = sample["left"]
        if not isinstance(img, Image.Image):
            img = Image.fromarray(
                np.clip(np.asarray(img), 0, 255).astype(np.uint8))
        ops = []
        if self.brightness:
            b = self._factor(self.brightness)
            ops.append(lambda im, f=b: adjust_brightness(im, f))
        if self.contrast:
            c = self._factor(self.contrast)
            ops.append(lambda im, f=c: adjust_contrast(im, f))
        if self.saturation:
            s = self._factor(self.saturation)
            ops.append(lambda im, f=s: adjust_saturation(im, f))
        if self.hue:
            h = float(self.rng.uniform(-self.hue, self.hue))
            ops.append(lambda im, f=h: adjust_hue(im, f))
        for i in self.rng.permutation(len(ops)):
            img = ops[int(i)](img)
        sample["left"] = img
        return sample


class RandomHorizontalFlip:
    """Flip image+label together (torchvision-fork transform family)."""

    def __init__(self, p: float = 0.5, rng: Optional[np.random.Generator] = None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() < self.p:
            sample["left"] = sample["left"].transpose(Image.FLIP_LEFT_RIGHT)
            if sample.get("label") is not None:
                sample["label"] = sample["label"].transpose(Image.FLIP_LEFT_RIGHT)
        return sample


def _wire_image(img) -> np.ndarray:
    """Narrowest exact wire dtype for an image: uint8 when the source already
    is (PIL / uint8 array — the whole PIL-based augmentation chain), float32
    otherwise (numpy photometric transforms emit float values)."""
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        return arr
    return arr.astype(np.float32)


class ToArrays:
    """PIL → numpy in the narrowest EXACT wire dtype: uint8 HWC image
    (0-255 scale — normalization lives in the model, reference
    ``resnet_pyramid.py:296-304``) and uint8 label when the augmentation
    chain ends in PIL/uint8 (it does for every dataset here: train ids ≤ 255
    with 255 = ignore), float32 image / int32 label otherwise; float32
    disp/EDT weight; int32 weather. The jitted steps cast on device
    (``train/steps.py::ingest_batch`` — uint8→float32/int32 is exact), so
    the host pipeline's GIL-held copies, collate, and the H2D transfer move
    3× fewer bytes per two-crop sample (28.3 → 9.4 MB at 768²,
    HOSTPIPE_r05.json). The reference's ``Tensor`` transform emits CHW
    float32/int64 torch tensors (``custom_transforms_acdc.py:713-762``);
    NHWC + narrow wire dtypes is the TPU-native layout."""

    def __call__(self, sample: Dict) -> Dict:
        out = dict(sample)
        out["left"] = _wire_image(sample["left"])
        if sample.get("right") is not None:
            out["right"] = _wire_image(sample["right"])
        if sample.get("disp") is not None:
            out["disp"] = np.asarray(sample["disp"], np.float32)
        if sample.get("label") is not None:
            lbl = np.asarray(sample["label"])
            out["label"] = lbl if lbl.dtype == np.uint8 else lbl.astype(np.int32)
        if "weather" in sample and sample["weather"] is not None:
            out["weather"] = np.asarray(sample["weather"], np.int32).reshape(())
        return out


class RandomVerticalFlip:
    """Vertical flip of image+label (reference torchvision-fork
    ``custom_transforms.py::RandomVerticalFlip``)."""

    def __init__(self, p: float = 0.5, rng: Optional[np.random.Generator] = None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() < self.p:
            sample["left"] = sample["left"].transpose(Image.FLIP_TOP_BOTTOM)
            if sample.get("label") is not None:
                sample["label"] = sample["label"].transpose(Image.FLIP_TOP_BOTTOM)
        return sample


class RandomResizedCrop:
    """Random-area/aspect crop resized to ``size`` (reference torchvision-fork
    ``custom_transforms.py:769-858``: scale=(0.08, 1), ratio=(3/4, 4/3), 10
    attempts then center fallback). Labels ride along with NEAREST."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3. / 4., 4. / 3.),
                 rng: Optional[np.random.Generator] = None):
        self.size = size if isinstance(size, tuple) else (size, size)
        self.scale = scale
        self.ratio = ratio
        self.rng = rng or np.random.default_rng()

    def _params(self, img: Image.Image):
        import math

        w_img, h_img = img.size
        area = w_img * h_img
        for _ in range(10):
            target_area = float(self.rng.uniform(*self.scale)) * area
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(float(self.rng.uniform(*log_ratio)))
            w = int(round(math.sqrt(target_area * aspect)))
            h = int(round(math.sqrt(target_area / aspect)))
            if 0 < w <= w_img and 0 < h <= h_img:
                x0 = int(self.rng.integers(0, w_img - w + 1))
                y0 = int(self.rng.integers(0, h_img - h + 1))
                return x0, y0, w, h
        # fallback: center crop at the closest in-range aspect (torchvision)
        in_ratio = w_img / h_img
        if in_ratio < min(self.ratio):
            w, h = w_img, int(round(w_img / min(self.ratio)))
        elif in_ratio > max(self.ratio):
            h, w = h_img, int(round(h_img * max(self.ratio)))
        else:
            w, h = w_img, h_img
        return (w_img - w) // 2, (h_img - h) // 2, w, h

    def __call__(self, sample: Dict) -> Dict:
        x0, y0, w, h = self._params(sample["left"])
        box = (x0, y0, x0 + w, y0 + h)
        out = dict(sample)
        out["left"] = sample["left"].crop(box).resize(self.size, RESAMPLE_IMG)
        if sample.get("label") is not None:
            out["label"] = sample["label"].crop(box).resize(self.size, Image.NEAREST)
        return out


class RandomAffine:
    """Random rotation/translation/scale/shear keeping the image center fixed
    (reference torchvision-fork ``custom_transforms.py:1177-1374``). Image
    resamples bilinear with ``fillcolor``; labels nearest with the ignore id."""

    def __init__(self, degrees=0.0, translate=None, scale=None, shear=None,
                 fillcolor=0, ignore_id: int = 255,
                 rng: Optional[np.random.Generator] = None):
        self.degrees = (-degrees, degrees) if np.isscalar(degrees) else degrees
        self.translate = translate
        self.scale_range = scale
        if np.isscalar(shear):
            self.shear = (-shear, shear, 0.0, 0.0) if shear else None
        elif shear is not None and len(shear) == 2:
            self.shear = (shear[0], shear[1], 0.0, 0.0)
        else:
            self.shear = shear
        self.fillcolor = fillcolor
        self.ignore_id = ignore_id
        self.rng = rng or np.random.default_rng()

    def _matrix(self, w: int, h: int):
        import math

        angle = math.radians(float(self.rng.uniform(*self.degrees)))
        if self.translate is not None:
            max_dx, max_dy = self.translate[0] * w, self.translate[1] * h
            tx = float(np.round(self.rng.uniform(-max_dx, max_dx)))
            ty = float(np.round(self.rng.uniform(-max_dy, max_dy)))
        else:
            tx = ty = 0.0
        s = float(self.rng.uniform(*self.scale_range)) if self.scale_range else 1.0
        if self.shear is not None:
            shx = math.radians(float(self.rng.uniform(*self.shear[:2])))
            shy = math.radians(float(self.rng.uniform(*self.shear[2:])))
        else:
            shx = shy = 0.0

        # torchvision _get_inverse_affine_matrix: invert M = T·C·R·Shear·S
        # analytically (det of the unscaled 2×2 block is exactly 1).
        # Center uses the torchvision-0.4.0 PIL convention (w/2+0.5, h/2+0.5)
        # — the version the reference pins (environment.yaml: torchvision=
        # 0.4.0), whose F.affine is what the fork's RandomAffine calls — so
        # shear-free draws are byte-exact vs the pinned environment. The
        # shear math itself follows the CORRECTED modern formula (0.4.0's
        # shear matrix scaled the second row by 1/cos(shear), a bug fixed in
        # later torchvision; do-not-replicate per SURVEY "known defects"
        # policy).
        cx, cy = w * 0.5 + 0.5, h * 0.5 + 0.5
        a = math.cos(angle - shy) / math.cos(shy)
        b = -math.cos(angle - shy) * math.tan(shx) / math.cos(shy) - math.sin(angle)
        c = math.sin(angle - shy) / math.cos(shy)
        d = -math.sin(angle - shy) * math.tan(shx) / math.cos(shy) + math.cos(angle)
        m00, m01, m10, m11 = d / s, -b / s, -c / s, a / s
        return (m00, m01, m00 * (-cx - tx) + m01 * (-cy - ty) + cx,
                m10, m11, m10 * (-cx - tx) + m11 * (-cy - ty) + cy)

    def __call__(self, sample: Dict) -> Dict:
        w, h = sample["left"].size
        m = self._matrix(w, h)
        out = dict(sample)
        out["left"] = sample["left"].transform(
            (w, h), Image.AFFINE, m, resample=Image.BILINEAR,
            fillcolor=self.fillcolor)
        if sample.get("label") is not None:
            out["label"] = sample["label"].transform(
                (w, h), Image.AFFINE, m, resample=Image.NEAREST,
                fillcolor=self.ignore_id)
        return out


class RandomErasing:
    """Erase a random rectangle of the image array (reference torchvision-fork
    ``custom_transforms.py:1376-1460``; Zhong et al. 2017). Runs after
    ``ToArrays`` (array domain); the label is left untouched, matching
    torchvision (erasing simulates occlusion, not missing annotation).

    ``value="random"`` fills i.i.d. standard-normal values exactly like the
    reference (``torch.empty(...).normal_()``), whose example pipeline places
    the transform AFTER ``Normalize`` — use it post-normalization; on raw
    0..255 pixels pass a numeric ``value`` instead."""

    def __init__(self, p=0.5, scale=(0.02, 0.33), ratio=(0.3, 3.3), value=0.0,
                 rng: Optional[np.random.Generator] = None):
        self.p = p
        self.scale = scale
        self.ratio = ratio
        self.value = value
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample: Dict) -> Dict:
        import math

        if self.rng.random() >= self.p:
            return sample
        img = np.array(sample["left"], np.float32, copy=True)
        h_img, w_img = img.shape[:2]
        area = h_img * w_img
        for _ in range(10):
            target_area = float(self.rng.uniform(*self.scale)) * area
            aspect = float(self.rng.uniform(*self.ratio))
            eh = int(round(math.sqrt(target_area * aspect)))
            ew = int(round(math.sqrt(target_area / aspect)))
            if eh < h_img and ew < w_img:
                y0 = int(self.rng.integers(0, h_img - eh + 1))
                x0 = int(self.rng.integers(0, w_img - ew + 1))
                if self.value == "random":
                    img[y0:y0 + eh, x0:x0 + ew] = self.rng.standard_normal(
                        (eh, ew) + img.shape[2:])
                else:
                    img[y0:y0 + eh, x0:x0 + ew] = self.value
                break
        out = dict(sample)
        out["left"] = img
        return out
