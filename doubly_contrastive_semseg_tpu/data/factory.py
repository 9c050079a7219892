"""Dataset + transform-pipeline factory (reference ``dataloaders/utils.py:24-193``).

Per-dataset pipelines:
- acdc train: RandomSquareCropAndScale(768²) → SetTargetSize →
  LabelBoundaryTransform(EDT) → [GammaCorrection] → ToArrays, wrapped in
  TwoCropTransform when the criterion contains 'supcon'
  (``dataloaders/utils.py:132-147``);
- acdc val: FixedResize((val_w, val_h)) → [GammaCorrection] → ToArrays;
- cityscapes: same geometry without the weather/gamma pieces;
- synthetic: same as acdc over the in-memory dataset (CI path).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .acdc import ACDC
from .cityscapes import Cityscapes
from .synthetic import SyntheticDataset
from .transforms import (
    Compose,
    CropBlackArea,
    FixedResize,
    GammaCorrection,
    LabelBoundaryTransform,
    RandomSquareCropAndScale,
    ReferenceRng,
    SetTargetSize,
    ThreadSafeRng,
    ToArrays,
    TwoCropTransform,
)

# dataset-mean fill for crop padding (reference dataloaders/utils.py:28-30)
MEAN_RGB = tuple(np.uint8([73.15, 82.90, 72.3]))


def _train_rng(cfg, seed: int):
    """Augmentation RNG: thread-safe Generator normally; in --reference_rng
    A/B mode, the reference program's exact legacy np.random stream
    (single-worker, unshuffled runs only — see scripts/ab_reference.py)."""
    if getattr(cfg, "reference_rng", False):
        return ReferenceRng(cfg.random_seed)
    return ThreadSafeRng(np.random.default_rng(seed))


def build_transforms(cfg, crop_wh: Tuple[int, int], seed: int = 0):
    train_rng = _train_rng(cfg, seed)
    target_size_crops = crop_wh
    target_size_feats = (crop_wh[0] // 4, crop_wh[1] // 4)

    if not cfg.host_augment:
        # on-device augmentation (--no_host_augment): the host only decodes;
        # crops/EDT/gamma/two-crop run inside the jitted step
        # (data/device_augment.py)
        return Compose([ToArrays()]), Compose(
            [FixedResize((cfg.val_img_width, cfg.val_img_height)), ToArrays()])

    train_tech = [
        RandomSquareCropAndScale(crop_wh, mean=MEAN_RGB, ignore_id=255, rng=train_rng),
        SetTargetSize(target_size=target_size_crops, target_size_feats=target_size_feats),
        LabelBoundaryTransform(num_classes=cfg.num_classes, reduce=True),
    ]
    val_tech = [FixedResize((cfg.val_img_width, cfg.val_img_height))]
    if cfg.use_gamma_correction:
        train_tech.append(GammaCorrection())
        val_tech.append(GammaCorrection())
    train_tech.append(ToArrays())
    val_tech.append(ToArrays())

    train_transform = Compose(train_tech)
    val_transform = Compose(val_tech)
    if cfg.use_supcon:
        train_transform = TwoCropTransform(train_transform)
    return train_transform, val_transform


def get_dataset(cfg, seed: int = 0):
    """Returns (train_dst, val_dst)."""
    crop_wh = cfg.crop_wh

    if cfg.dataset == "acdc_city":
        from .acdc_city import ACDC_City

        train_t, val_t = build_transforms(cfg, crop_wh, seed)
        train_dst = ACDC_City(root=cfg.data_root, mode="train",
                              transform=train_t, opts=cfg)
        val_dst = ACDC_City(root=cfg.data_root, mode="val",
                            transform=val_t, opts=cfg)
        return train_dst, val_dst

    if cfg.dataset == "acdc":
        train_t, val_t = build_transforms(cfg, crop_wh, seed)
        train_dst = ACDC(root=cfg.data_root, dataset_name="acdc", mode="train",
                         transform=train_t, opts=cfg)
        val_mode = "test" if cfg.use_test_data else "val"
        val_dst = ACDC(root=cfg.data_root, dataset_name="acdc", mode=val_mode,
                       transform=val_t, opts=cfg)
        return train_dst, val_dst

    if cfg.dataset in ("cityscapes", "kitti_2015", "kitti_mix", "sceneflow"):
        train_t, val_t = build_transforms(cfg, crop_wh, seed)
        train_dst = Cityscapes(root=cfg.data_root, dataset_name=cfg.dataset,
                               mode="train", transform=train_t, opts=cfg)
        val_dst = Cityscapes(root=cfg.data_root, dataset_name=cfg.dataset,
                             mode="val", transform=val_t, opts=cfg)
        return train_dst, val_dst

    if cfg.dataset == "city_lost":
        # CropBlackArea precedes everything for Lost&Found frames
        # (reference dataloaders/utils.py:80-97)
        train_rng = _train_rng(cfg, seed)
        train_t = Compose([
            CropBlackArea(),
            RandomSquareCropAndScale(crop_wh, mean=MEAN_RGB, ignore_id=255, rng=train_rng),
            SetTargetSize(target_size=crop_wh, target_size_feats=(crop_wh[0] // 4, crop_wh[1] // 4)),
            LabelBoundaryTransform(num_classes=cfg.num_classes, reduce=True),
            ToArrays(),
        ])
        val_t = Compose([CropBlackArea(),
                         FixedResize((cfg.val_img_width, cfg.val_img_height)),
                         ToArrays()])
        if cfg.use_supcon:
            train_t = TwoCropTransform(train_t)
        from .citylostfound import CityLostFound, LostFound

        # --not_md_fusion selects Lost&Found only (reference
        # dataloaders/utils.py:99-107)
        cls = LostFound if cfg.not_md_fusion else CityLostFound
        train_dst = cls(root=cfg.data_root, dataset_name="city_lost",
                        mode="train", transform=train_t, opts=cfg)
        val_dst = cls(root=cfg.data_root, dataset_name="city_lost",
                      mode="val", transform=val_t, opts=cfg)
        return train_dst, val_dst

    if cfg.dataset == "synthetic":
        hw = tuple(int(v) for v in cfg.synthetic_hw.split("x"))  # (h, w)
        crop = cfg.crop_wh
        train_rng = _train_rng(cfg, seed)
        if cfg.host_augment:
            train_t = Compose([
                RandomSquareCropAndScale(crop, mean=MEAN_RGB, ignore_id=255,
                                         rng=train_rng),
                SetTargetSize(target_size=crop,
                              target_size_feats=(crop[0] // 4, crop[1] // 4)),
                LabelBoundaryTransform(num_classes=cfg.num_classes, reduce=True),
                ToArrays(),
            ])
            if cfg.use_supcon:
                train_t = TwoCropTransform(train_t)
        else:
            train_t = Compose([ToArrays()])
        val_t = Compose([FixedResize((hw[1], hw[0])), ToArrays()])
        size = 8 if cfg.debug else cfg.synthetic_size
        train_dst = SyntheticDataset(size=size, image_hw=hw,
                                     num_classes=cfg.num_classes,
                                     weather_num=cfg.weather_num,
                                     transform=train_t, seed=seed, mode="train")
        val_dst = SyntheticDataset(size=max(2, size // 4), image_hw=hw,
                                   num_classes=cfg.num_classes,
                                   weather_num=cfg.weather_num,
                                   transform=val_t, seed=seed + 1, mode="val")
        return train_dst, val_dst

    raise ValueError(f"unknown dataset {cfg.dataset}")
