#!/usr/bin/env python
"""EDT boundary-weight visualizer (reference
``visualize_balancing_weight.py:24-121`` + the ``--viz_EDT`` dumps in
``dataloaders/datasets/acdc.py:227-263``): renders, for a few train samples,
the transformed RGB crop, the raw EDT weight map, and the class-weighted map.
"""

from __future__ import annotations

import os

import numpy as np


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from doubly_contrastive_semseg_tpu.config import parse_args
    from doubly_contrastive_semseg_tpu.data import get_dataset
    from doubly_contrastive_semseg_tpu.data.weights import (
        balanced_class_weights, compute_class_frequencies)

    cfg = parse_args()
    train_dst, _ = get_dataset(cfg, seed=cfg.random_seed)

    out_dir = os.path.join(cfg.run_root, "viz_EDT")
    os.makedirs(out_dir, exist_ok=True)

    freq = compute_class_frequencies(train_dst, cfg.num_classes,
                                     max_samples=min(16, len(train_dst)))
    class_w = balanced_class_weights(freq, cfg.epsilon)

    n = min(8, len(train_dst))
    for i in range(n):
        sample = train_dst[i]
        if isinstance(sample, (list, tuple)):  # two-crop mode
            sample = sample[0]
        img = np.asarray(sample["left"], np.float32)
        edt = np.asarray(sample["label_distance_weight"])
        lbl = np.asarray(sample["label"]).copy()
        lbl[lbl == 255] = 0
        weighted = edt * class_w[lbl]

        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        axes[0].imshow(img.astype(np.uint8))
        axes[0].set_title("RGB crop")
        im1 = axes[1].imshow(edt, cmap="viridis")
        axes[1].set_title("EDT weight exp(-d/2σ)")
        fig.colorbar(im1, ax=axes[1], fraction=0.046)
        im2 = axes[2].imshow(weighted, cmap="viridis")
        axes[2].set_title("× class balance weight")
        fig.colorbar(im2, ax=axes[2], fraction=0.046)
        for ax in axes:
            ax.axis("off")
        path = os.path.join(out_dir, f"{i}_EDT.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print("saved", path)


if __name__ == "__main__":
    main()
