#!/usr/bin/env python
"""Training CLI (reference ``main.py:18-56``): seed, build Trainer, epoch loop
train() → validate(); ``--test_only`` runs a single validation pass;
``--tsne`` exports t-SNE feature visualizations."""

from __future__ import annotations

import logging
import time

from doubly_contrastive_semseg_tpu.config import parse_args
from doubly_contrastive_semseg_tpu.utils import seed_all_rng


def main() -> None:
    cfg = parse_args()
    seed_all_rng(cfg.random_seed)

    if cfg.tsne:
        from doubly_contrastive_semseg_tpu.tools.tsne import Viz

        viz = Viz(cfg)
        viz.run()
        return

    if cfg.test_only and cfg.resume is None and not cfg.pretrained:
        # reference requires --resume (main.py:42-46); we additionally accept
        # --pretrained (a torch .pth through the converter) so a reference
        # checkpoint can be validated directly (scripts/ab_reference.py val-only)
        raise RuntimeError("--test_only requires --resume or --pretrained")

    # stereo datasets route to the disparity trainer (the RODSNet-era path;
    # reference reaches it via the same CLI with stereo datasets)
    if cfg.dataset in ("sceneflow", "kitti_2015", "kitti_mix") or (
            cfg.dataset == "synthetic" and not cfg.train_semantic
            and cfg.criterion == "none" and cfg.transfer_disparity):
        from doubly_contrastive_semseg_tpu.train.trainer_stereo import StereoTrainer

        trainer = StereoTrainer(cfg)
        if cfg.test_only:
            # single evaluation pass from --resume; don't touch checkpoints
            trainer.validate(save_ckpt=False)
            return
        for epoch in range(trainer.cur_epochs, cfg.epochs):
            trainer.cur_epochs = epoch
            trainer.train()
            trainer.validate()
        return

    from doubly_contrastive_semseg_tpu.train import Trainer

    trainer = Trainer(cfg)

    if cfg.test_only:
        trainer.test()
        return

    for epoch in range(trainer.cur_epochs, cfg.epochs):
        t0 = time.time()
        trainer.cur_epochs = epoch
        trainer.train()
        trainer.validate()
        logging.info("epoch %d took %.1f s", epoch, time.time() - t0)


if __name__ == "__main__":
    main()
