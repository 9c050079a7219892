"""Stereo (disparity + optional semantics) trainer — the RODSNet-era
configuration (reference trains it through the same ``Trainer`` with stereo
datasets and disparity criteria; here it is a dedicated loop over
``make_stereo_train_step`` with EPE/D1 validation per
``metrics/disparity_metric.py``)."""

from __future__ import annotations

import logging
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader
from ..data.synthetic import SyntheticStereoDataset
from ..metrics.disparity import d1_metric, epe_metric, thres_metric
from ..models.stereo import StereoDCSS
from ..parallel import make_mesh, replicate_sharding, shard_batch
from ..utils import Saver, SummaryWriter, count_parameters, setup_logger
from .checkpoints import CheckpointManager
from .optimizer import build_lr_schedule
from .state import TrainState
from .steps import make_stereo_train_step


# Per-dataset (train crop, val pad/crop) shapes used when the user leaves the
# generic --img_* flags at their defaults. KITTI frames are ~375×1242 and
# mixed-size, so the semantic defaults (512×1024 crop, 1920×1080 val) would
# mix pad+crop / stack ragged batches; these are the standard stereo shapes
# (all /32 for the pyramid). The reference CLI lists these datasets but its
# get_dataset has no branch for them (dataloaders/utils.py:32-193 — the
# RODSNet-era pipeline in dataloaders/transforms.py is dead code there).
_STEREO_TRAIN_HW = {"kitti_2015": (288, 1152), "kitti_mix": (288, 1152),
                    "sceneflow": (288, 576)}
_STEREO_VAL_HW = {"kitti_2015": (384, 1248), "kitti_mix": (384, 1248),
                  "sceneflow": (576, 960),
                  # full-res: disparity can't be resized like labels
                  "cityscapes": (1024, 2048)}


def _stereo_dataset(cfg, mode: str):
    if cfg.dataset == "synthetic":
        size = 8 if cfg.debug else 32
        return SyntheticStereoDataset(size=size if mode == "train" else 4,
                                      image_hw=(64, 96), max_disp=16,
                                      seed=0 if mode == "train" else 1)
    # sceneflow / kitti lists flow through the Cityscapes loader; the
    # transform stack is the RODSNet-era stereo pipeline
    # (reference dataloaders/transforms.py:9-258): photometric RandomColor →
    # shared RandomCrop (pad-or-crop) → ToArrays
    from ..config import Config
    from ..data.cityscapes import Cityscapes
    from ..data.stereo_transforms import RandomColor, StereoRandomCrop
    from ..data.transforms import Compose, ToArrays

    dflt = Config()
    if mode == "train":
        h, w = cfg.img_height, cfg.img_width
        if (h, w) == (dflt.img_height, dflt.img_width) and \
                cfg.dataset in _STEREO_TRAIN_HW:
            h, w = _STEREO_TRAIN_HW[cfg.dataset]
        from ..data.transforms import ThreadSafeRng

        rng = ThreadSafeRng(np.random.default_rng(cfg.random_seed))
        t = Compose([RandomColor(rng=rng),
                     StereoRandomCrop(h, w, label_pad=255, rng=rng),
                     ToArrays()])
    else:
        h, w = cfg.val_img_height, cfg.val_img_width
        if (h, w) == (dflt.val_img_height, dflt.val_img_width) and \
                cfg.dataset in _STEREO_VAL_HW:
            h, w = _STEREO_VAL_HW[cfg.dataset]
        t = Compose([StereoRandomCrop(h, w, validate=True, label_pad=255),
                     ToArrays()])
    logging.info("stereo %s pipeline: %dx%d pad-or-crop", mode, h, w)
    return Cityscapes(root=cfg.data_root, dataset_name=cfg.dataset, mode=mode,
                      transform=t, opts=cfg, load_disp=True)


class StereoTrainer:
    def __init__(self, cfg):
        import optax

        self.cfg = cfg
        self.saver = Saver(cfg)
        self.saver.save_experiment_config()
        setup_logger(self.saver.experiment_dir, f"stereo_{cfg.dataset}")

        self.train_dst = _stereo_dataset(cfg, "train")
        self.val_dst = _stereo_dataset(cfg, "val")
        self.train_loader = DataLoader(self.train_dst, cfg.batch_size,
                                       shuffle=True, num_workers=cfg.num_workers,
                                       drop_last=True, seed=cfg.random_seed)
        self.val_loader = DataLoader(self.val_dst, cfg.val_batch_size,
                                     num_workers=cfg.num_workers)

        max_disp = 32 if cfg.dataset == "synthetic" else 192
        self.model = StereoDCSS(
            max_disp=max_disp, num_classes=cfg.num_classes,
            train_semantic=cfg.train_semantic,
            backbone=cfg.model if cfg.model in
            ("resnet18", "resnet34", "efficientnetb0") else "resnet18",
            aggregation_type=cfg.aggregation_type,
            refinement_type=cfg.refinement_type,
            deform_impl=getattr(cfg, "deform_impl", "window"),
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)
        self.mesh = make_mesh(cfg.num_devices)

        from .steps import ingest_batch

        batch = ingest_batch(self._device_batch(next(iter(self.train_loader))))
        variables = self.model.init(
            {"params": jax.random.PRNGKey(cfg.random_seed),
             "dropout": jax.random.PRNGKey(cfg.random_seed + 1)},
            batch["left"], batch["right"], train=True)
        sched = build_lr_schedule(cfg, max(1, len(self.train_loader)))
        self.tx = optax.adam(sched, b1=0.9, b2=0.99)
        self.state = TrainState(params=variables["params"],
                                batch_stats=variables.get("batch_stats", {}),
                                opt_state=self.tx.init(variables["params"]),
                                step=jnp.zeros((), jnp.int32))
        self.state = jax.device_put(self.state, replicate_sharding(self.mesh))
        logging.info("stereo model: %.2fM params",
                     count_parameters(self.state.params) / 1e6)

        self.ckpt = CheckpointManager(self.saver.checkpoint_dir)
        self.cur_epochs = 0
        self.num_iter = 0
        self.best_epe = float("inf")
        if cfg.resume is not None:
            # the RODSNet recipes chain checkpoints (sceneflow pretrain →
            # kitti_mix → kitti_2015, tjsong_train.sh:80-98); without this
            # every stereo --resume silently trained from random init
            import os

            if not os.path.isdir(cfg.resume) and not os.path.isfile(cfg.resume):
                raise RuntimeError(f"=> no checkpoint found at '{cfg.resume}'")
            self.state, meta = self.ckpt.restore(
                cfg.resume, self.state,
                continue_training=cfg.continue_training)
            if cfg.continue_training:
                self.cur_epochs = int(meta.get("epoch", -1)) + 1
                self.num_iter = int(meta.get("num_iter", 0)) + 1
                saved_best = float(meta.get("best_score", 0.0))
                # 0.0 = no best recorded (EPE is lower-better; an exact 0.0
                # best is unreachable in practice)
                self.best_epe = saved_best if saved_best > 0.0 else float("inf")
                logging.info("Training state restored from %s (epoch %d)",
                             cfg.resume, self.cur_epochs)
            else:
                logging.info("Weights restored from %s", cfg.resume)
        self._train_step = jax.jit(make_stereo_train_step(self.model, cfg, self.tx),
                                   donate_argnums=(0,))
        def _eval(v, l, r):
            b = ingest_batch({"left": l, "right": r})
            return self.model.apply(v, b["left"], b["right"],
                                    train=False)["disp"]

        self._eval_fwd = jax.jit(_eval)
        self._rng = jax.random.PRNGKey(cfg.random_seed + 2)
        self.writer = SummaryWriter(self.saver.experiment_dir,
                                    enable_tb=not cfg.no_build_summary)

    def _device_batch(self, batch: Dict) -> Dict:
        return shard_batch(batch, self.mesh)

    def train(self) -> None:
        self.train_loader.set_epoch(self.cur_epochs)
        for i, batch in enumerate(self.train_loader):
            self.num_iter += 1
            self.state, metrics = self._train_step(
                self.state, self._device_batch(batch), self._rng)
            if self.num_iter % self.cfg.print_freq == 0:
                logging.info("Epoch [%d][%d] disp_loss %.4f total %.4f",
                             self.cur_epochs, i,
                             float(metrics["disp_loss"]),
                             float(metrics["total_loss"]))
                self.writer.add_scalar("train/disp_loss",
                                       float(metrics["disp_loss"]), self.num_iter)

    def validate(self, save_ckpt: bool = True) -> Dict[str, float]:
        """``save_ckpt=False`` for --test_only: evaluate without touching
        latest/best checkpoints."""
        epes, d1s, t1s = [], [], []
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        for batch in self.val_loader:
            db = self._device_batch(batch)
            disp = self._eval_fwd(variables, db["left"], db["right"])
            gt = db["disp"]
            epes.append(float(epe_metric(disp, gt)))
            d1s.append(float(d1_metric(disp, gt)))
            t1s.append(float(thres_metric(disp, gt, 1.0)))
        res = {"epe": float(np.mean(epes)), "d1": float(np.mean(d1s)),
               "thres1": float(np.mean(t1s))}
        logging.info("val: EPE %.4f  D1 %.4f  >1px %.4f",
                     res["epe"], res["d1"], res["thres1"])
        self.writer.add_scalar("val/epe", res["epe"], self.cur_epochs)
        self.writer.add_scalar("val/d1", res["d1"], self.cur_epochs)
        if not save_ckpt:
            return res
        if res["epe"] < self.best_epe:
            self.best_epe = res["epe"]
            self.ckpt.save("score_best_checkpoint", self.state,
                           self.cur_epochs, score=res,
                           best_score=self.best_epe)
        self.ckpt.save("latest_checkpoint", self.state, self.cur_epochs,
                       score=res, best_score=self.best_epe)
        return res
