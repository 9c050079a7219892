"""Trainer: functional train/validate loops over jitted steps.

Re-design of reference ``trainer.py:27-666`` + ``utils/init_trainer.py:21-324``
(the ``InitOpts`` builder). Ordered init mirrors the reference: saver →
dataloader → criterion weights → model → optimizer → checkpoint restore →
(scheduler lives inside the optimizer) → summary writer.

Differences by design:
- the hot loops run one compiled XLA program per phase; validation metrics
  accumulate on device (no per-batch host syncs);
- the LR schedule is baked into the optimizer (per-epoch cosine annealing),
  so there is no ``scheduler.step()``;
- multi-device data parallelism is a mesh + sharding annotation
  (``parallel/mesh.py``), not a module wrapper.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import DataLoader, get_dataset
from ..data.weights import load_or_compute_class_weights
from ..metrics import Evaluator, TimeAverageMeter
from ..models import build_model
from ..parallel import make_mesh, replicate_sharding, shard_batch
from ..utils import Saver, SummaryWriter, count_parameters, setup_logger
from .checkpoints import CheckpointManager
from .optimizer import build_lr_schedule
from .state import TrainState, init_state_and_optimizer
from .steps import init_eval_accum, make_eval_step, make_train_step


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        # --- saver / logging (init_trainer.py:317-320)
        self.saver = Saver(cfg)
        self.saver.save_experiment_config()
        setup_logger(self.saver.experiment_dir, f"{cfg.model}_{cfg.dataset}")
        self.cfg.experiment_dir = self.saver.experiment_dir

        # --- data (init_trainer.py:79-95)
        self.train_dst, self.val_dst = get_dataset(cfg, seed=cfg.random_seed)
        from ..data.grain_loader import make_loader

        self.train_loader = make_loader(
            cfg.loader, self.train_dst, cfg.batch_size, shuffle=cfg.shuffle,
            num_workers=cfg.num_workers, drop_last=True, seed=cfg.random_seed)
        self.val_loader = make_loader(
            cfg.loader, self.val_dst, cfg.val_batch_size, shuffle=False,
            num_workers=cfg.num_workers)
        logging.info("Dataset: %s, Train set: %d, Val set: %d",
                     cfg.dataset, len(self.train_dst), len(self.val_dst))

        # --- class-balanced weights (init_trainer.py:185-213)
        if cfg.use_balanced_weights and cfg.train_semantic and cfg.dataset != "synthetic":
            self.class_weight = jnp.asarray(
                load_or_compute_class_weights(cfg, self.train_dst))
        else:
            self.class_weight = jnp.ones((cfg.num_classes,), jnp.float32)

        # --- model / mesh / optimizer
        self.model = build_model(cfg)
        self.mesh = make_mesh(cfg.num_devices)
        self.evaluator = Evaluator(cfg.num_classes, cfg.weather_num)

        steps_per_epoch = max(1, len(self.train_loader))
        sample_batch = self._sample_batch()
        rng = jax.random.PRNGKey(cfg.random_seed)
        self.state, self.tx = init_state_and_optimizer(
            self.model, cfg, sample_batch, rng, steps_per_epoch)
        self.state = jax.device_put(self.state, replicate_sharding(self.mesh))
        self._lr_schedule = build_lr_schedule(cfg, steps_per_epoch)

        # ImageNet / reference-checkpoint weight import (--pretrained <path>;
        # reference loads torchvision weights at model build, resnet_pyramid.py:397-405)
        if cfg.pretrained:
            from ..utils.torch_convert import load_pretrained

            p, bs, _ = load_pretrained(self.state.params, self.state.batch_stats,
                                       cfg.pretrained)
            self.state = self.state.replace(
                params=jax.device_put(p, replicate_sharding(self.mesh)),
                batch_stats=jax.device_put(bs, replicate_sharding(self.mesh)))

        n_params = count_parameters(self.state.params)
        self.saver.save_parameters(n_params)
        logging.info("model %s: %.2fM params on %d device(s)",
                     cfg.model, n_params / 1e6, self.mesh.devices.size)

        # --- checkpoints (init_trainer.py:242-281)
        self.ckpt = CheckpointManager(self.saver.checkpoint_dir)
        self.cur_epochs = 0
        self.num_iter = 0
        self.best_score = 0.0
        self.best_score_epoch = -1
        self.best_acc = 0.0
        if cfg.resume is not None:
            if not os.path.isdir(cfg.resume) and not os.path.isfile(cfg.resume):
                raise RuntimeError(f"=> no checkpoint found at '{cfg.resume}'")
            self.state, meta = self.ckpt.restore(
                cfg.resume, self.state, continue_training=cfg.continue_training)
            if cfg.continue_training:
                if meta.get("mid_epoch") and meta.get("loader_state") is not None \
                        and hasattr(self.train_loader, "set_state"):
                    # rescue checkpoint taken mid-epoch with --loader grain:
                    # continue the SAME epoch at the exact batch position
                    self.cur_epochs = int(meta.get("epoch", 0))
                    self.train_loader.set_state(meta["loader_state"])
                    # continue the counter exactly: the loop pre-increments,
                    # so the first resumed batch logs as saved+1, the same
                    # iteration an uninterrupted run would have used
                    self.num_iter = int(meta.get("num_iter", 0))
                    logging.info("mid-epoch loader position restored "
                                 "(epoch %d resumes at the saved batch)",
                                 self.cur_epochs)
                else:
                    self.cur_epochs = int(meta.get("epoch", -1)) + 1
                    # reference parity: init_trainer.py:254 restores
                    # checkpoint['num_iter'] + 1 (and its loop pre-increments)
                    self.num_iter = int(meta.get("num_iter", 0)) + 1
                self.best_score = float(meta.get("best_score", 0.0))
                self.best_score_epoch = int(meta.get("best_score_epoch", -1))
                logging.info("Training state restored from %s (epoch %d)",
                             cfg.resume, self.cur_epochs)
            else:
                logging.info("Weights restored from %s", cfg.resume)
        else:
            logging.info("[!] No checkpoints found, training from init...")

        # --- jitted steps
        self._train_step = jax.jit(
            make_train_step(self.model, cfg, self.tx), donate_argnums=(0,))
        self._augment = None
        if not cfg.host_augment:
            import functools

            from ..data.device_augment import augment_batch

            self._augment = functools.partial(
                augment_batch, crop=cfg.crop_wh[0], num_classes=cfg.num_classes,
                two_crop=cfg.use_supcon, use_gamma=cfg.use_gamma_correction)
        self._eval_step = jax.jit(
            make_eval_step(self.model, cfg), donate_argnums=(3,))
        self._rng = jax.random.PRNGKey(cfg.random_seed + 1)

        # --- summaries (init_trainer.py:322-324)
        self.writer = SummaryWriter(self.saver.experiment_dir,
                                    enable_tb=not cfg.no_build_summary)
        self.writer.init_wandb(cfg.wandb)

        self.forward_time = TimeAverageMeter()
        self.backward_time = TimeAverageMeter()
        self.time_val: list = []
        self.time_val_dataloader: list = []

        # failure handling: the reference dies on any signal and recovery is
        # manual --resume (SURVEY §5); here SIGTERM/SIGINT trigger a rescue
        # checkpoint so preempted runs resume losslessly
        self._install_signal_rescue()

    def _install_signal_rescue(self) -> None:
        import signal

        def rescue(signum, frame):
            logging.warning("signal %s: writing rescue checkpoint...", signum)
            try:
                self._write_rescue()
                logging.warning("rescue checkpoint saved; exiting")
            finally:
                raise SystemExit(128 + signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, rescue)
            except ValueError:  # non-main thread (e.g. tests)
                return

    def _write_rescue(self) -> None:
        """rescue_checkpoint = train state + exact mid-epoch input position
        (grain's checkpointable iterator; the threaded loader has no position
        and restarts the epoch, like the reference's torch DataLoader)."""
        loader_state = None
        if hasattr(self.train_loader, "get_state"):
            try:
                loader_state = self.train_loader.get_state()
            except Exception:
                loader_state = None
        self.ckpt.save("rescue_checkpoint", self.state, self.cur_epochs,
                       None, self.best_score, self.best_score_epoch,
                       loader_state=loader_state)

    # ------------------------------------------------------------------ data
    def _sample_batch(self) -> Dict:
        """One batch for model init (shapes only) — collated straight from
        the dataset so no loader iterator is spun up and abandoned before
        training starts (a grain iterator would leak its worker pool, and a
        prematurely-created iterator would swallow a restored mid-epoch
        position)."""
        from ..data.loader import collate

        if self.cfg.test_only:
            dst, bs = self.val_dst, self.cfg.val_batch_size
        else:
            dst, bs = self.train_dst, self.cfg.batch_size
        # shape-only probe: leave augmentation rng streams exactly where they
        # were so the training stream starts at draw 0 (A/B parity relies on
        # this; see data/transforms.py::ReferenceRng)
        from ..data.transforms import iter_transform_rngs

        rngs = list(iter_transform_rngs(getattr(dst, "transform", None)))
        states = [r.get_state() for r in rngs]
        batch = collate([dst[0]] * bs)
        for r, s in zip(rngs, states):
            r.set_state(s)
        if self.cfg.use_supcon and "left" in batch and \
                np.shape(batch["left"])[0] == bs:
            # supcon criteria init through the two-view path (2B images per
            # batch); a --test_only probe comes from the val set (single
            # view) — duplicate rows so init sees training shapes
            batch["left"] = np.concatenate([batch["left"], batch["left"]])
        return self._device_batch(batch)

    def _device_batch(self, batch: Dict) -> Dict:
        db = shard_batch(batch, self.mesh)
        db["class_weight"] = jax.device_put(
            self.class_weight, replicate_sharding(self.mesh))
        return db

    # ----------------------------------------------------------------- train
    def train(self) -> None:
        cfg = self.cfg
        logging.info("training...")
        if cfg.trace and self.cur_epochs == cfg.start_epoch:
            # --trace: capture a device profile of the first epoch
            # (tensorboard --logdir <experiment_dir>/profile → Profile tab)
            from ..utils.profiling import trace as profiler_trace

            with profiler_trace(os.path.join(self.saver.experiment_dir,
                                             "profile")):
                self._train_epoch()
            return
        self._train_epoch()

    def _train_epoch(self) -> None:
        cfg = self.cfg
        self.train_loader.set_epoch(self.cur_epochs)
        num_img_tr = len(self.train_loader)
        interval_loss, print_cycle, data_cycle = 0.0, 0.0, 0.0
        train_epoch_loss = 0.0

        base_lr = self._current_lr()
        self.writer.add_scalar("base_lr", base_lr, self.cur_epochs)

        last_data_time = time.time()
        for i, batch in enumerate(self.train_loader):
            data_cycle += time.time() - last_data_time
            self.num_iter += 1
            step_start = time.time()

            db = self._device_batch(batch)
            if self._augment is not None:
                aug = self._augment(db["left"], db["label"], db["weather"],
                                    jax.random.fold_in(self._rng, self.num_iter))
                db.update(aug)
            self.state, metrics = self._train_step(self.state, db, self._rng)
            # accumulate on device; host sync only at print/summary boundaries
            # (the reference keeps live tensors alive the same way but syncs
            # every step via .item() logging — see SURVEY "known defects")
            interval_loss = interval_loss + metrics["total_loss"]
            train_epoch_loss = train_epoch_loss + metrics["total_loss"]

            one_cycle = time.time() - step_start
            print_cycle += one_cycle

            if self.num_iter % cfg.print_freq == 0:
                interval_loss = float(interval_loss) / cfg.print_freq
                logging.info(
                    "Epoch: [%3d/%3d][%3d/%3d] DT: %4.2f (s), BT: %4.2f (s), "
                    "BT/img: %4.3f (s), loss: %f",
                    self.cur_epochs, cfg.epochs, i + 1, num_img_tr,
                    data_cycle, print_cycle,
                    print_cycle / cfg.print_freq / cfg.batch_size, interval_loss)
                self.writer.add_scalar("train/total_loss_print_freq",
                                       interval_loss, self.num_iter)
                interval_loss, print_cycle, data_cycle = 0.0, 0.0, 0.0

            if self.num_iter % cfg.summary_freq == 0:
                self._write_loss_summaries(metrics)

            # periodic SIGKILL-survivable rescue (uncatchable kills lose at
            # most rescue_interval steps; skipped at the epoch boundary where
            # the ordinary epoch-end save supersedes it)
            if cfg.rescue_interval > 0 and i + 1 < num_img_tr \
                    and self.num_iter % cfg.rescue_interval == 0:
                self._write_rescue()

            last_data_time = time.time()

        self.writer.add_scalar("train/total_loss_epoch",
                               float(train_epoch_loss) / max(num_img_tr, 1),
                               self.cur_epochs)

    def _current_lr(self) -> float:
        return float(self._lr_schedule(int(self.state.step)))

    def _write_loss_summaries(self, metrics: Dict) -> None:
        """Per-criterion scalar families (reference trainer.py:234-290)."""
        cfg, it = self.cfg, self.num_iter
        self.writer.add_scalar("train/total_loss_summary_freq",
                               float(metrics["total_loss"]), it)
        if "weather_loss" in metrics:
            self.writer.add_scalar("train/weather_loss_summary_freq",
                                   float(metrics["weather_loss"]), it)
            self.writer.add_scalar("train/weather_clf_acc_summary_freq",
                                   float(metrics["weather_clf_acc"]), it)
            self.best_acc = max(self.best_acc, float(metrics["weather_clf_acc"]))
        if cfg.criterion != "crossentropy":
            self.writer.add_scalar("train/sem_loss_summary_freq",
                                   float(metrics["seg_loss"]), it)
        for comp, tag in (("supcon_loss", "train/supcon_loss_summary_freq"),
                          ("simclr_loss", "train/simclr_loss_summary_freq"),
                          ("pixelcontrast_loss", "train/pixelcontrast_loss_summary_freq"),
                          ("ce_loss", "train/ce_loss_summary_freq")):
            if float(metrics.get(comp, 0.0)) != 0.0:
                self.writer.add_scalar(tag, float(metrics[comp]), it)

    # -------------------------------------------------------------- validate
    def validate(self) -> Dict:
        cfg = self.cfg
        logging.info("validation...")
        self.evaluator.reset()
        self.time_val = []
        val_fwd_times = TimeAverageMeter()
        accum = jax.device_put(init_eval_accum(cfg), replicate_sharding(self.mesh))
        num_val = len(self.val_loader)

        start = time.time()
        for i, batch in enumerate(self.val_loader):
            self.time_val_dataloader.append(time.time() - start)
            db = self._device_batch(batch)
            t0 = time.time()
            preds, accum = self._eval_step(
                self.state.params, self.state.batch_stats, db, accum)
            # NOTE: on tunneled backends (axon) block_until_ready returns at
            # dispatch-ack, so this per-batch time can understate true device
            # latency; bench.py's device_get fence is the authoritative FPS.
            preds.block_until_ready()
            fwt = time.time() - t0
            val_fwd_times.update(fwt)
            if i != 0:  # skip warm-up batch (reference trainer.py:358-368)
                self.time_val.append(fwt)
                if i % cfg.val_print_freq == 0:
                    logging.info(
                        "val [%3d/%3d] BT (bsz=%d): %.3f(s) (BT/img: %.3f(s))",
                        i, num_val, cfg.val_batch_size, fwt,
                        sum(self.time_val) / len(self.time_val) / cfg.val_batch_size)
            if cfg.save_val_results:
                self.save_valid_img_in_results(
                    batch["left"], batch.get("label"), np.asarray(preds), i,
                    batch.get("frame_name"))
            start = time.time()

        host = jax.device_get(accum)
        n_b = max(float(host["n_batches"]), 1.0)
        self.evaluator.merge_device_batch(
            host["cm"], host["cm_weather_sem"], host["cm_weather"],
            weather_acc=float(host["weather_acc_sum"]) / n_b)

        score = self.evaluator.get_results()
        save_filename = self.saver.save_file_return()
        weather_acc = self.evaluator.get_weather_results(save_filename)
        self.performance_test(score, weather_acc, save_filename)

        if not cfg.test_only:
            self.save_checkpoints_sem(score)
            if cfg.train_semantic and cfg.dataset != "kitti_mix":
                if score["Mean IoU"] > self.best_score:
                    self.best_score = score["Mean IoU"]
                    self.best_score_epoch = self.cur_epochs
                    self.save_checkpoints_sem(score, is_best=True)
                logging.info("best score %s (epoch: %d)",
                             self.best_score, self.best_score_epoch)
        if self.time_val:
            logging.info("average fwd time per img: %.3f (s)",
                         sum(self.time_val) / len(self.time_val) / cfg.val_batch_size)
        return score

    def test(self) -> Dict:
        return self.validate()

    # ----------------------------------------------------------- checkpoints
    def save_checkpoints_sem(self, score, is_best: bool = False,
                             best_type: Optional[str] = None) -> None:
        name = "score_best_checkpoint" if is_best else "latest_checkpoint"
        self.ckpt.save(name, self.state, self.cur_epochs, score,
                       self.best_score, self.best_score_epoch)

    # -------------------------------------------------------------- reports
    def performance_test(self, val_score, weather_acc, save_filename) -> None:
        cfg = self.cfg
        logging.info("Validation:")
        if cfg.train_semantic and cfg.dataset != "kitti_mix":
            acc = self.evaluator.Pixel_Accuracy()
            acc_class = self.evaluator.Pixel_Accuracy_Class()
            miou = self.evaluator.Mean_Intersection_over_Union(save_filename)
            fwiou = self.evaluator.Frequency_Weighted_Intersection_over_Union()
            weather_miou = self.evaluator.Mean_Intersection_over_Union_each_weather(save_filename)
            if not cfg.test_only:
                self.writer.add_scalar("val/mIoU", miou, self.cur_epochs)
                self.writer.add_scalar("val/Acc", acc, self.cur_epochs)
                self.writer.add_scalar("val/Acc_class", acc_class, self.cur_epochs)
                self.writer.add_scalar("val/fwIoU", fwiou, self.cur_epochs)
                self.writer.add_scalar("val/Acc_weather", weather_acc, self.cur_epochs)
                for key, value in self.val_dst.weather_dict.items():
                    if str(value) in weather_miou:
                        self.writer.add_scalar("val/mIoU_" + key,
                                               weather_miou[str(value)], self.cur_epochs)
            logging.info(self.evaluator.to_str(val_score))
        else:
            miou = acc = 0.0
        self.saver.save_val_results_semantic(self.cur_epochs, miou, acc)
        if cfg.dataset == "acdc":
            logging.info("Epoch: [%d/%d] weather cls acc: %.4f / 1.0000",
                         self.cur_epochs, cfg.epochs, weather_acc)

    # ------------------------------------------------------------ viz dumps
    def save_valid_img_in_results(self, left, targets, preds, img_id,
                                  frame_names=None) -> None:
        """Prediction image dumps (reference ``trainer.py:494-595``). The
        reference's per-pixel python RGB→eval-id loop (``trainer.py:552-555``)
        becomes a vectorized LUT."""
        from PIL import Image

        cfg = self.cfg
        top = "results" + (f"_{cfg.weather_condition}" if cfg.weather_condition else "")
        root = os.path.join(self.saver.experiment_dir, top)
        name = (frame_names[0].split(".")[0].replace("*", "")
                if frame_names else f"{img_id}")

        img = np.asarray(left)[0]
        img = ((img - img.min()) / max(img.max() - img.min(), 1e-6) * 255).astype(np.uint8)
        pred_color = self.val_dst.decode_target(preds[0].copy()).astype(np.uint8)

        if cfg.save_each_results:
            for sub in ("left_image", "pred_sem", "overlay", "gray_pred_sem", "gt_sem"):
                os.makedirs(os.path.join(root, sub), exist_ok=True)
            Image.fromarray(img).save(os.path.join(root, "left_image", name + ".png"))
            Image.fromarray(pred_color).save(os.path.join(root, "pred_sem", name + ".png"))
            overlay = Image.blend(Image.fromarray(img),
                                  Image.fromarray(pred_color), alpha=0.7)
            overlay.save(os.path.join(root, "overlay", name + ".png"))
            # gray eval-id map via LUT (train id → eval id is identity except 19→255)
            gray = preds[0].astype(np.uint8)
            gray[preds[0] == 19] = 255
            Image.fromarray(gray).save(
                os.path.join(root, "gray_pred_sem", name + ".png"))
            if targets is not None and not cfg.use_test_data:
                tgt = self.val_dst.decode_target(
                    np.asarray(targets)[0].copy()).astype(np.uint8)
                Image.fromarray(tgt).save(os.path.join(root, "gt_sem", name + ".png"))
        else:
            os.makedirs(os.path.join(root, "overall"), exist_ok=True)
            pieces = [img, pred_color]
            if targets is not None and not cfg.use_test_data:
                pieces.insert(1, self.val_dst.decode_target(
                    np.asarray(targets)[0].copy()).astype(np.uint8))
            store = Image.fromarray(np.concatenate(pieces, axis=0))
            store.thumbnail((720, 720))
            store.save(os.path.join(root, "overall", f"{img_id}_overall.png"))
