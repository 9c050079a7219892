"""Optimizer + LR schedule (reference ``utils/init_trainer.py:127-177,299-306``).

ADAM policy (the published recipe, ``scripts/train_weather.sh``): two
parameter groups —
  random_init (decoder bottlenecks/blends + seg head): lr,   weight_decay
  fine_tune   (ImageNet trunk):                        lr/4, weight_decay/4
with betas (0.9, 0.99) and torch-style L2 (decay added to the gradient
*before* the Adam moments, matching ``torch.optim.Adam(weight_decay=...)``).
The weather classifier and SupCon projection head are 'frozen' by default —
the reference never registers them with an optimizer (see
``utils/params.py``).

LR: cosine annealing per *epoch* from lr to last_lr over ``epochs``
(``torch.optim.lr_scheduler.CosineAnnealingLR``, ``init_trainer.py:299-306``).
SGD policy keeps the reference's 4-group layout (×0.1 specific, ×1 base,
×10 semantic head) for the legacy recipes.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax


def cosine_annealing_schedule(base_lr: float, last_lr: float, epochs: int,
                              steps_per_epoch: int) -> Callable:
    """torch CosineAnnealingLR stepped once per epoch:
    lr(e) = last + 0.5 (base - last) (1 + cos(π e / T))."""

    def schedule(step):
        epoch = jnp.floor_divide(step, max(steps_per_epoch, 1))
        t = jnp.minimum(epoch, epochs).astype(jnp.float32)
        return last_lr + 0.5 * (base_lr - last_lr) * (1 + jnp.cos(math.pi * t / epochs))

    return schedule


def build_lr_schedule(cfg, steps_per_epoch: int, base_lr: float | None = None) -> Callable:
    """The reference's ``--lr_policy`` family: the active ``cos_annealing``
    (``init_trainer.py:299-306``) plus the in-repo poly/step/cos variants
    (``utils/lr_scheduler.py:6-125``, ``utils/scheduler.py:3-12``).

    ``base_lr`` is the *group's* initial lr. torch ``CosineAnnealingLR`` reads
    each param group's own initial lr as the cosine ceiling but anneals every
    group to the SAME ``eta_min = last_lr`` (``init_trainer.py:301-306``) —
    so the fine-tune group runs lr/4 → last_lr, NOT (lr → last_lr)/4."""
    policy = cfg.lr_policy
    lr = cfg.lr if base_lr is None else base_lr
    if policy == "cos_annealing":
        return cosine_annealing_schedule(lr, cfg.last_lr, cfg.epochs,
                                         steps_per_epoch)
    total_steps = max(1, cfg.epochs * steps_per_epoch)
    if policy == "poly":
        def poly(step):
            t = jnp.minimum(step, total_steps).astype(jnp.float32)
            return lr * (1.0 - t / total_steps) ** 0.9
        return poly
    if policy == "step":
        def step_sched(step):
            k = jnp.floor_divide(step, max(cfg.step_size, 1)).astype(jnp.float32)
            return lr * (0.1 ** k)
        return step_sched
    if policy in ("cos", "cos_step"):
        def cos(step):
            t = jnp.minimum(step, total_steps).astype(jnp.float32)
            return 0.5 * lr * (1 + jnp.cos(math.pi * t / total_steps))
        return cos
    raise NotImplementedError(policy)


def _adam_group(lr_schedule: Callable, weight_decay: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),  # torch Adam L2-into-grad
        optax.scale_by_adam(b1=0.9, b2=0.99),
        optax.scale_by_learning_rate(lr_schedule),
    )


def _sgd_group(lr_schedule: Callable, weight_decay: float) -> optax.GradientTransformation:
    # torch.optim.SGD(momentum=0.9): d_p = g + wd*p; buf = 0.9*buf + d_p;
    # p -= lr*buf — decay-into-grad BEFORE the momentum buffer, no dampening.
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=0.9),
        optax.scale_by_learning_rate(lr_schedule),
    )


def build_optimizer(cfg, param_labels, steps_per_epoch: int) -> optax.GradientTransformation:
    def sched(group_base_lr):
        return build_lr_schedule(cfg, steps_per_epoch, base_lr=group_base_lr)

    if cfg.optimizer_policy == "ADAM":
        fine_tune_factor = 4.0
        transforms = {
            "random_init": _adam_group(sched(cfg.lr), cfg.weight_decay),
            "fine_tune": _adam_group(sched(cfg.lr / fine_tune_factor),
                                     cfg.weight_decay / fine_tune_factor),
            "frozen": optax.set_to_zero(),
        }
    elif cfg.optimizer_policy == "SGD":
        # Reference 4-group layout (init_trainer.py:127-159): offset convs at
        # lr x 0.1, the seg head at lr x 10 (only with --train_semantic; see
        # utils/params.py), everything else — including the ENTIRE
        # 'feature_extractor', decoder and all — at lr x 1. Weight decay is
        # the optimizer-level default, identical for every group.
        transforms = {
            "sgd_specific": _sgd_group(sched(cfg.lr * 0.1), cfg.weight_decay),
            "sgd_base": _sgd_group(sched(cfg.lr), cfg.weight_decay),
            "sgd_semantic": _sgd_group(sched(cfg.lr * 10.0), cfg.weight_decay),
            "frozen": optax.set_to_zero(),
        }
    else:
        raise NotImplementedError(cfg.optimizer_policy)
    return optax.multi_transform(transforms, param_labels)
