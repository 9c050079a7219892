"""Train state pytree: params + BN running stats + optimizer state.

Replaces the reference's scattered mutable state (``model.state_dict()``,
``optimizer.state_dict()``, epoch counters on the Trainer) with one
functional pytree that flows through the jitted step and checkpointing."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # global iteration counter (num_iter in the reference)

    def replace_step(self, step):
        return self.replace(step=jnp.asarray(step, jnp.int32))


def create_train_state(model, cfg, tx: optax.GradientTransformation,
                       sample_batch, rng) -> TrainState:
    k_params, k_drop = jax.random.split(rng)
    # jit the init: eager flax init dispatches every initializer op
    # individually (~20s of Python/dispatch overhead for the pyramid on a
    # 1-core host); one traced+compiled program is ~4x faster and identical
    init_fn = jax.jit(model.init, static_argnames=("train",
                                                   "return_supcon_feature"))
    variables = init_fn(
        {"params": k_params, "dropout": k_drop}, sample_batch["left"],
        train=True, return_supcon_feature=cfg.use_supcon,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def init_state_and_optimizer(model, cfg, sample_batch, rng, steps_per_epoch):
    """Two-phase init in one place: params first (optimizer param-group
    labels need their tree structure, utils/params.py), then the per-group
    optimizer, then the final TrainState. Returns (state, tx)."""
    from ..utils import label_params_for_optimizer
    from .optimizer import build_optimizer

    class _NullTx:
        def init(self, params):
            return ()

    tmp = create_train_state(model, cfg, _NullTx(), sample_batch, rng)
    labels = label_params_for_optimizer(tmp.params, cfg)
    tx = build_optimizer(cfg, labels, steps_per_epoch)
    state = TrainState(params=tmp.params, batch_stats=tmp.batch_stats,
                       opt_state=tx.init(tmp.params), step=tmp.step)
    return state, tx
