"""Train-step mechanics: optimization decreases loss, frozen groups stay
frozen, checkpoints roundtrip, cosine schedule endpoints."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from doubly_contrastive_semseg_tpu.config import parse_args  # noqa: E402
from doubly_contrastive_semseg_tpu.models import build_model  # noqa: E402
from doubly_contrastive_semseg_tpu.train.checkpoints import CheckpointManager  # noqa: E402
from doubly_contrastive_semseg_tpu.train.optimizer import (  # noqa: E402
    build_optimizer,
    cosine_annealing_schedule,
)
from doubly_contrastive_semseg_tpu.train.state import TrainState, create_train_state  # noqa: E402
from doubly_contrastive_semseg_tpu.train.steps import make_train_step  # noqa: E402
from doubly_contrastive_semseg_tpu.utils import label_params_for_optimizer  # noqa: E402


def _tiny_cfg(criterion="plain_focal"):
    return parse_args([
        "--dataset", "synthetic", "--train_semantic", "--criterion", criterion,
        "--batch_size", "2", "--compute_dtype", "float32",
        "--no_use_balanced_weights", "--lr", "1e-3",
        # remat doubles CPU compile+run time and its exact semantics are
        # covered by test_train_oracle; mechanics tests skip it
        "--no_efficient",
    ])


def _tiny_batch(cfg, s=32, b=2, seed=0):
    rng = np.random.default_rng(seed)
    n_img = 2 * b if cfg.use_supcon else b
    return {
        "left": jnp.asarray(rng.uniform(0, 255, (n_img, s, s, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 19, (b, s, s))),
        "label_distance_weight": jnp.asarray(rng.uniform(0.1, 1, (b, s, s)).astype(np.float32)),
        "weather": jnp.asarray(rng.integers(0, 4, (b,))),
        "class_weight": jnp.ones((19,), jnp.float32),
    }


class _NullTx:
    def init(self, params):
        return ()


def _make_state(cfg, batch):
    model = build_model(cfg)
    tmp = create_train_state(model, cfg, _NullTx(), batch, jax.random.PRNGKey(0))
    labels = label_params_for_optimizer(tmp.params, cfg)
    tx = build_optimizer(cfg, labels, steps_per_epoch=4)
    state = TrainState(params=tmp.params, batch_stats=tmp.batch_stats,
                       opt_state=tx.init(tmp.params), step=tmp.step)
    return model, tx, state, labels


def test_train_step_optimizes_and_respects_frozen_groups():
    """ONE compiled doubly-contrastive train step proves both mechanics:
    the loss decreases over iterations, AND the reference's frozen groups
    stay untouched — weather_clf, projection head and the seg head never
    reach the ADAM optimizer (init_trainer.py:160-177 + weathernet.py:100-102,
    which drops self.segmentation from random_init_params).
    --train_seg_head opts the head back in (label-level check)."""
    cfg = _tiny_cfg("supcon_pixelcontrast_focal")
    batch = _tiny_batch(cfg)
    model, tx, state, labels = _make_state(cfg, batch)
    assert set(jax.tree_util.tree_leaves(labels)) >= {"fine_tune", "random_init", "frozen"}
    step = jax.jit(make_train_step(model, cfg, tx))
    before_clf = jax.tree_util.tree_map(np.asarray, state.params["weather_clf"])
    before_proj = jax.tree_util.tree_map(np.asarray, state.params["projection"])
    before_seg = np.asarray(
        state.params["net"]["segmentation"]["conv"]["kernel"]).copy()
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    after_clf = state.params["weather_clf"]
    after_proj = state.params["projection"]
    for b, a in zip(jax.tree_util.tree_leaves(before_clf),
                    jax.tree_util.tree_leaves(after_clf)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    for b, a in zip(jax.tree_util.tree_leaves(before_proj),
                    jax.tree_util.tree_leaves(after_proj)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # the seg head is frozen under ADAM by default, exactly like the reference
    np.testing.assert_array_equal(
        before_seg, np.asarray(state.params["net"]["segmentation"]["conv"]["kernel"]))

    # ... and is labeled back into the optimized group via --train_seg_head
    # (label check only — the optimizer honoring labels is proven above)
    cfg.train_seg_head = True
    labels2 = label_params_for_optimizer(state.params, cfg)
    assert labels2["net"]["segmentation"]["conv"]["kernel"] == "random_init"
    assert labels["net"]["segmentation"]["conv"]["kernel"] == "frozen"
    # SGD policy: the head lands in the lr x 10 'semantic' group via the
    # reference's name filter — but ONLY with --train_semantic
    # (init_trainer.py:149-156); without it the head is in NO group. The
    # backbone (decoder included) is all 'base' at lr x 1.
    cfg.train_seg_head = False
    cfg.optimizer_policy = "SGD"
    labels3 = label_params_for_optimizer(state.params, cfg)
    assert labels3["net"]["segmentation"]["conv"]["kernel"] == "sgd_semantic"
    fe3 = labels3["net"]["feature_extractor"]
    assert fe3["layer1_0"]["conv1"]["kernel"] == "sgd_base"
    assert set(jax.tree_util.tree_leaves(fe3)) == {"sgd_base"}
    cfg.train_semantic = False
    labels4 = label_params_for_optimizer(state.params, cfg)
    assert labels4["net"]["segmentation"]["conv"]["kernel"] == "frozen"
    cfg.train_semantic = True
    cfg.optimizer_policy = "ADAM"


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    tx = optax.adam(1e-3)
    state = TrainState(params=params, batch_stats={"bn": jnp.ones((3,))},
                       opt_state=tx.init(params), step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("latest_checkpoint", state, epoch=3,
             score={"Mean IoU": 0.5}, best_score=0.5, best_score_epoch=3)

    fresh = TrainState(params={"w": jnp.zeros((2, 3))},
                       batch_stats={"bn": jnp.zeros((3,))},
                       opt_state=tx.init(params), step=jnp.asarray(0, jnp.int32))
    restored, meta = mgr.restore(str(tmp_path / "latest_checkpoint"), fresh,
                                 continue_training=True)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(6, dtype=np.float32).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(restored.batch_stats["bn"]), np.ones(3))
    assert int(restored.step) == 7
    assert meta["epoch"] == 3 and meta["best_score"] == 0.5

    # plain weight restore keeps fresh counters (continue_training=False)
    restored2, _ = mgr.restore(str(tmp_path / "latest_checkpoint"), fresh,
                               continue_training=False)
    assert int(restored2.step) == 0


def test_cosine_annealing_endpoints():
    sched = cosine_annealing_schedule(4e-4, 1e-6, epochs=400, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(4e-4)
    assert float(sched(400 * 10)) == pytest.approx(1e-6, abs=1e-9)
    mid = float(sched(200 * 10))
    assert 1e-6 < mid < 4e-4
    # constant within an epoch (torch steps the scheduler per epoch)
    assert float(sched(5)) == float(sched(9))
