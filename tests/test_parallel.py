"""Multi-device semantics on the 8-device CPU mesh: sharding placement and
exact 1-device vs 8-device parity of the train step (data parallelism +
cross-replica BN fall out of GSPMD — SURVEY.md §2.6)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.parallel import (  # noqa: E402
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)
from tests.test_train import _make_state, _tiny_batch, _tiny_cfg  # noqa: E402

from doubly_contrastive_semseg_tpu.train.steps import make_train_step  # noqa: E402


def test_mesh_and_shard_batch():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(8)
    batch = {
        "left": np.ones((8, 16, 16, 3), np.float32),
        "label": np.ones((8, 16, 16), np.int64),
        "weather": np.ones((8,), np.int32),
        "frame_name": ["x"] * 8,  # metadata must be skipped
    }
    db = shard_batch(batch, mesh)
    assert "frame_name" not in db
    # batch axis split across all 8 devices
    assert len(db["left"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in db["left"].addressable_shards}
    assert shard_shapes == {(1, 16, 16, 3)}


def test_train_step_parity_single_vs_8dev():
    """Same init + same global batch → bitwise-close loss whether the batch
    lives on 1 device or is sharded over 8. Proves the mesh path computes
    global-batch semantics (incl. BatchNorm moments) like single-device."""
    cfg = _tiny_cfg("plain_focal")
    batch = _tiny_batch(cfg, s=32, b=8)
    model, tx, state, _ = _make_state(cfg, batch)
    step = jax.jit(make_train_step(model, cfg, tx))

    # single device
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    loss_1dev = float(m1["total_loss"])

    # 8-device mesh: shard batch, replicate state
    mesh = make_mesh(8)
    db = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    db["class_weight"] = jax.device_put(batch["class_weight"], replicate_sharding(mesh))
    state8 = jax.device_put(state, replicate_sharding(mesh))
    s8, m8 = step(state8, db, jax.random.PRNGKey(1))
    loss_8dev = float(m8["total_loss"])

    np.testing.assert_allclose(loss_8dev, loss_1dev, rtol=1e-5)
    # updated params agree too (grad all-reduce == single-device grad)
    p1 = np.asarray(s1.params["net"]["segmentation"]["conv"]["kernel"])
    p8 = np.asarray(s8.params["net"]["segmentation"]["conv"]["kernel"])
    np.testing.assert_allclose(p1, p8, rtol=1e-4, atol=1e-6)
