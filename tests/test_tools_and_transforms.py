"""Aux tools (t-SNE) + photometric transforms + hourglass variant +
in-process validate loop."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from doubly_contrastive_semseg_tpu.config import parse_args  # noqa: E402
from doubly_contrastive_semseg_tpu.data import ColorJitter, RandomHorizontalFlip  # noqa: E402


def _sample(h=32, w=40, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "left": Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)),
        "label": Image.fromarray(rng.integers(0, 5, (h, w)).astype(np.uint8)),
    }


def test_color_jitter_changes_image_only():
    s = _sample()
    before = np.array(s["left"]).copy()
    lbl_before = np.array(s["label"]).copy()
    out = ColorJitter(brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1,
                      rng=np.random.default_rng(1))(s)
    assert not np.array_equal(np.array(out["left"]), before)
    np.testing.assert_array_equal(np.array(out["label"]), lbl_before)


def test_horizontal_flip_pairs_image_and_label():
    s = _sample()
    img = np.array(s["left"]).copy()
    lbl = np.array(s["label"]).copy()
    out = RandomHorizontalFlip(p=1.0)(s)
    np.testing.assert_array_equal(np.array(out["left"]), img[:, ::-1])
    np.testing.assert_array_equal(np.array(out["label"]), lbl[:, ::-1])


@pytest.mark.slow
def test_hourglass_swiftnet(rng):
    from doubly_contrastive_semseg_tpu.models.swiftnet_single import HourglassSwiftNet

    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    m = HourglassSwiftNet(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (1, 16, 16, 128)


def test_tsne_tool_runs(tmp_path):
    from doubly_contrastive_semseg_tpu.tools.tsne import Viz

    cfg = parse_args(["--dataset", "synthetic", "--criterion", "none",
                      "--train_semantic", "--debug", "--compute_dtype", "float32",
                      "--no_efficient",
                      "--run_root", str(tmp_path), "--batch_size", "4"])
    viz = Viz(cfg)
    out = viz.run(mode="image")
    import os

    assert os.path.isfile(out)


def test_trainer_validate_in_process(tmp_path):
    """Drive Trainer.validate directly: the on-device accumulators must land
    in the Evaluator and produce a coherent score dict."""
    from doubly_contrastive_semseg_tpu.train import Trainer

    cfg = parse_args(["--dataset", "synthetic", "--criterion", "none",
                      "--train_semantic", "--debug", "--compute_dtype", "float32",
                      "--no_efficient", "--batch_size", "2", "--val_batch_size", "2",
                      "--run_root", str(tmp_path), "--epochs", "1"])
    tr = Trainer(cfg)
    score = tr.validate()
    assert 0.0 <= score["Mean IoU"] <= 1.0
    assert tr.evaluator.confusion_matrix.sum() > 0
    # per-weather matrices decompose the overall matrix
    np.testing.assert_allclose(
        tr.evaluator.confusion_matrix_sem_weather.sum(0),
        tr.evaluator.confusion_matrix)
    # checkpoints written (latest; best too since first validate improves 0.0)
    import os

    ckpts = os.listdir(tr.saver.checkpoint_dir)
    assert any("latest_checkpoint" in c for c in ckpts)


def test_wandb_bridge_with_stub(tmp_path, monkeypatch):
    """Exercise the wandb mirror path (reference main.py:13-16) with a stub
    module — the real package is absent in this image, so without this the
    bridge would ship forever-untested."""
    import sys
    import types

    calls = {"init": [], "log": []}
    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: calls["init"].append(kw)
    stub.log = lambda d: calls["log"].append(d)
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from doubly_contrastive_semseg_tpu.utils.summaries import SummaryWriter

    w = SummaryWriter(str(tmp_path), enable_tb=False)
    w.init_wandb("dcss-test")
    w.add_scalar("train/total_loss", 1.25, step=3)
    w.close()

    assert calls["init"] == [{"project": "dcss-test", "sync_tensorboard": True}]
    assert calls["log"] == [{"train/total_loss": 1.25}]
    # jsonl sink wrote the same scalar
    import json as _json
    rows = [_json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[-1]["tag"] == "train/total_loss" and rows[-1]["value"] == 1.25
