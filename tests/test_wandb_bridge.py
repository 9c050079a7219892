"""The wandb mirror (reference ``main.py:13-16``) gated behind a package
that is absent from this image — exercised here with a stubbed ``wandb``
module so the bridge's actual code paths run."""

import sys
import types

from doubly_contrastive_semseg_tpu.utils.summaries import SummaryWriter


class _StubWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.init_calls = []
        self.logged = []

    def init(self, **kwargs):
        self.init_calls.append(kwargs)

    def log(self, d):
        self.logged.append(dict(d))


def test_wandb_scalars_mirrored(tmp_path, monkeypatch):
    stub = _StubWandb()
    monkeypatch.setitem(sys.modules, "wandb", stub)

    w = SummaryWriter(str(tmp_path), enable_tb=False)
    w.init_wandb("my-project")
    assert stub.init_calls == [
        {"project": "my-project", "sync_tensorboard": True}]

    w.add_scalar("train/total_loss_print_freq", 1.5, 3)
    w.add_scalar("val/mIoU", 0.25, 4)
    w.close()
    assert stub.logged == [{"train/total_loss_print_freq": 1.5},
                           {"val/mIoU": 0.25}]


def test_wandb_none_project_is_off(tmp_path, monkeypatch):
    stub = _StubWandb()
    monkeypatch.setitem(sys.modules, "wandb", stub)
    w = SummaryWriter(str(tmp_path), enable_tb=False)
    w.init_wandb(None)  # reference only inits when --wandb is given
    w.add_scalar("x", 1.0, 0)
    w.close()
    assert stub.init_calls == [] and stub.logged == []


def test_wandb_init_failure_degrades_silently(tmp_path, monkeypatch):
    stub = _StubWandb()

    def boom(**kwargs):
        raise RuntimeError("no network")

    stub.init = boom
    monkeypatch.setitem(sys.modules, "wandb", stub)
    w = SummaryWriter(str(tmp_path), enable_tb=False)
    w.init_wandb("p")  # must not raise
    w.add_scalar("x", 1.0, 0)  # must not try to mirror
    w.close()
    assert stub.logged == []
