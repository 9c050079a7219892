"""Metrics writer: TensorBoard when available, JSONL always.

Reference ``utils/summaries.py:8-84`` (TensorboardSummary) + the optional
wandb mirror (``main.py:13-16``). wandb is not in this image, so the bridge
is gated; every scalar also lands in ``metrics.jsonl`` so runs are parseable
without TB."""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class SummaryWriter:
    def __init__(self, log_dir: str, enable_tb: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter as TBWriter

                self._tb = TBWriter(log_dir=log_dir)
            except Exception:
                self._tb = None
        self._wandb = None

    def init_wandb(self, project: Optional[str]) -> None:
        """wandb mirror (reference ``main.py:13-16``); silently off when the
        package is missing (zero-egress image)."""
        if project is None:
            return
        try:
            import wandb

            wandb.init(project=project, sync_tensorboard=True)
            self._wandb = wandb
        except Exception:
            self._wandb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": value, "step": int(step), "ts": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        if self._wandb is not None:
            self._wandb.log({tag: value})

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
