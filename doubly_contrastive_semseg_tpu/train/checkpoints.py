"""Orbax checkpointing with the reference's save/restore policy.

Reference (``trainer.py:392-421``, ``utils/saver.py:45-70``,
``utils/init_trainer.py:242-281``): ``latest`` saved every validation,
``score_best`` when val mIoU improves; restore supports plain weight loading
or full ``--continue_training`` (epoch, iteration, optimizer, best score),
tolerant of partially-matching key sets (``strict=False`` analog: pytree
intersection by path)."""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _meta(epoch: int, state: TrainState, score: Optional[Dict], best_score: float,
          best_score_epoch: int, mid_epoch: bool) -> Dict:
    return {
        "epoch": int(epoch),
        "num_iter": int(state.step),
        "score": {k: float(v) for k, v in (score or {}).items() if k != "Class IoU"},
        "best_score": float(best_score),
        "best_score_epoch": int(best_score_epoch),
        "mid_epoch": bool(mid_epoch),
    }


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: TrainState, epoch: int,
             score: Optional[Dict] = None, best_score: float = 0.0,
             best_score_epoch: int = -1,
             loader_state: Optional[bytes] = None) -> None:
        """``loader_state``: serialized grain-iterator position — present makes
        this a MID-epoch checkpoint that resumes at the exact batch (the
        threaded loader and the reference's torch DataLoader both restart the
        epoch; grain's checkpointable iterator is why ``--loader grain``
        exists)."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        path = self._path(name)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        # meta sidecar (epoch/score/best bookkeeping — reference trainer.py:413-421).
        # orbax's save is a collective every process must enter, but the
        # sidecars live on a shared filesystem: only process 0 writes them
        # (concurrent identical writes could still interleave).
        import jax

        if jax.process_index() != 0:
            return
        import json

        with open(path + ".meta.json", "w") as f:
            json.dump(_meta(epoch, state, score, best_score, best_score_epoch,
                            mid_epoch=loader_state is not None), f)
        ls_path = path + ".loader_state"
        if loader_state is not None:
            with open(ls_path, "wb") as f:
                f.write(loader_state)
        elif os.path.exists(ls_path):
            os.remove(ls_path)  # stale mid-epoch state from a prior rescue

    def restore(self, path: str, state: TrainState,
                continue_training: bool = False) -> Tuple[TrainState, Dict]:
        """Partial-load tolerant restore: only paths present in both trees are
        taken from the checkpoint (reference ``init_trainer.py:258-281``)."""
        import json

        path = os.path.abspath(path)
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        try:
            loaded = self._ckptr.restore(path, template)
        except Exception:
            logging.warning("strict restore failed; merging by path from %s", path)
            raw = ocp.PyTreeCheckpointer().restore(path)
            loaded = _merge_by_path(template, raw)
        meta: Dict = {}
        if os.path.isfile(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        if continue_training and os.path.isfile(path + ".loader_state"):
            with open(path + ".loader_state", "rb") as f:
                meta["loader_state"] = f.read()
        new_state = state.replace(
            params=loaded["params"],
            batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"] if continue_training else state.opt_state,
            step=loaded["step"] if continue_training else state.step,
        )
        return new_state, meta


def _merge_by_path(template, raw):
    """Take checkpoint values where the path exists and shapes match."""

    def merge(t, r):
        if isinstance(t, dict) and isinstance(r, dict):
            return {k: merge(t[k], r[k]) if k in r else t[k] for k in t}
        t_arr = np.asarray(t) if not hasattr(t, "shape") else t
        if r is not None and hasattr(r, "shape") and r.shape == t_arr.shape:
            return r
        return t

    return merge(template, raw)
