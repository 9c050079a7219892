"""Grain-backed data loader (optional, ``--loader grain``).

A drop-in alternative to the threaded ``data/loader.py`` built on Google
Grain — the TPU-ecosystem input pipeline with *checkpointable, deterministic*
iterators: the iterator's position serializes with the training state, so a
preempted run resumes mid-epoch without replaying or skipping samples
(the reference's torch DataLoader and our threaded loader both restart the
epoch). Same interface as ``DataLoader``: ``__len__``, ``set_epoch``,
iteration yielding collated numpy batches (two-crop pairs concatenated on the
batch axis, ``loader.py::collate``).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from .loader import collate


class _StableSource:
    """Delegating wrapper with a content-stable ``__repr__``.

    Grain embeds ``repr(data_source)`` in the serialized iterator state and
    refuses to restore on mismatch; the default object repr contains the
    memory address, which would make every mid-epoch resume (a NEW process by
    definition) fail validation."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __getitem__(self, i):
        return self._dataset[i]

    def __len__(self):
        return len(self._dataset)

    def __repr__(self):
        return f"{type(self._dataset).__name__}(len={len(self._dataset)})"


class GrainDataLoader:
    """Map-style dataset → grain sampler/operations pipeline."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False,
                 seed: int = 0, prefetch: int = 2):
        import grain.python as grain

        self._grain = grain
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.num_workers = num_workers
        self._last_iter = None
        self._pending_state: Optional[bytes] = None

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict]:
        # grain batches by stacking leaves; our samples are dicts of PIL /
        # arrays with two-crop tuples — batch manually from record iterator
        grain = self._grain
        sampler = grain.IndexSampler(
            num_records=len(self.dataset),
            shard_options=grain.NoSharding(),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed * 1_000_003 + self.epoch,
        )
        loader = grain.DataLoader(data_source=_StableSource(self.dataset),
                                  sampler=sampler, operations=[],
                                  worker_count=self.num_workers)
        it = iter(loader)
        if self._pending_state is not None:
            # mid-epoch resume: fast-forward to the checkpointed position
            # (requires the same epoch/seed, which set_epoch restores)
            it.set_state(self._pending_state)
            self._pending_state = None
        self._last_iter = it
        buf = []
        for rec in it:
            buf.append(rec)
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield collate(buf)

    # --- checkpointable-iterator surface (grain's headline feature) -------
    def get_state(self) -> Optional[bytes]:
        """Serialized mid-epoch position of the live iterator."""
        if self._last_iter is not None and hasattr(self._last_iter, "get_state"):
            return self._last_iter.get_state()
        return None

    def set_state(self, state: bytes) -> None:
        """Defer the position to the next ``__iter__``.

        The checkpoint-restore path runs before the epoch loop constructs
        its iterator; applying the state to an already-live iterator here
        would target the wrong one (e.g. the abandoned model-init sample
        iterator) and the restored position would be silently discarded
        when the epoch loop starts a fresh iterator."""
        self._pending_state = state


def make_loader(kind: str, dataset, batch_size: int, **kw):
    """Loader factory: 'thread' (default, reference-like prefetching pool) or
    'grain' (deterministic + checkpointable)."""
    if kind == "grain":
        return GrainDataLoader(dataset, batch_size, **kw)
    from .loader import DataLoader

    return DataLoader(dataset, batch_size, **kw)
