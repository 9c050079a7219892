"""Logger + RNG seeding (reference ``utils/logger.py:13-49``, ``main.py:23-33``)."""

from __future__ import annotations

import logging
import os
import random
import sys
import time
from datetime import datetime
from typing import Optional

import numpy as np


def setup_logger(save_dir: Optional[str] = None, name_prefix: str = "run") -> logging.Logger:
    """Root logger to stdout + per-run logfile (reference ``utils/logger.py``)."""
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    for h in list(logger.handlers):
        logger.removeHandler(h)
    fmt = logging.Formatter("[%(asctime)s] %(message)s", datefmt="%m/%d %H:%M:%S")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(os.path.join(save_dir, f"{name_prefix}_{ts}_log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    # third-party INFO chatter (orbax serialization traces, absl) drowns the
    # training log — keep them at WARNING
    for noisy in ("orbax", "absl", "jax._src", "etils"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    return logger


def seed_all_rng(seed: Optional[int] = None) -> int:
    """Seed python/numpy RNGs (detectron2-style, reference ``logger.py:33-49``).
    JAX keys are derived explicitly from the returned seed — jax has no global
    RNG to seed."""
    if seed is None:
        seed = (os.getpid()
                + int(datetime.now().strftime("%S%f"))
                + int.from_bytes(os.urandom(2), "big"))
    np.random.seed(seed % (2 ** 31))
    random.seed(seed)
    return seed
