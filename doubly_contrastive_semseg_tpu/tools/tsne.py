"""t-SNE feature visualization (reference ``utils/tsne.py:45-245``).

Collects the model's contrast features over the train loader and renders a
2-D t-SNE scatter colored by weather (image mode) or semantic class (pixel
mode). The reference's per-pixel triple python loop (``tsne.py:106-116``)
becomes a vectorized strided subsample.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np


class Viz:
    def __init__(self, cfg):
        from ..data import DataLoader, get_dataset
        from ..models import build_model
        from ..utils import Saver, setup_logger

        self.cfg = cfg
        self.saver = Saver(cfg)
        setup_logger(self.saver.experiment_dir, "tsne")
        self.train_dst, _ = get_dataset(cfg, seed=cfg.random_seed)
        self.loader = DataLoader(self.train_dst, cfg.batch_size, shuffle=False,
                                 num_workers=cfg.num_workers)
        self.model = build_model(cfg)
        self.variables = None

    def _init_or_restore(self, sample_left):
        import jax

        variables = self.model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            sample_left, train=False)
        if self.cfg.resume:
            from ..train.checkpoints import CheckpointManager
            from ..train.state import TrainState
            import jax.numpy as jnp

            state = TrainState(params=variables["params"],
                               batch_stats=variables.get("batch_stats", {}),
                               opt_state=(), step=jnp.zeros((), jnp.int32))
            mgr = CheckpointManager(os.path.dirname(self.cfg.resume))
            state, _ = mgr.restore(self.cfg.resume, state)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
        return variables

    def get_features(self, mode: str = "image", max_batches: int = 16,
                     pixels_per_image: int = 256):
        """(features (N, D), labels (N,)) — image mode: GAP per image labeled
        by weather; pixel mode: strided pixel features labeled by class."""
        import jax
        import jax.numpy as jnp

        feats_out, labels_out = [], []

        @jax.jit
        def forward(variables, left):
            out = self.model.apply(variables, left, train=False)
            return out["fine_feat0"]

        for i, batch in enumerate(self.loader):
            if i >= max_batches:
                break
            left = jnp.asarray(batch["left"])
            if self.variables is None:
                self.variables = self._init_or_restore(left)
            f = np.asarray(forward(self.variables, left))  # (B, h, w, D)
            if mode == "image":
                feats_out.append(f.mean(axis=(1, 2)))
                labels_out.append(np.asarray(batch["weather"]).reshape(-1))
            else:
                lbl = np.asarray(batch["label"])
                b, h, w, d = f.shape
                # vectorized strided subsample instead of tsne.py:106-116 loops
                stride = max(1, int(np.sqrt(h * w / pixels_per_image)))
                fs = f[:, ::stride, ::stride, :].reshape(-1, d)
                ls = lbl[:, ::stride * 4, ::stride * 4].reshape(-1)[: fs.shape[0]]
                keep = ls != 255
                feats_out.append(fs[keep])
                labels_out.append(ls[keep])
        return np.concatenate(feats_out), np.concatenate(labels_out)

    def run(self, mode: Optional[str] = None) -> str:
        from sklearn.manifold import TSNE
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mode = mode or ("image" if self.cfg.use_supcon else "pixel")
        feats, labels = self.get_features(mode=mode)
        logging.info("t-SNE over %d features (%s mode)", len(feats), mode)
        emb = TSNE(n_components=2, init="pca",
                   perplexity=min(30, max(2, len(feats) // 4))).fit_transform(feats)
        plt.figure(figsize=(8, 8))
        sc = plt.scatter(emb[:, 0], emb[:, 1], c=labels, s=4, cmap="tab20")
        plt.colorbar(sc)
        plt.title(f"t-SNE ({mode}) — {self.cfg.model}/{self.cfg.dataset}")
        out = os.path.join(self.saver.experiment_dir, "tsne.png")
        plt.savefig(out, dpi=150, bbox_inches="tight")
        plt.close()
        logging.info("saved %s", out)
        return out
