"""Visualizer (reference ``utils/visualizer.py``): same call surface, file
fallback on hosts without a Visdom server (i.e. every TPU worker)."""

import json
import os

import numpy as np

from doubly_contrastive_semseg_tpu.utils.visualizer import Visualizer


def test_visualizer_file_fallback(tmp_path):
    vis = Visualizer(port=1, env="main", id="exp0", log_dir=str(tmp_path))
    assert vis.vis is None  # no visdom in the image -> file backend

    vis.vis_scalar("loss", 0, 1.5)
    vis.vis_scalar("loss", [1, 2], [1.2, 1.1])
    lines = [json.loads(l) for l in
             (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert [l["y"] for l in lines] == [1.5, 1.2, 1.1]
    assert lines[0]["name"] == "[exp0]loss"  # reference's id-prefix rule

    # CHW uint8 (the reference's tensor layout) and HWC both land as PNGs
    vis.vis_image("pred", np.zeros((3, 8, 8), np.uint8))
    vis.vis_image("pred", np.zeros((8, 8, 3), np.uint8))
    pngs = sorted(p for p in os.listdir(tmp_path) if p.endswith(".png"))
    assert len(pngs) == 2 and pngs[0] != pngs[1]  # window reuse -> new step

    vis.vis_table("opts", {"lr": 214, "momentum": 0.9})
    tbl = json.loads((tmp_path / "tables.jsonl").read_text())
    assert tbl["table"] == {"lr": 214, "momentum": 0.9}
