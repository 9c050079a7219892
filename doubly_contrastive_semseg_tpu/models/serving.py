"""Inference/serving entry points.

``make_serving_fn`` builds the fastest correct image→label-map function for a
model: for the SwiftNet family it bypasses the generic seg-head + upsample
graph and feeds the decoder features straight into the fused Pallas serving
head (``ops/seghead_pallas.py``), which computes BN→ReLU→1×1 conv →
×4 bilinear → argmax in one pass. Other model families fall back to the
planar upsample+argmax path.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..ops.input_pipeline import upsample4x_argmax
from ..ops.seghead_pallas import fused_seghead_upsample_argmax


def make_serving_fn(model, use_pallas_head: bool = True) -> Callable:
    """Returns fn(variables, image) -> (B, H, W) int8 label map (19 classes
    fit; int8 quarters the full-res output traffic vs int32)."""
    from .weathernet import DCSSModel

    # only DCSSModel carries the net/segmentation BNReluConv head the fused
    # kernel reads (a hasattr-"backbone" test also matched DeepLabDCSS,
    # whose param tree has no 'net' — KeyError instead of the fallback)
    is_weathernet = isinstance(model, DCSSModel)
    if jax.default_backend() == "cpu":
        use_pallas_head = False  # Mosaic kernels don't lower on CPU

    def serve(variables, image):
        out = model.apply(variables, image, train=False)
        if is_weathernet and use_pallas_head and out["fine_feat"].shape[1] >= 10:
            # the fused head pads any feature height up to whole tiles, so
            # both the 2048×1024 headline and 1920×1080 ACDC-native (270
            # feature rows) shapes take this path
            seg_p = variables["params"]["net"]["segmentation"]
            seg_s = variables["batch_stats"]["net"]["segmentation"]
            return fused_seghead_upsample_argmax(
                out["fine_feat"],
                seg_p["norm"]["scale"], seg_p["norm"]["bias"],
                seg_s["norm"]["mean"], seg_s["norm"]["var"],
                seg_p["conv"]["kernel"], seg_p["conv"]["bias"],
            )
        if out["seg_beforeup"].shape[1] * 4 == out["seg"].shape[1]:
            return upsample4x_argmax(out["seg_beforeup"]).astype(jnp.int8)
        return jnp.argmax(out["seg"], axis=-1).astype(jnp.int8)

    return serve


def make_stereo_serving_fn(model, use_pallas_head: bool = True) -> Callable:
    """Joint-serving analog of :func:`make_serving_fn` for ``StereoDCSS``:
    fn(variables, left, right) -> (disparity (B, H, W) f32,
    label map (B, H, W) int8). The label map comes from the fused Pallas
    serving head fed by the shared-trunk left features — the model's generic
    seg path (full-res f32 logits resize, reference ``rodsnet.py``'s
    ``F.interpolate`` epilogue) is dead code under jit and gets DCE'd, so
    serving never materializes the (B, H, W, 19) logit tensor."""
    from .stereo import StereoDCSS

    is_dcss = isinstance(model, StereoDCSS) and model.train_semantic
    if jax.default_backend() == "cpu":
        use_pallas_head = False  # Mosaic kernels don't lower on CPU

    def serve(variables, left, right):
        out = model.apply(variables, left, right, train=False)
        disp = out["disp"].astype(jnp.float32)
        if is_dcss and use_pallas_head and out["fine_feat"].shape[1] >= 10:
            seg_p = variables["params"]["segmentation"]
            seg_s = variables["batch_stats"]["segmentation"]
            labels = fused_seghead_upsample_argmax(
                out["fine_feat"],
                seg_p["norm"]["scale"], seg_p["norm"]["bias"],
                seg_s["norm"]["mean"], seg_s["norm"]["var"],
                seg_p["conv"]["kernel"], seg_p["conv"]["bias"],
            )
        elif "seg_beforeup" in out and "seg" in out and \
                out["seg_beforeup"].shape[1] * 4 == out["seg"].shape[1]:
            labels = upsample4x_argmax(out["seg_beforeup"]).astype(jnp.int8)
        elif "seg" in out:
            labels = jnp.argmax(out["seg"], axis=-1).astype(jnp.int8)
        else:
            # disparity-only model (train_semantic=False): no semantic head
            labels = None
        return disp, labels

    return serve
