"""Parameter utilities: counting + optimizer param-group labeling.

The reference builds two ADAM groups for SwiftNet — ``random_init_params`` at
lr and ``fine_tune_params`` (the ImageNet trunk) at lr/4
(``utils/init_trainer.py:160-177``, ``network/resnet_pyramid.py:187-245``) —
and never optimizes the weather classifier or the SupCon projection head
(they live outside ``self.model``). Here every tensor is in one pytree, so
groups are path-based labels for ``optax.multi_transform``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

FINE_TUNE_PREFIXES = (
    # the pretrained trunk (reference resnet_pyramid.py:187-188 fine_tune list)
    "conv1", "bn1_0", "bn1_1", "bn1_2", "layer1", "layer2", "layer3", "layer4",
)


def _label_for_path(path_names, cfg) -> str:
    top = path_names[0]
    sgd = getattr(cfg, "optimizer_policy", "ADAM") == "SGD"
    trained = "sgd_base" if sgd else "random_init"  # opt-in extensions: lr x 1
    if top == "weather_clf":
        return trained if cfg.train_weather_clf else "frozen"
    if top == "projection":
        return trained if cfg.train_projection else "frozen"
    if sgd:
        # The reference's SGD groups are name-substring filters over the FULL
        # named_parameters list (utils/utils.py:47-75, init_trainer.py:127-159):
        #   'offset_conv.*'   -> lr x 0.1   ("specific", deform-conv offsets)
        #   'segmentation'    -> lr x 10    ("semantic", ONLY if --train_semantic;
        #                        otherwise it lands in NO group and is never
        #                        stepped — filter_base_params excludes it too)
        #   'feature_extractor' and everything else -> lr x 1
        if "offset_conv" in path_names:
            return "sgd_specific"
        if "segmentation" in path_names:
            return "sgd_semantic" if getattr(cfg, "train_semantic", False) else "frozen"
        return "sgd_base"
    # inside net/feature_extractor/...
    if "feature_extractor" in path_names:
        i = path_names.index("feature_extractor")
        sub = path_names[i + 1] if i + 1 < len(path_names) else ""
        if any(sub.startswith(p) for p in FINE_TUNE_PREFIXES):
            return "fine_tune"
        return "random_init"
    # WeatherNet's seg head: the reference's ADAM groups NEVER include it —
    # random_init_params() returns only the backbone's list; the chain()
    # adding self.segmentation.parameters() is commented out
    # (weathernet.py:100-102). Frozen by default for exact train parity,
    # opt-in via --train_seg_head. (DeepLab/ENet use one all-params group in
    # the reference and have no 'segmentation'-named module here.)
    if "segmentation" in path_names:
        return "random_init" if getattr(cfg, "train_seg_head", False) else "frozen"
    # anything else model-side
    return "random_init"


def label_params_for_optimizer(params: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Pytree of {'fine_tune','random_init','frozen'} labels matching params."""

    def f(path, _leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return _label_for_path(names, cfg)

    return jax.tree_util.tree_map_with_path(f, params)


def count_parameters(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
