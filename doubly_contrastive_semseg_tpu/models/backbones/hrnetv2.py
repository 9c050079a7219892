"""HRNetV2-W18/32/48 backbone for DeepLab.

Re-design of reference ``network/backbone/hrnetv2.py`` (336 LoC): stem →
bottleneck stage 1 → three multi-resolution stages with branch exchange
(fusion) units. 'V2' head: all branches upsampled to the highest resolution
and concatenated, so ``out`` has Σ c·2^i channels (the factory computes the
same sum, ``network/modeling.py:17-19``); ``low_level`` is the stage-1
bottleneck output (256 ch), matching ``{'stage4': 'out', 'layer1':
'low_level'}`` (``modeling.py:23-28``).

Note the reference's hrnet factories crash (``IntermediateLayerGetter`` gets
an unexpected ``hrnet_flag``, and deeplabv3 swaps num_classes/output_stride —
SURVEY "known defects"); this implementation is wired correctly by design.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.interpolate import resize_bilinear
from ..blocks import batch_norm, conv_kxk
from .resnet import Bottleneck

Dtype = Any

# (num_modules, num_blocks) per stage for the standard HRNet recipe
STAGE_CFG = ((1, 4), (4, 4), (3, 4))


class HRBasicBlock(nn.Module):
    planes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        residual = x
        out = conv_kxk(self.planes, 3, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv_kxk(self.planes, 3, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(self.dtype, name="bn2")(out, use_running_average=not train)
        if x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="down_conv")(x)
            residual = batch_norm(self.dtype, name="down_bn")(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


class ExchangeUnit(nn.Module):
    """Multi-resolution fusion: every branch receives every other branch —
    strided 3×3 conv chains down, 1×1 conv + NEAREST ×2^k up (the reference's
    ``nn.Upsample(scale_factor=2^k, mode='nearest')``, ``hrnetv2.py:112-119``
    — pixel replication, NOT bilinear)."""

    widths: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jax.Array], train: bool) -> List[jax.Array]:
        outs = []
        for i, wi in enumerate(self.widths):
            acc = None
            for j, xj in enumerate(xs):
                if j == i:
                    y = xj
                elif j < i:  # downsample with stride-2 3×3 convs
                    y = xj
                    for s in range(i - j):
                        last = s == i - j - 1
                        y = conv_kxk(wi if last else self.widths[j], 3, stride=2,
                                     dtype=self.dtype,
                                     name=f"down{j}to{i}_{s}")(y)
                        y = batch_norm(self.dtype, name=f"down{j}to{i}_{s}_bn")(
                            y, use_running_average=not train)
                        if not last:
                            y = nn.relu(y)
                else:  # upsample: 1×1 + nearest ×2^(j-i) replication
                    y = nn.Conv(wi, (1, 1), use_bias=False, dtype=self.dtype,
                                param_dtype=jnp.float32, name=f"up{j}to{i}")(xj)
                    y = batch_norm(self.dtype, name=f"up{j}to{i}_bn")(
                        y, use_running_average=not train)
                    s = 2 ** (j - i)
                    y = jnp.repeat(jnp.repeat(y, s, axis=-3), s, axis=-2)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNetV2(nn.Module):
    width: int = 32  # W18 / W32 / W48
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        dt = self.dtype
        # stem: two stride-2 3×3 convs → 1/4 resolution
        for i in range(2):
            x = conv_kxk(64, 3, stride=2, dtype=dt, name=f"stem_conv{i}")(x)
            x = batch_norm(dt, name=f"stem_bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        # stage 1: 4 bottlenecks at 1/4 (→ 256 ch)
        for bi in range(4):
            x = Bottleneck(planes=64, dtype=dt, name=f"layer1_{bi}")(x, train)
        out: Dict[str, jax.Array] = {"low_level": x}

        widths = tuple(self.width * 2 ** i for i in range(4))
        xs: List[jax.Array] = []
        # transition to 2 branches
        xs.append(conv_kxk(widths[0], 3, dtype=dt, name="trans0")(x))
        xs.append(conv_kxk(widths[1], 3, stride=2, dtype=dt, name="trans1")(x))
        xs = [nn.relu(batch_norm(dt, name=f"trans{i}_bn")(v, use_running_average=not train))
              for i, v in enumerate(xs)]

        for stage, (n_modules, n_blocks) in enumerate(STAGE_CFG, start=2):
            if stage > 2:
                # add a new lowest-resolution branch
                new = conv_kxk(widths[len(xs)], 3, stride=2, dtype=dt,
                               name=f"trans_s{stage}")(xs[-1])
                new = batch_norm(dt, name=f"trans_s{stage}_bn")(
                    new, use_running_average=not train)
                xs.append(nn.relu(new))
            for m in range(n_modules):
                xs = [self._branch(xs[i], widths[i], n_blocks, train,
                                   f"s{stage}_m{m}_b{i}") for i in range(len(xs))]
                xs = ExchangeUnit(tuple(widths[:len(xs)]), dtype=dt,
                                  name=f"s{stage}_m{m}_fuse")(xs, train)

        # V2 head: upsample all branches to branch 0, concat
        hw = (xs[0].shape[-3], xs[0].shape[-2])
        feats = [xs[0]] + [resize_bilinear(v, hw) for v in xs[1:]]
        out["out"] = jnp.concatenate(feats, axis=-1)  # Σ w·2^i channels
        return out

    def _branch(self, x, width, n_blocks, train, name):
        for bi in range(n_blocks):
            x = HRBasicBlock(planes=width, dtype=self.dtype,
                             name=f"{name}_blk{bi}")(x, train)
        return x


def hrnet_out_channels(width: int) -> int:
    return sum(width * 2 ** i for i in range(4))
