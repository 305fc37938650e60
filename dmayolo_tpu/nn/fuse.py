"""Conv+BN folding for inference.

Equivalent of reference Model.fuse() (models/yolo.py:315-323) +
fuse_conv_and_bn (utils/torch_utils.py:198-218), as a pure params
transform: for every conv whose output feeds a BatchNorm directly, fold
the BN affine+stats into the conv kernel and bias, then run with
ctx.fused=True.

    W' = W * scale / sqrt(var + eps)        (per out-channel)
    b' = (b_conv - mean) * scale / sqrt(var + eps) + bias_bn

Folded pairs (all direct conv->BN data flows in the zoo):
  * ConvBN / DWConv            (the reference `Conv`, common.py:50-77)
  * SCConv k2/k3/k4            (Sequential conv->BN, common.py:1279-1316)
  * AddConvBlock (`add_conv`)  (conv->BN->leaky, common.py:1063-1081)
  * GhostV2 ConvUnit           (conv->BN->act, GhostV2.py:73-96)
  * CoorAttention conv1->bn1   (common.py:1158-1207; conv has a bias)
  * any Sequential [..., Conv2d, BatchNorm2d, ...] adjacency

NOT foldable (an op sits between conv and BN, or BN consumes a concat):
BottleneckCSP.bn / DMMixConv2d.bn (concat of convs -> could be folded
per-slice; these blocks are not on any hot config) and ConvMix (GELU
between conv and BN). Those BNs run at inference via the BatchNorm2d
eval path, which computes in the activation dtype.

A BatchNorm2d whose params were folded away becomes an identity at
apply-time (fused checkpoints stay loadable with empty stats).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from .blocks import AddConvBlock, ConvBN, ConvUnit, CoorAttention, SCConv
from .module import FlatDict, Module, Sequential
from .primitives import BatchNorm2d, Conv2d


def _conv_bn_pairs(model: Module) -> List[Tuple[Conv2d, BatchNorm2d]]:
    """Every (conv, bn) pair where the BN consumes the conv output directly."""
    pairs = []
    seen_bn = set()

    def add(conv, bn):
        if bn.path not in seen_bn:
            seen_bn.add(bn.path)
            pairs.append((conv, bn))

    for m in model.iter_modules():
        if isinstance(m, ConvBN):          # includes DWConv
            add(m.conv, m.bn)
        elif isinstance(m, AddConvBlock):
            add(m.conv, m.bn)
        elif isinstance(m, ConvUnit):
            add(m.conv, m.bn)
        elif isinstance(m, CoorAttention):
            add(m.conv1, m.bn1)
        elif isinstance(m, Sequential):
            for a, b in zip(m.mods, m.mods[1:]):
                if isinstance(a, Conv2d) and isinstance(b, BatchNorm2d):
                    add(a, b)
    # SCConv's k2/k3/k4 are Sequentials and covered by the adjacency rule;
    # isinstance(m, SCConv) kept import-visible for documentation.
    _ = SCConv
    return pairs


def fuse_params(model: Module, params: FlatDict, stats: FlatDict) -> Tuple[FlatDict, FlatDict]:
    """Returns (fused_params, remaining_stats).

    Apply with `model.apply(..., fused=True)`. Idempotent: already-fused
    pairs (e.g. a loaded *_fused.npz export) are skipped.
    """
    fused = dict(params)
    fused_stats = dict(stats)
    for conv, bn in _conv_bn_pairs(model):
        kkey = conv.path + ("kernel",)
        if bn.path + ("scale",) not in fused:
            continue  # already fused
        scale = fused[bn.path + ("scale",)]
        bias = fused[bn.path + ("bias",)]
        mean = fused_stats[bn.path + ("mean",)]
        var = fused_stats[bn.path + ("var",)]
        inv = scale / jnp.sqrt(var + bn.eps)
        fused[kkey] = fused[kkey] * inv[None, None, None, :]  # HWIO: out ch last
        conv_bias = fused.get(conv.path + ("bias",), 0.0)
        fused[conv.path + ("bias",)] = (conv_bias - mean) * inv + bias
        for leaf in ("scale", "bias"):
            fused.pop(bn.path + (leaf,))
        for leaf in ("mean", "var"):
            fused_stats.pop(bn.path + (leaf,))
    return fused, fused_stats
