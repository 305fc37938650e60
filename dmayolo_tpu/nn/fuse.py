"""Conv+BN folding for inference.

Equivalent of reference Model.fuse() (models/yolo.py:315-323) +
fuse_conv_and_bn (utils/torch_utils.py:198-218), as a pure params
transform: for every ConvBN/DWConv, fold the BN affine+stats into the conv
kernel and a new bias, then run with ctx.fused=True (BN skipped).

    W' = W * scale / sqrt(var + eps)        (per out-channel)
    b' = bias_bn - mean * scale / sqrt(var + eps)
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .blocks import ConvBN
from .module import FlatDict, Module


def fuse_params(model: Module, params: FlatDict, stats: FlatDict) -> Tuple[FlatDict, FlatDict]:
    """Returns (fused_params, empty_stats_for_fused_bns).

    Apply with `model.apply(..., fused=True)`.
    """
    fused = dict(params)
    fused_stats = dict(stats)
    for m in model.iter_modules():
        if not isinstance(m, ConvBN):
            continue
        kkey = m.path + ("conv", "kernel")
        if m.path + ("bn", "scale") not in params:
            continue  # already fused (e.g. loaded a *_fused.npz export)
        scale = params[m.path + ("bn", "scale")]
        bias = params[m.path + ("bn", "bias")]
        mean = stats[m.path + ("bn", "mean")]
        var = stats[m.path + ("bn", "var")]
        inv = scale / jnp.sqrt(var + m.bn.eps)
        fused[kkey] = params[kkey] * inv[None, None, None, :]  # HWIO: out ch last
        fused[m.path + ("conv", "bias")] = bias - mean * inv
        for leaf in ("scale", "bias"):
            fused.pop(m.path + ("bn", leaf))
        for leaf in ("mean", "var"):
            fused_stats.pop(m.path + ("bn", leaf))
    return fused, fused_stats
