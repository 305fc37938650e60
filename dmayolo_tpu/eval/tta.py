"""Test-time augmentation — multi-scale + flip forward with de-scaling.

ref: models/yolo.py:194-275 (_forward_augment/_descale_pred/_clip_augmented)
and utils/torch_utils.py scale_img.  Six passes: scales (1, 1, .83, .83,
.67, .67) with lr-flip on every second pass; outputs are de-scaled,
de-flipped, tail-clipped and concatenated for NMS.
"""
from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp

TTA_SCALES = (1.0, 1.0, 0.83, 0.83, 0.67, 0.67)
TTA_FLIPS = (None, "lr", None, "lr", None, "lr")


def scale_img(img, ratio: float, gs: int = 32):
    """Bilinear resize then pad to gs-multiple with 0.447 gray.
    ref: utils/torch_utils.py:231-243."""
    if ratio == 1.0:
        return img
    b, h, w, c = img.shape
    nh, nw = int(h * ratio), int(w * ratio)
    img = jax.image.resize(img, (b, nh, nw, c), method="bilinear")
    ph, pw = math.ceil(h * ratio / gs) * gs, math.ceil(w * ratio / gs) * gs
    return jnp.pad(
        img, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)), constant_values=0.447
    )


def descale_pred(p, flip, scale: float, img_hw):
    """Map decoded xywh preds back to the unaugmented frame.
    ref: yolo.py:241-264."""
    xy = p[..., :2] / scale
    wh = p[..., 2:4] / scale
    if flip == "ud":
        xy = jnp.concatenate([xy[..., 0:1], img_hw[0] - xy[..., 1:2]], axis=-1)
    elif flip == "lr":
        xy = jnp.concatenate([img_hw[1] - xy[..., 0:1], xy[..., 1:2]], axis=-1)
    return jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)


def clip_augmented(ys: List[jax.Array], nl: int) -> List[jax.Array]:
    """Remove first-scale large-object tail and last-scale small-object head.
    ref: yolo.py:266-275."""
    g = sum(4**x for x in range(nl))
    i = (ys[0].shape[1] // g) * 1
    ys[0] = ys[0][:, :-i]
    i = (ys[-1].shape[1] // g) * 4 ** (nl - 1)
    ys[-1] = ys[-1][:, i:]
    return ys


def forward_augment(model, params, stats, x, dtype=jnp.float32, fused=False):
    """TTA forward -> (B, N_total, no) decoded predictions."""
    img_hw = (x.shape[1], x.shape[2])
    gs = int(model.stride.max())
    ys = []
    for s, f in zip(TTA_SCALES, TTA_FLIPS):
        xi = x
        if f == "lr":
            xi = xi[:, :, ::-1]
        elif f == "ud":
            xi = xi[:, ::-1]
        xi = scale_img(xi, s, gs)
        raw = model.apply(params, stats, xi, dtype=dtype, fused=fused)
        yi = model.decode(raw)
        ys.append(descale_pred(yi, f, s, img_hw))
    ys = clip_augmented(ys, model.head.nl)
    return jnp.concatenate(ys, axis=1)
