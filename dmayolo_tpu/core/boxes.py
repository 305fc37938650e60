"""Box geometry — pure, jit-able, works on any leading batch shape.

Behaviour matches the reference geometry helpers (ref: utils/general.py:539-631)
but is written as functional jnp code: no in-place mutation, boxes are arrays
of shape (..., 4).
"""
from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2).  ref: utils/general.py:539-547."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h).  ref: utils/general.py:529-537."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x, w: float, h: float, padw: float = 0.0, padh: float = 0.0):
    """Normalised (cx,cy,w,h) -> pixel (x1,y1,x2,y2).  ref: utils/general.py:549-557."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w: float, h: float, clip: bool = False, eps: float = 0.0):
    """Pixel (x1,y1,x2,y2) -> normalised (cx,cy,w,h).  ref: utils/general.py:559-569."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            ((x1 + x2) / 2) / w,
            ((y1 + y2) / 2) / h,
            (x2 - x1) / w,
            (y2 - y1) / h,
        ],
        axis=-1,
    )


def xyn2xy(x, w: float, h: float, padw: float = 0.0, padh: float = 0.0):
    """Normalised segment points -> pixel points.  ref: utils/general.py:571-577."""
    xs, ys = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([w * xs + padw, h * ys + padh], axis=-1)


def clip_boxes(boxes, shape):
    """Clip (...,4) xyxy boxes to image (height, width).  ref: utils/general.py:621-631."""
    h, w = shape
    x1 = jnp.clip(boxes[..., 0:1], 0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Map xyxy boxes from letterboxed `img1_shape` back to native `img0_shape`.

    ref: utils/general.py:605-619 (`scale_coords`).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    shift = jnp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=boxes.dtype)
    boxes = (boxes - shift) / gain
    return clip_boxes(boxes, img0_shape)


def letterbox_params(
    shape,
    new_shape=(640, 640),
    auto: bool = True,
    scale_fill: bool = False,
    scaleup: bool = True,
    stride: int = 32,
):
    """Compute letterbox resize/pad geometry (host-side math, no pixels touched).

    Returns ((new_w, new_h) unpadded size, (ratio_w, ratio_h), (dw, dh) per-side pad).
    ref: utils/augmentations.py:92-122 (`letterbox`).
    """
    h, w = shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)

    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)

    ratio = (r, r)
    new_unpad = (int(round(w * r)), int(round(h * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:  # pad to the smallest stride multiple
        dw, dh = dw % stride, dh % stride
    elif scale_fill:  # stretch, no pad
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / w, new_shape[0] / h)

    return new_unpad, ratio, (dw / 2, dh / 2)
