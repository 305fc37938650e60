"""IoU family: IoU / GIoU / DIoU / CIoU / SIoU / EIoU / alpha-IoU.

Semantics match the reference (ref: utils/general.py:764-824,
utils/metrics.py:192-252, utils/metrics_aIoU.py:215-225) including its eps
placement quirks (eps added to heights only, and once more to the union),
which matter for exact loss parity.  Fully elementwise/broadcasting, so the
same function serves (N,4)x(N,4) elementwise or any broadcast pattern, and
vmaps cleanly.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def bbox_iou(
    box1,
    box2,
    xywh: bool = False,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    SIoU: bool = False,
    EIoU: bool = False,
    alpha: float = 1.0,
    eps: float = 1e-7,
):
    """Elementwise IoU between broadcastable (...,4) boxes.

    `xywh=True` means boxes are (cx, cy, w, h) else (x1, y1, x2, y2).
    Exactly one of the variant flags may be set.  `alpha != 1` applies the
    alpha-IoU power transform to the plain-IoU result
    (ref: utils/metrics_aIoU.py:215-225).
    """
    if xywh:
        b1_x1, b1_x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
        b1_y1, b1_y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
        b2_x1, b2_x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
        b2_y1, b2_y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )

    # union — eps on heights then once more on the union, matching the reference
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps

    iou = inter / union
    if not (GIoU or DIoU or CIoU or SIoU or EIoU):
        if alpha != 1.0:
            return jnp.power(iou, alpha)
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)  # convex width
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)  # convex height

    if SIoU:  # https://arxiv.org/abs/2205.12740
        s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5
        s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5
        sigma = jnp.sqrt(s_cw**2 + s_ch**2) + eps
        sin_alpha_1 = jnp.abs(s_cw) / sigma
        sin_alpha_2 = jnp.abs(s_ch) / sigma
        threshold = math.sqrt(2.0) / 2
        sin_alpha = jnp.where(sin_alpha_1 > threshold, sin_alpha_2, sin_alpha_1)
        angle_cost = jnp.cos(jnp.arcsin(jnp.clip(sin_alpha, -1.0, 1.0)) * 2 - math.pi / 2)
        rho_x = (s_cw / (cw + eps)) ** 2
        rho_y = (s_ch / (ch + eps)) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
        return iou - 0.5 * (distance_cost + shape_cost)

    if CIoU or DIoU or EIoU:
        c2 = cw**2 + ch**2 + eps  # convex diagonal squared
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if DIoU:
            return iou - rho2 / c2
        if EIoU:  # https://arxiv.org/abs/2101.08158
            rho_w2 = (w2 - w1) ** 2
            rho_h2 = (h2 - h1) ** 2
            cw2 = cw**2 + eps
            ch2 = ch**2 + eps
            return iou - (rho2 / c2 + rho_w2 / cw2 + rho_h2 / ch2)
        # CIoU: aspect-ratio penalty with alpha treated as constant
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        a = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * a)

    # GIoU
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def box_iou_matrix(boxes1, boxes2, eps: float = 1e-7):
    """Pairwise plain IoU matrix between (N,4) and (M,4) xyxy boxes -> (N,M).

    ref: utils/metrics.py:255-275 (`box_iou`).  Unlike `bbox_iou` this uses
    the symmetric/clean eps convention of the reference's box_iou (area-only
    eps), matching torchvision semantics used for NMS and TP matching.
    """
    a1 = boxes1[:, None, :2]  # (N,1,2)
    a2 = boxes1[:, None, 2:]
    b1 = boxes2[None, :, :2]  # (1,M,2)
    b2 = boxes2[None, :, 2:]
    inter_wh = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area1 = jnp.prod(boxes1[:, 2:] - boxes1[:, :2], axis=-1)
    area2 = jnp.prod(boxes2[:, 2:] - boxes2[:, :2], axis=-1)
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def wh_iou(wh1, wh2, eps: float = 1e-7):
    """IoU of (N,2) and (M,2) width-heights assuming co-centred boxes -> (N,M).

    ref: utils/metrics.py:278-286 — used by autoanchor.
    """
    wh1 = wh1[:, None]  # (N,1,2)
    wh2 = wh2[None]  # (1,M,2)
    inter = jnp.prod(jnp.minimum(wh1, wh2), axis=2)
    return inter / (jnp.prod(wh1, axis=2) + jnp.prod(wh2, axis=2) - inter + eps)
