"""Pallas greedy-NMS kernel — the whole suppress loop in VMEM.

The lax.scan NMS in core/nms.py re-reads scores/boxes from HBM every one of
max_det iterations.  Here each grid program pins one image's candidate set
(boxes transposed to (4, K) so coordinates are lane-contiguous (1, K)
vectors, scores (1, K)) in VMEM and runs the full argmax-pick/suppress loop
on-chip; only the (max_det,) pick list leaves the core.

K=4096 candidates = 4*16 KB boxes + 16 KB scores — far under the ~16 MB
VMEM budget, so the kernel is purely VPU-latency-bound.

Exact greedy NMS (same semantics as nms_single / torchvision).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _nms_kernel(boxes_ref, scores_ref, idx_ref, valid_ref, scores_scr, max_det: int,
                iou_thres: float):
    # boxes_ref: (4, K) [x1; y1; x2; y2], scores_ref: (1, K)
    scores_scr[...] = scores_ref[...]
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    areas = (x2 - x1) * (y2 - y1)  # (1, K)

    def step(t, _):
        live = scores_scr[...]  # (1, K)
        best = jnp.argmax(live[0, :])
        best_score = live[0, best]
        valid = (best_score > NEG_INF / 2).astype(jnp.int32)

        bx1 = x1[0, best]
        by1 = y1[0, best]
        bx2 = x2[0, best]
        by2 = y2[0, best]
        barea = areas[0, best]

        iw = jnp.clip(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0, None)
        ih = jnp.clip(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0, None)
        inter = iw * ih
        iou = inter / (barea + areas - inter + 1e-7)

        suppress = (iou > iou_thres) & (valid > 0)
        new_scores = jnp.where(suppress, NEG_INF, live)
        # retire the pick itself
        lane = jax.lax.broadcasted_iota(jnp.int32, new_scores.shape, 1)
        new_scores = jnp.where((lane == best) & (valid > 0), NEG_INF, new_scores)
        scores_scr[...] = new_scores

        idx_ref[0, t] = best.astype(jnp.int32)
        valid_ref[0, t] = valid
        return 0

    jax.lax.fori_loop(0, max_det, step, 0)


@partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret"))
def pallas_batched_nms_core(boxes, scores, iou_thres: float = 0.45,
                            max_det: int = 300, interpret: bool = False):
    """Greedy NMS per image.

    Args:
        boxes: (B, K, 4) xyxy (class-offset already applied).
        scores: (B, K) with invalid candidates at NEG_INF.

    Returns (keep_idx (B, max_det) int32, keep_valid (B, max_det) bool).
    """
    b, k, _ = boxes.shape
    boxes_t = boxes.transpose(0, 2, 1)  # (B, 4, K)
    kernel = partial(_nms_kernel, max_det=max_det, iou_thres=iou_thres)
    idx, valid = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, 4, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, 1, max_det), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, max_det), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, max_det), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, max_det), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores.reshape(b, 1, k))
    return idx[:, 0, :], valid[:, 0, :] > 0
