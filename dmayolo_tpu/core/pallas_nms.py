"""Pallas greedy-NMS kernel — the whole suppress loop in VMEM.

The lax.scan NMS in core/nms.py re-reads scores/boxes from HBM every one of
max_det iterations.  Here each grid program pins one image's candidate set
(boxes transposed to (4, K) so coordinates are lane-contiguous (1, K)
vectors, scores (1, K)) in VMEM and runs the full argmax-pick/suppress loop
on-chip.

Mosaic TC constraints shape the kernel:
  * no dynamic_slice on values -> the pick's coordinates are extracted by
    masked reductions over the one-hot lane mask;
  * dynamic lane stores must be 128-aligned -> instead of appending picks,
    the kernel writes a static (1, K) "rank" vector (rank[j] = iteration at
    which j was picked, else -1); the ordered keep-list is recovered
    outside with one argsort.

NB: the scan backend already measures 0.22 ms/batch-32 on v5e (NMS is not
a bottleneck); this kernel is the substrate for future in-kernel fusion
(decode+NMS) and a latency play for batch-1 serving.

Exact greedy NMS (same semantics as nms_single / torchvision).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _nms_kernel(boxes_ref, scores_ref, rank_ref, scores_scr, max_det: int,
                iou_thres: float):
    # boxes_ref: (4, K) [x1; y1; x2; y2], scores_ref: (1, K), rank_ref: (1, K)
    scores_scr[...] = scores_ref[...]
    rank_ref[...] = jnp.full(rank_ref.shape, -1, jnp.int32)
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    areas = (x2 - x1) * (y2 - y1)  # (1, K)
    lane = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 1)  # (1, K)

    def step(t, _):
        live = scores_scr[...]  # (1, K)
        best_score = jnp.max(live)
        # first lane attaining the max (ties -> lowest index, like argmax)
        is_best = live >= best_score
        best = jnp.min(jnp.where(is_best, lane, jnp.int32(2**30)))
        sel = lane == best  # one-hot (1, K)
        valid = best_score > NEG_INF / 2

        # masked-reduction extraction of the pick's coordinates
        bx1 = jnp.max(jnp.where(sel, x1, -jnp.inf))
        by1 = jnp.max(jnp.where(sel, y1, -jnp.inf))
        bx2 = jnp.max(jnp.where(sel, x2, -jnp.inf))
        by2 = jnp.max(jnp.where(sel, y2, -jnp.inf))
        barea = (bx2 - bx1) * (by2 - by1)

        iw = jnp.clip(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0, None)
        ih = jnp.clip(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0, None)
        inter = iw * ih
        iou = inter / (barea + areas - inter + 1e-7)

        suppress = ((iou > iou_thres) | sel) & valid
        scores_scr[...] = jnp.where(suppress, NEG_INF, live)
        rank_ref[...] = jnp.where(sel & valid, t, rank_ref[...])
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
    rank = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, 4, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores.reshape(b, 1, k))
    rank = rank[:, 0, :]  # (B, K)
    order = jnp.argsort(jnp.where(rank >= 0, rank, jnp.int32(2**30)), axis=-1)
    keep_idx = order[:, :max_det].astype(jnp.int32)
    keep_valid = jnp.take_along_axis(rank, keep_idx, axis=-1) >= 0
    if k < max_det:  # fixed output width even when candidates < max_det
        pad = max_det - k
        keep_idx = jnp.pad(keep_idx, ((0, 0), (0, pad)))
        keep_valid = jnp.pad(keep_valid, ((0, 0), (0, pad)))
    return keep_idx, keep_valid
