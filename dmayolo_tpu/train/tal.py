"""Anchor-free TAL loss: TaskAlignedAssigner + CIoU + DFL.

ref: utils/tal.py:81-158 (ComputeLoss_TAL/BboxLoss) and
utils/tal_assign.py:43-189 (TaskAlignedAssigner).  The reference assigner is
already dense (B, M, A) tensor math, so the XLA form is a direct functional
re-derivation; the only redesigns are fixed-size dense targets and a
scatter-based top-k mask instead of one_hot(...).sum().
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..core.boxes import xywh2xyxy
from ..core.iou import bbox_iou
from ..nn.heads import dfl_expectation, dist2bbox, make_anchor_points
from .loss import Targets, bce_with_logits


def bbox2dist(anchor_points, bbox, reg_max):
    """xyxy boxes -> clamped (l, t, r, b) distances.  ref: tal.py:214-217."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1),
        0,
        reg_max - 0.01,
    )


def select_candidates_in_gts(xy_centers, gt_bboxes, eps=1e-9):
    """(A, 2) centres x (B, M, 4) gt -> (B, M, A) in-box mask.
    ref: tal_assign.py:44-59."""
    lt = gt_bboxes[..., None, :2]  # (B, M, 1, 2)
    rb = gt_bboxes[..., None, 2:]
    deltas = jnp.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1
    )  # (B, M, A, 4)
    return jnp.min(deltas, axis=-1) > eps


def _ciou_pairwise(gt, pd):
    """CIoU between (B, M, 4) gt and (B, A, 4) pred -> (B, M, A), clamped 0."""
    iou = bbox_iou(gt[:, :, None, :], pd[:, None, :, :], CIoU=True)
    return jnp.clip(iou, 0.0, None)


class TaskAlignedAssigner:
    """ref: utils/tal_assign.py:76-189.  alpha/beta default to the DMA
    values (0.5/6.0, env-overridable YA/YB in the reference tal.py:95-96)."""

    def __init__(self, topk=10, num_classes=80, alpha=0.5, beta=6.0, eps=1e-9):
        self.topk = topk
        self.nc = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        """All-dense assignment.

        Args:
            pd_scores: (B, A, nc) sigmoid scores (detached).
            pd_bboxes: (B, A, 4) xyxy pixels (detached).
            anc_points: (A, 2) pixels.
            gt_labels: (B, M) int.
            gt_bboxes: (B, M, 4) xyxy pixels.
            mask_gt: (B, M) bool.

        Returns (target_labels (B,A), target_bboxes (B,A,4),
                 target_scores (B,A,nc), fg_mask (B,A)).
        """
        B, A, nc = pd_scores.shape
        M = gt_bboxes.shape[1]

        # per-(gt, anchor) alignment metric (ref get_box_metrics)
        scores_t = pd_scores.transpose(0, 2, 1)  # (B, nc, A)
        bbox_scores = jnp.take_along_axis(
            scores_t, gt_labels[:, :, None].astype(jnp.int32), axis=1
        )  # (B, M, A)
        overlaps = _ciou_pairwise(gt_bboxes, pd_bboxes)  # (B, M, A)
        align = bbox_scores**self.alpha * overlaps**self.beta

        mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
        metric = align * mask_in_gts

        # top-k per gt (ref select_topk_candidates): scatter instead of one_hot
        topk_vals, topk_idx = jax.lax.top_k(metric, self.topk)  # (B, M, K)
        valid_k = jnp.broadcast_to(mask_gt[:, :, None], topk_idx.shape)
        # invalid gts scatter into index 0 with the reference's >1-dedup trick
        idx = jnp.where(valid_k, topk_idx, 0)
        # flattened-1D scatter-add (most portable TPU lowering)
        row = jnp.arange(B * M).reshape(B, M, 1) * A
        flat_idx = (row + idx).reshape(-1)
        counts = (
            jnp.zeros((B * M * A,), jnp.int32)
            .at[flat_idx]
            .add(1)
            .reshape(B, M, A)
        )
        is_in_topk = jnp.where(counts > 1, 0, counts).astype(metric.dtype)

        mask_pos = is_in_topk * mask_in_gts * mask_gt[:, :, None]

        # conflict resolution: anchor claimed by several gts -> max overlap
        fg_counts = jnp.sum(mask_pos, axis=1)  # (B, A)
        multi = fg_counts[:, None, :] > 1  # (B, 1->M, A)
        is_max = jax.nn.one_hot(jnp.argmax(overlaps, axis=1), M, axis=1, dtype=mask_pos.dtype)
        mask_pos = jnp.where(jnp.broadcast_to(multi, mask_pos.shape), is_max, mask_pos)
        fg_mask = jnp.sum(mask_pos, axis=1)  # (B, A)

        target_gt_idx = jnp.argmax(mask_pos, axis=1)  # (B, A)

        # gather targets (ref get_targets)
        target_labels = jnp.take_along_axis(
            gt_labels.astype(jnp.int32), target_gt_idx, axis=1
        )  # (B, A)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
        target_scores = jax.nn.one_hot(target_labels, self.nc, dtype=jnp.float32)
        target_scores = jnp.where(fg_mask[..., None] > 0, target_scores, 0.0)

        # normalise scores by alignment (ref forward tail)
        align = align * mask_pos
        pos_align = jnp.max(align, axis=-1, keepdims=True)  # (B, M, 1)
        pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
        norm = jnp.max(align * pos_overlaps / (pos_align + self.eps), axis=-2)[..., None]
        target_scores = target_scores * norm

        return target_labels, target_bboxes, target_scores, fg_mask > 0


class ComputeLossTAL:
    """Anchor-free loss for TDetect.  ref: utils/tal.py:81-158.
    Weights: box 7.5 / cls 0.5 / dfl 1.5 (tal.py:155-157)."""

    def __init__(self, stride: Sequence[float], nc: int, reg_max: int = 16,
                 hyp: Dict | None = None,
                 alpha: float | None = None, beta: float | None = None):
        import os

        self.stride = [float(s) for s in stride]
        self.nc = nc
        self.reg_max = reg_max
        hyp = hyp or {}
        self.cls_pw = hyp.get("cls_pw", 1.0)
        # assigner alpha/beta: explicit args > YA/YB env (the reference's
        # tuning surface, tal.py:95-96) > DMA defaults 0.5/6.0
        if alpha is None:
            alpha = float(os.getenv("YA", 0.5))
        if beta is None:
            beta = float(os.getenv("YB", 6.0))
        self.assigner = TaskAlignedAssigner(topk=10, num_classes=nc, alpha=alpha, beta=beta)

    def __call__(self, raw: Sequence[jax.Array], targets: Targets):
        """raw: TDetect per-scale maps (B, ny, nx, 4*reg_max + nc)."""
        B = raw[0].shape[0]
        shapes = [(x.shape[1], x.shape[2]) for x in raw]
        anchor_points, stride_tensor = make_anchor_points(shapes, self.stride)
        no = 4 * self.reg_max + self.nc
        flat = jnp.concatenate(
            [x.reshape(B, -1, no).astype(jnp.float32) for x in raw], axis=1
        )  # (B, A, no)
        pred_dist = flat[..., : 4 * self.reg_max]
        pred_scores = flat[..., 4 * self.reg_max :]
        A = pred_dist.shape[1]

        img_h = shapes[0][0] * self.stride[0]
        img_w = shapes[0][1] * self.stride[0]
        gt_bboxes = xywh2xyxy(targets.box * jnp.asarray([img_w, img_h, img_w, img_h]))
        gt_bboxes = gt_bboxes * targets.mask[..., None]
        gt_labels = targets.cls

        pred_ltrb = dfl_expectation(pred_dist.reshape(B, A, 4, self.reg_max))
        pred_bboxes = dist2bbox(pred_ltrb, anchor_points[None], xywh=False)  # feature units

        tl, tb, ts, fg = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            targets.mask,
        )
        tb = tb / stride_tensor[None]  # back to feature units
        # the fork divides by the RAW score sum (tal.py:146) — no clamp to 1
        # (that's a later upstream change). Early in training the assigned
        # sigmoid scores sum << 1, so clamping would shrink every component
        # by the same large factor. Guard only the exact-zero case (no gt in
        # the whole batch), where the reference itself would produce nan.
        raw_sum = jnp.sum(ts)
        ts_sum = jnp.where(raw_sum > 0, raw_sum, 1.0)

        # cls BCE (ref tal.py:148)
        lcls = jnp.sum(bce_with_logits(pred_scores, ts, self.cls_pw)) / ts_sum

        # box CIoU weighted by target score (ref BboxLoss)
        weight = jnp.sum(ts, axis=-1) * fg  # (B, A)
        iou = bbox_iou(pred_bboxes, tb, CIoU=True)
        lbox = jnp.sum((1.0 - iou) * weight) / ts_sum

        # DFL (ref _df_loss)
        target_ltrb = bbox2dist(anchor_points[None], tb, self.reg_max - 1)  # (B, A, 4)
        tl_bin = jnp.floor(target_ltrb).astype(jnp.int32)
        tr_bin = tl_bin + 1
        wl = tr_bin.astype(jnp.float32) - target_ltrb
        wr = 1.0 - wl
        logp = jax.nn.log_softmax(pred_dist.reshape(B, A, 4, self.reg_max), axis=-1)
        ce_l = -jnp.take_along_axis(logp, tl_bin[..., None], axis=-1)[..., 0]
        ce_r = -jnp.take_along_axis(
            logp, jnp.clip(tr_bin, 0, self.reg_max - 1)[..., None], axis=-1
        )[..., 0]
        dfl = jnp.mean(ce_l * wl + ce_r * wr, axis=-1)  # (B, A)
        ldfl = jnp.sum(dfl * weight) / ts_sum

        lbox = lbox * 7.5
        lcls = lcls * 0.5
        ldfl = ldfl * 1.5
        total = (lbox + lcls + ldfl) * B
        return total, {"box": lbox, "cls": lcls, "dfl": ldfl}
