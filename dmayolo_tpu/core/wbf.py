"""Weighted Boxes Fusion (Solovyev et al., 2021) — offline ensembling.

The reference shells out to the `ensemble_boxes` package
(ref: wbf.py:33-77, iou_thr 0.67, skip_box_thr 0.01); this is a
self-contained numpy implementation of the same algorithm ('avg'
confidence type, no overflow), host-side — it fuses a handful of saved
prediction files, not a hot path.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def _iou(box, boxes):
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a1 + a2 - inter + 1e-9)


def weighted_boxes_fusion(
    boxes_list: Sequence[np.ndarray],   # per model: (n, 4) normalised xyxy
    scores_list: Sequence[np.ndarray],
    labels_list: Sequence[np.ndarray],
    weights: Sequence[float] | None = None,
    iou_thr: float = 0.55,
    skip_box_thr: float = 0.0,
):
    """Returns (boxes (m,4), scores (m,), labels (m,)) sorted by score."""
    n_models = len(boxes_list)
    if weights is None:
        weights = np.ones(n_models)
    weights = np.asarray(weights, np.float64)

    # gather all boxes: rows [label, score*w, w, x1, y1, x2, y2]
    rows = []
    for m in range(n_models):
        b = np.asarray(boxes_list[m], np.float64).reshape(-1, 4)
        s = np.asarray(scores_list[m], np.float64).reshape(-1)
        l = np.asarray(labels_list[m], np.float64).reshape(-1)
        keep = s > skip_box_thr
        for bb, ss, ll in zip(b[keep], s[keep], l[keep]):
            rows.append([ll, ss * weights[m], weights[m], *bb])
    if not rows:
        return np.zeros((0, 4)), np.zeros(0), np.zeros(0)
    rows = np.asarray(rows)
    rows = rows[rows[:, 1].argsort()[::-1]]

    out_boxes: List[np.ndarray] = []   # fused box per cluster
    clusters: List[List[np.ndarray]] = []
    for row in rows:
        matched = -1
        if out_boxes:
            fused = np.asarray(out_boxes)
            same = fused[:, 0] == row[0]
            if same.any():
                ious = _iou(row[3:], fused[:, 3:])
                ious[~same] = 0
                j = int(np.argmax(ious))
                if ious[j] > iou_thr:
                    matched = j
        if matched >= 0:
            clusters[matched].append(row)
            c = np.asarray(clusters[matched])
            w = c[:, 1]
            fused_box = (c[:, 3:] * w[:, None]).sum(0) / w.sum()
            out_boxes[matched] = np.concatenate(
                [[row[0], w.sum(), c[:, 2].sum()], fused_box]
            )
        else:
            clusters.append([row])
            out_boxes.append(row.copy())

    fused = np.asarray(out_boxes)
    boxes = fused[:, 3:]
    labels = fused[:, 0]
    # 'avg' conf, matching ensemble_boxes exactly: mean of the weighted
    # scores over the cluster SIZE, rescaled by min(len, W)/W where W is
    # the total model weight (identical to ours for unit weights; the
    # previous sum(w)-normalisation diverged for non-uniform --weights)
    total_w = float(weights.sum())
    scores = np.array(
        [
            (np.asarray(c)[:, 1].sum() / len(c))
            * min(len(c), total_w)
            / total_w
            for c in clusters
        ]
    )
    order = scores.argsort()[::-1]
    return boxes[order], scores[order], labels[order]
