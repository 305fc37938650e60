"""AutoAnchor: BPR check + k-means/GA anchor evolution (host-side numpy).

ref: utils/autoanchor.py:26-162 (check_anchors / kmean_anchors) and
utils/kmeans_anchors.py (standalone IoU k-means).  Runs once before
training — pure numpy/scipy, no device involvement.
"""
from __future__ import annotations

import random

import numpy as np


def _metric(k, wh):
    """Best-ratio metric per box: (best over anchors of min(r, 1/r).min(axis))."""
    with np.errstate(divide="ignore", invalid="ignore"):
        # zero (placeholder) anchors give inf ratios -> metric 0, handled by
        # the degenerate-anchor path in maybe_autoanchor
        r = wh[:, None] / k[None]
        x = np.minimum(r, 1 / r).min(2)  # (n, k)
    best = x.max(1)
    return x, best


def anchor_fitness(k, wh, thr):
    _, best = _metric(k, wh)
    return (best * (best > thr)).mean()


def dataset_wh(shapes, labels, img_size: int):
    """Pixel box wh for each label at training scale (normalised wh scaled
    by the letterboxed image size).  ref: autoanchor.py:36-41."""
    wh = np.concatenate(
        [l[:, 3:5] * (img_size * shp[::-1] / shp.max()) for l, shp in zip(labels, shapes) if len(l)]
    )
    return wh[(wh >= 2.0).any(1)]


def check_anchors(anchors_px: np.ndarray, shapes: np.ndarray, labels, img_size: int,
                  thr: float = 4.0):
    """Returns (bpr, aat) — best possible recall and anchors-above-threshold.
    ref: autoanchor.py:26-56."""
    wh = dataset_wh(shapes, labels, img_size)
    # reference jitters wh by uniform(0.9, 1.1) for robustness
    wh = wh * np.random.uniform(0.9, 1.1, size=(wh.shape[0], 1))
    x, best = _metric(anchors_px.reshape(-1, 2), wh)
    aat = (x > 1 / thr).sum(1).mean()
    bpr = (best > 1 / thr).mean()
    return float(bpr), float(aat)


def kmean_anchors(shapes, labels, n: int = 9, img_size: int = 640, thr: float = 4.0,
                  gen: int = 1000, seed: int = 0, verbose: bool = False) -> np.ndarray:
    """Whitened scipy k-means + mutation GA.  ref: autoanchor.py:59-162."""
    from scipy.cluster.vq import kmeans

    npr = np.random.default_rng(seed)
    thr = 1 / thr
    wh0 = dataset_wh(shapes, labels, img_size)
    wh = wh0[(wh0 >= 2.0).any(1)]

    def fitness(k):
        r = wh[:, None] / k[None]
        x = np.minimum(r, 1 / r).min(2)
        best = x.max(1)
        return (best * (best > thr)).mean()

    s = wh.std(0)
    try:
        k = kmeans(wh / s, n, iter=30)[0] * s
        assert len(k) == n
    except Exception:
        # fallback: random init from data quantiles
        k = np.sort(npr.uniform(wh.min(0), wh.max(0), (n, 2)), 0)
    k = k[np.argsort(k.prod(1))]

    f, sh, mp, sigma = fitness(k), k.shape, 0.9, 0.1
    for _ in range(gen):
        v = np.ones(sh)
        while (v == 1).all():
            v = ((npr.random(sh) < mp) * npr.random() * npr.normal(size=sh) * sigma + 1).clip(0.3, 3.0)
        kg = (k * v).clip(min=2.0)
        fg = fitness(kg)
        if fg > f:
            f, k = fg, kg.copy()
    k = k[np.argsort(k.prod(1))]
    if verbose:
        print(f"autoanchor: fitness={f:.4f} anchors={np.round(k).astype(int).tolist()}")
    return k


def maybe_autoanchor(model, dataset, img_size: int, thr: float = 4.0,
                     bpr_thresh: float = 0.98, verbose: bool = True):
    """check_anchors + re-cluster + write back to the Detect head, like the
    reference pre-train hook (train.py:318, autoanchor.py:26-56)."""
    from ..nn.heads import Detect

    head = model.head
    if not isinstance(head, Detect):
        return None
    shapes = dataset.shapes.astype(np.float64)
    anchors_px = head.anchors * model.stride.reshape(-1, 1, 1)
    bpr, aat = check_anchors(anchors_px, shapes, dataset.labels, img_size, thr)
    if verbose:
        print(f"autoanchor: BPR={bpr:.4f}, {aat:.2f} anchors/target")
    # `anchors: <int>` configs carry [0,1,2,..] placeholders (ref yolo.py:365)
    # whose zero row can make the ratio metric report a bogus-high BPR;
    # degenerate anchors always need recomputing, whatever BPR says
    degenerate = float(np.min(anchors_px)) <= 0
    if bpr >= bpr_thresh and not degenerate:
        return bpr
    n = head.nl * head.na
    new = kmean_anchors(shapes, dataset.labels, n=n, img_size=img_size, thr=thr,
                        verbose=verbose)
    new_bpr, _ = check_anchors(new.reshape(head.nl, head.na, 2), shapes,
                               dataset.labels, img_size, thr)
    # ref: autoanchor.py:49-55 keeps the better set; a degenerate original
    # has no valid BPR to defend, so kmeans always wins there
    if new_bpr > bpr or degenerate:
        head.anchors = (
            new.reshape(head.nl, head.na, 2) / model.stride.reshape(-1, 1, 1)
        ).astype(np.float32)
        if verbose:
            print(f"autoanchor: updated anchors (BPR {new_bpr:.4f})")
        return new_bpr
    return max(bpr, new_bpr)
