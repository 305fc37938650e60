#!/usr/bin/env python3
"""Score a directory of prediction txts (val/detect --save-txt --save-conf
format, or cli/wbf.py fusions) against a dataset's ground-truth labels.

This closes the reference's offline WBF workflow (ref train.sh:4 + wbf.py:
val --save-txt on N runs -> weighted_boxes_fusion -> fused txt): the fused
txts are themselves a detector output, and this tool measures their mAP
under the exact val protocol (process_batch 10-IoU TP matrix + ap_per_class,
ref val.py:62-83 / utils/metrics.py:21-111) so "WBF improves over the best
single model" becomes a number instead of a claim.

    python tools/eval_txt.py <pred_labels_dir> --data <dataset.yaml>
        [--one-indexed-cls]   # wbf.py default output writes 1-indexed cls

IoU is computed in normalized xywh space: GT and predictions are normalized
by the same image W,H, so normalized IoU == pixel IoU.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _read_rows(path: Path, ncols: int) -> np.ndarray:
    if not path.exists():
        return np.zeros((0, ncols))
    text = path.read_text().strip()
    if not text:
        return np.zeros((0, ncols))
    rows = np.array([ln.split() for ln in text.splitlines() if ln], np.float64)
    if rows.shape[1] < ncols:  # txt without conf: pad conf=1
        rows = np.concatenate(
            [rows, np.ones((len(rows), ncols - rows.shape[1]))], 1)
    return rows


def _xywhn2xyxy(b: np.ndarray) -> np.ndarray:
    cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)


def main(argv=None):
    ap = argparse.ArgumentParser("eval_txt")
    ap.add_argument("pred_dir", help="directory of prediction txts")
    ap.add_argument("--data", required=True, help="dataset yaml")
    ap.add_argument("--split", default="val")
    ap.add_argument("--one-indexed-cls", action="store_true",
                    help="predictions use 1-indexed classes (wbf.py default)")
    ap.add_argument("--json", action="store_true", help="print JSON summary")
    opt = ap.parse_args(argv)

    from dmayolo_tpu.data.datasets import check_dataset, img2label_paths, _scan_images
    from dmayolo_tpu.eval.metrics import ap_per_class, process_batch

    data = check_dataset(opt.data)
    imgs = _scan_images(data[opt.split])
    label_files = img2label_paths([str(f) for f in imgs])
    pred_dir = Path(opt.pred_dir)

    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    n_lab = 0
    for img, lab in zip(imgs, label_files):
        gt = _read_rows(Path(lab), 5)  # cls cx cy w h
        pred = _read_rows(pred_dir / (Path(img).stem + ".txt"), 6)
        if opt.one_indexed_cls and pred.shape[0]:
            pred = pred.copy()
            pred[:, 0] -= 1
        n_lab += len(gt)
        labels = np.concatenate(
            [gt[:, :1], _xywhn2xyxy(gt[:, 1:5])], 1) if gt.shape[0] else np.zeros((0, 5))
        det = (np.concatenate(
            [_xywhn2xyxy(pred[:, 1:5]), pred[:, 5:6], pred[:, :1]], 1)
            if pred.shape[0] else np.zeros((0, 6)))
        correct = process_batch(det, labels, iouv)
        stats.append((correct, det[:, 4], det[:, 5], labels[:, 0]))

    stats = [np.concatenate(x, 0) for x in zip(*stats)]
    if stats[0].size:
        p, r, ap_, f1, classes = ap_per_class(*stats)
        ap50, ap75, ap_all = ap_[:, 0], ap_[:, 5], ap_.mean(1)
        out = {"P": float(p.mean()), "R": float(r.mean()),
               "mAP@.5": float(ap50.mean()), "mAP@.75": float(ap75.mean()),
               "mAP@.5:.95": float(ap_all.mean()), "labels": int(n_lab)}
    else:
        out = {"P": 0.0, "R": 0.0, "mAP@.5": 0.0, "mAP@.75": 0.0,
               "mAP@.5:.95": 0.0, "labels": int(n_lab)}
    if opt.json:
        print(json.dumps(out))
    else:
        print(f"P={out['P']:.4f} R={out['R']:.4f} mAP@.5={out['mAP@.5']:.4f} "
              f"mAP@.75={out['mAP@.75']:.4f} mAP@.5:.95={out['mAP@.5:.95']:.4f} "
              f"({out['labels']} labels)")
    return out


if __name__ == "__main__":
    main()
