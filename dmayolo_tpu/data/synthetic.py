"""Synthetic shapes dataset — the offline stand-in for coco128.

The reference's universal test fixture is coco128 auto-downloaded at first
use (ref: utils/general.py:357-447); this environment has no egress, so we
generate an equivalent small dataset on disk in the same layout
(images/ + labels/ YOLO txt + dataset yaml): coloured
rectangles/circles/triangles on textured backgrounds, classes = shape
kind.  Learnable in a few epochs by a tiny model — used by the e2e smoke
tests and the example configs.
"""
from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np
import yaml

CLASSES = ["rectangle", "circle", "triangle"]


def generate(root, n_train=64, n_val=16, img_size=320, seed=0):
    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.integers(0, 60, (img_size, img_size, 3)) + 60).astype(np.uint8)
            # background texture
            for _ in range(30):
                x, y = rng.integers(0, img_size, 2)
                cv2.circle(img, (int(x), int(y)), int(rng.integers(1, 4)),
                           tuple(int(c) for c in rng.integers(40, 120, 3)), -1)
            labels = []
            for _ in range(int(rng.integers(1, 6))):
                kind = int(rng.integers(0, 3))
                size = int(rng.integers(img_size // 10, img_size // 4))
                cx = int(rng.integers(size, img_size - size))
                cy = int(rng.integers(size, img_size - size))
                color = tuple(int(c) for c in rng.integers(160, 255, 3))
                if kind == 0:
                    w, h = size, int(size * rng.uniform(0.5, 1.0))
                    cv2.rectangle(img, (cx - w // 2, cy - h // 2), (cx + w // 2, cy + h // 2), color, -1)
                    bw, bh = w, h
                elif kind == 1:
                    r = size // 2
                    cv2.circle(img, (cx, cy), r, color, -1)
                    bw = bh = 2 * r
                else:
                    r = size // 2
                    pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]])
                    cv2.fillPoly(img, [pts], color)
                    bw, bh = 2 * r, 2 * r
                labels.append((kind, cx / img_size, cy / img_size, bw / img_size, bh / img_size))
            cv2.imwrite(str(root / "images" / split / f"{i:05d}.jpg"), img)
            with open(root / "labels" / split / f"{i:05d}.txt", "w") as f:
                for row in labels:
                    f.write(" ".join(f"{v:.6f}" if j else str(v) for j, v in enumerate(row)) + "\n")

    data = {
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "nc": len(CLASSES),
        "names": CLASSES,
    }
    with open(root / "shapes.yaml", "w") as f:
        yaml.safe_dump(data, f)
    return root / "shapes.yaml"
