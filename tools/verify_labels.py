#!/usr/bin/env python
"""Eyeball-check YOLO txt labels by drawing them onto sample images.

Reference surface: scripts/verify_txt_labels.py (draws GT rectangles on
random converted images so a human can spot broken conversions).

Usage:
  python tools/verify_labels.py datasets/UAVDT/images [--n 12] [--out runs/verify]
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def img2label(p: Path) -> Path:
    parts = list(p.parts)
    idx = len(parts) - 1 - parts[::-1].index("images")
    parts[idx] = "labels"
    return Path(*parts).with_suffix(".txt")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("images", help="images dir (YOLO layout, labels/ sibling)")
    ap.add_argument("--n", type=int, default=12, help="sample size")
    ap.add_argument("--out", default="runs/verify")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import cv2

    files = sorted(p for p in Path(args.images).rglob("*")
                   if p.suffix.lower() in IMG_EXTS)
    assert files, f"no images under {args.images}"
    random.Random(args.seed).shuffle(files)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    root = Path(args.images)
    for p in files[: args.n]:
        im = cv2.imread(str(p))
        if im is None:
            print(f"{p}: unreadable, skipped")
            continue
        h, w = im.shape[:2]
        lb = img2label(p)
        n = 0
        if lb.exists():
            for line in lb.read_text().splitlines():
                vals = line.split()
                if len(vals) < 5:
                    continue
                c, cx, cy, bw, bh = vals[0], *map(float, vals[1:5])
                x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
                x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
                cv2.rectangle(im, (x1, y1), (x2, y2), (0, 255, 0), 2)
                cv2.putText(im, c, (x1, max(y1 - 4, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
                n += 1
        # key by the path relative to the root: sequence-layout datasets
        # repeat bare filenames (seqA/img00001.jpg, seqB/img00001.jpg)
        rel = p.relative_to(root) if p.is_relative_to(root) else Path(p.name)
        name = "__".join(rel.parts)
        cv2.imwrite(str(out / name), im)
        print(f"{rel}: {n} boxes -> {out / name}")


if __name__ == "__main__":
    main()
