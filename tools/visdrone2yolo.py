#!/usr/bin/env python
"""VisDrone annotation -> YOLO txt converter.

Reference surface: VisDrone2YOLO_lable.py:1-43 and the conversion block
embedded in data/VisDrone.yaml.  VisDrone rows are
  <x,y,w,h,score,category,truncation,occlusion>
with category 0=ignored, 1..10 = the ten classes; we keep score!=0 rows and
shift categories to 0-based.

Usage: python tools/visdrone2yolo.py /path/to/VisDrone2019-DET-train
       (expects annotations/ + images/; writes labels/)
"""
from __future__ import annotations

import sys
from pathlib import Path

from PIL import Image


def convert(split_dir: Path):
    ann_dir = split_dir / "annotations"
    img_dir = split_dir / "images"
    out_dir = split_dir / "labels"
    out_dir.mkdir(exist_ok=True)
    n = 0
    for ann in sorted(ann_dir.glob("*.txt")):
        img_path = img_dir / (ann.stem + ".jpg")
        if not img_path.exists():
            continue
        w, h = Image.open(img_path).size
        lines = []
        for row in ann.read_text().strip().splitlines():
            vals = row.replace(",", " ").split()
            if len(vals) < 6:
                continue
            x, y, bw, bh, score, cat = (float(v) for v in vals[:6])
            if score == 0 or cat == 0 or cat > 10:
                continue  # ignored regions / others
            cls = int(cat) - 1
            cx = (x + bw / 2) / w
            cy = (y + bh / 2) / h
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        (out_dir / ann.name).write_text("\n".join(lines) + ("\n" if lines else ""))
        n += 1
    print(f"{split_dir.name}: converted {n} annotation files -> {out_dir}")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        convert(Path(d))
