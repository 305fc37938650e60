#!/usr/bin/env python
"""UAVDT MOTD annotations -> YOLO layout.

Reference surface: scripts/organise_image_folders.py,
scripts/organise_txt_labels.py, scripts/split_train_val.py (UAVDT prep).
UAVDT gt rows: <frame,id,x,y,w,h,out-of-view,occlusion,category> with
category 1=car 2=truck 3=bus.

Usage:
  python tools/uavdt2yolo.py --src /path/UAV-benchmark-M --gt /path/GT \
      --out datasets/UAVDT [--val-ratio 0.1]
"""
from __future__ import annotations

import argparse
import random
import shutil
from collections import defaultdict
from pathlib import Path

from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="UAV-benchmark-M dir (sequences of frames)")
    p.add_argument("--gt", required=True, help="GT dir with *_gt_whole.txt files")
    p.add_argument("--out", required=True)
    p.add_argument("--val-ratio", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    src, gt, out = Path(args.src), Path(args.gt), Path(args.out)
    rng = random.Random(args.seed)
    seqs = sorted(d for d in src.iterdir() if d.is_dir())
    rng.shuffle(seqs)
    n_val = max(1, int(len(seqs) * args.val_ratio))
    split_of = {s.name: ("val" if i < n_val else "train") for i, s in enumerate(seqs)}

    for sp in ("train", "val"):
        (out / "images" / sp).mkdir(parents=True, exist_ok=True)
        (out / "labels" / sp).mkdir(parents=True, exist_ok=True)

    for seq in seqs:
        sp = split_of[seq.name]
        gt_file = gt / f"{seq.name}_gt_whole.txt"
        per_frame = defaultdict(list)
        if gt_file.exists():
            for row in gt_file.read_text().strip().splitlines():
                vals = row.split(",")
                if len(vals) < 9:
                    continue
                frame = int(vals[0])
                x, y, w, h = (float(v) for v in vals[2:6])
                cat = int(vals[8])
                if 1 <= cat <= 3:
                    per_frame[frame].append((cat - 1, x, y, w, h))
        for img in sorted(seq.glob("*.jpg")):
            frame = int("".join(c for c in img.stem if c.isdigit()))
            dst = out / "images" / sp / f"{seq.name}_{img.stem}.jpg"
            shutil.copy(img, dst)
            iw, ih = Image.open(img).size
            lines = [
                f"{c} {(x + w / 2) / iw:.6f} {(y + h / 2) / ih:.6f} {w / iw:.6f} {h / ih:.6f}"
                for c, x, y, w, h in per_frame.get(frame, [])
            ]
            (out / "labels" / sp / f"{seq.name}_{img.stem}.txt").write_text(
                "\n".join(lines) + ("\n" if lines else "")
            )
        print(f"{seq.name} -> {sp}")


if __name__ == "__main__":
    main()
