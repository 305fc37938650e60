#!/usr/bin/env python
"""Anchor tools: dump a model's anchors (reference look.py) and run
standalone IoU-k-means over a dataset (reference utils/kmeans_anchors.py).

Usage:
  python tools/anchors.py dump --cfg yolov5s.yaml
  python tools/anchors.py kmeans --data shapes.yaml --n 9 --img 640
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--cfg", required=True)
    k = sub.add_parser("kmeans")
    k.add_argument("--data", required=True)
    k.add_argument("--n", type=int, default=9)
    k.add_argument("--img", type=int, default=640)
    k.add_argument("--gen", type=int, default=1000)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.cmd == "dump":
        from dmayolo_tpu.cli.common import resolve_config
        from dmayolo_tpu.graph import DetectionModel

        m = DetectionModel(resolve_config(args.cfg, "models"))
        px = m.head.anchors * m.stride.reshape(-1, 1, 1)
        print("strides:", m.stride.tolist())
        print("anchors (stride units):\n", np.round(m.head.anchors, 3))
        print("anchors (pixels):\n", np.round(px, 1))
    else:
        from dmayolo_tpu.data.datasets import DetectionDataset, check_dataset
        from dmayolo_tpu.train.autoanchor import kmean_anchors

        data = check_dataset(args.data)
        ds = DetectionDataset(data["train"], img_size=args.img, nc=data["nc"])
        k = kmean_anchors(ds.shapes.astype(np.float64), ds.labels, n=args.n,
                          img_size=args.img, gen=args.gen, verbose=True)
        print("anchors:", np.round(k).astype(int).tolist())


if __name__ == "__main__":
    main()
