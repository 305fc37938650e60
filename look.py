#!/usr/bin/env python
"""Print a checkpoint's detection anchors (reference look.py:1-8).

Usage: python look.py runs/train/exp/best.npz
"""
import sys

import numpy as np


def main(path):
    import jax

    jax.config.update("jax_platforms", "cpu")  # metadata read, no device
    from dmayolo_tpu.hub import load

    model = load(weights=path, device="cpu").model
    head = model.head
    # TDetect defines no anchors attribute at all (anchor-free)
    anchors = np.asarray(getattr(head, "anchors", np.empty((0,))))
    stride = np.asarray(model.stride)
    if anchors.size == 0:
        print(f"{path}: anchor-free head ({type(head).__name__}), "
              f"strides {stride.tolist()}")
        return
    print(f"{path}: {type(head).__name__}, strides {stride.tolist()}")
    for i, (s, a) in enumerate(zip(stride, anchors)):
        print(f"  P{i} stride {s:g}: "
              + " ".join(f"({w*s:g},{h*s:g})" for w, h in np.asarray(a)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/train/exp/best.npz")
