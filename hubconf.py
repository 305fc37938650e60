"""Hub entrypoints — reference hubconf.py:13-143 surface.

Usage:
    import hubconf
    model = hubconf.yolov5s(nc=80)        # fresh weights
    model = hubconf.custom("runs/train/exp/best.npz")
    results = model("image.jpg")
    results.pandas().xyxy[0]              # per-image DataFrame (ref idiom)
"""
from dmayolo_tpu.hub import load


def _create(cfg, nc=80, device=None):
    return load(weights=None, cfg=cfg, nc=nc, device=device)


def yolov5n(nc=80, device=None):
    return _create("yolov5n.yaml", nc, device)


def yolov5s(nc=80, device=None):
    return _create("yolov5s.yaml", nc, device)


def yolov5m(nc=80, device=None):
    return _create("yolov5m.yaml", nc, device)


def yolov5l(nc=80, device=None):
    return _create("yolov5l.yaml", nc, device)


def yolov5x(nc=80, device=None):
    return _create("yolov5x.yaml", nc, device)


def yolov5n6(nc=80, device=None):
    return _create("yolov5n6.yaml", nc, device)


def yolov5s6(nc=80, device=None):
    return _create("yolov5s6.yaml", nc, device)


def yolov5m6(nc=80, device=None):
    return _create("yolov5m6.yaml", nc, device)


def yolov5l6(nc=80, device=None):
    return _create("yolov5l6.yaml", nc, device)


def yolov5x6(nc=80, device=None):
    return _create("yolov5x6.yaml", nc, device)


def dma_yolo(nc=10, device=None):
    """The DMA-YOLO VisDrone flagship (C3CA + SCConv + SPPFCSPC + BiFPN)."""
    return _create("ablation-ca-scconv-sppfcspc.yaml", nc, device)


def custom(path, cfg=None, device=None):
    """Load a trained npz checkpoint."""
    return load(weights=path, cfg=cfg, device=device)


if __name__ == "__main__":
    import numpy as np

    m = yolov5n(device="cpu")
    res = m(np.zeros((480, 640, 3), np.uint8))
    res.print()
