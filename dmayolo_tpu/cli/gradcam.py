"""Grad-CAM CLI — per-detection heatmap overlays for a target layer.

Working replacement for the reference's broken `main_gradcam.py:1-119`
(its `models.gradcam` / `models.yolov5_object_detector` imports do not
exist upstream).  Same surface: --model-path/--img-path/--output-dir/
--img-size/--target-layer/--method {gradcam,gradcampp}/--no-text-box; one
JET-overlay output image per input with every kept detection's CAM blended
in (the reference blends per-box heatmaps the same way, main_gradcam.py:
31-41), plus per-detection CAM images.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def build_parser():
    p = argparse.ArgumentParser("dmayolo-gradcam")
    p.add_argument("--model-path", "--weights", dest="model_path", type=str,
                   required=True)
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--img-path", type=str, default="data/images")
    p.add_argument("--output-dir", type=str, default="outputs/")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--target-layer", type=str, default="model_17_cv3_act",
                   help="layer address ('model_17_...') or plain index")
    p.add_argument("--method", type=str, default="gradcam",
                   choices=["gradcam", "gradcampp"])
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-dets", type=int, default=10,
                   help="CAM for at most this many detections per image")
    p.add_argument("--names", type=str, default=None, help="dataset yaml for class names")
    p.add_argument("--no-text-box", "--no_text_box", dest="no_text_box",
                   action="store_true")
    p.add_argument("--device", type=str, default=None, help="cpu|tpu (default: auto)")
    return p


def _jet(cam: np.ndarray) -> np.ndarray:
    """cam in [0,1] -> BGR JET colormap (cv2-free fallback kept simple)."""
    try:
        import cv2

        return cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    except Exception:
        # piecewise-linear JET approximation, BGR
        r = np.clip(1.5 - np.abs(4 * cam - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * cam - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * cam - 1), 0, 1)
        return (np.stack([b, g, r], -1) * 255).astype(np.uint8)


def main(argv=None):
    opt = build_parser().parse_args(argv)
    from .common import check_img_size, setup_device

    setup_device(opt.device)
    import cv2
    import jax.numpy as jnp
    import yaml

    from ..core.nms import batched_nms
    from ..data.augment import letterbox
    from ..eval.gradcam import cam_for_detection, resolve_target_layer, upsample_cam
    from .common import load_model_from_checkpoint

    model, params, stats = load_model_from_checkpoint(opt.model_path, opt.cfg)
    opt.img_size = check_img_size(opt.img_size, int(model.stride.max()))
    layer_i = resolve_target_layer(model, opt.target_layer)
    names = [str(i) for i in range(model.nc)]
    if opt.names:
        with open(opt.names) as f:
            names = yaml.safe_load(f).get("names", names)

    src = Path(opt.img_path)
    paths = (
        sorted(p for p in src.rglob("*") if p.suffix.lower() in IMG_EXTS)
        if src.is_dir()
        else [src]
    )
    out_dir = Path(opt.output_dir) / f"layer_{layer_i}_{opt.method}"
    out_dir.mkdir(parents=True, exist_ok=True)

    cache: dict = {}  # shared: the compiled grad fn serves all images
    for path in paths:
        im0 = cv2.imread(str(path))
        if im0 is None:
            print(f"skip (unreadable): {path}")
            continue
        img, _, _ = letterbox(im0, (opt.img_size, opt.img_size), auto=False)
        x = jnp.asarray(img[:, :, ::-1].astype(np.float32) / 255.0)[None]

        t0 = time.time()
        raw = model.apply(params, stats, x)
        dec = model.decode(raw)
        if dec.shape[-1] == model.nc + 4:  # TDetect: obj=1 column (cf. detect.py)
            dec = jnp.concatenate(
                [dec[..., :4], jnp.ones_like(dec[..., :1]), dec[..., 4:]], axis=-1
            )
        dets, valid, srcs = batched_nms(
            dec, conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
            max_det=min(300, max(1, opt.max_dets)), return_src=True,
        )
        dets, valid, srcs = map(np.asarray, (dets, valid, srcs))
        n = int(valid[0].sum())

        res = img.astype(np.float32) / 255.0
        for j in range(min(n, opt.max_dets)):
            cand, cls = int(srcs[0, j]), int(dets[0, j, 5])
            cam = cam_for_detection(
                model, params, stats, x, layer_i, cand, cls,
                method=opt.method, _cache=cache,
            )
            cam_up = upsample_cam(cam, img.shape[:2])
            heat = _jet(cam_up).astype(np.float32) / 255.0
            res = res + heat  # reference blend: add + renormalise
            res = res / res.max()

            cv2.imwrite(
                str(out_dir / f"{path.stem}_det{j}_{names[cls]}.jpg"),
                (cam_up * 255).astype(np.uint8),
            )

        res = (res * 255).astype(np.uint8)
        if not opt.no_text_box:
            for j in range(min(n, opt.max_dets)):
                x1, y1, x2, y2, conf, cls = dets[0, j]
                c1, c2 = (int(x1), int(y1)), (int(x2), int(y2))
                cv2.rectangle(res, c1, c2, (0, 0, 255), 2, cv2.LINE_AA)
                cv2.putText(res, f"{names[int(cls)]} {conf:.2f}",
                            (c1[0], max(c1[1] - 3, 10)), 0, 0.5,
                            (255, 255, 255), 1, cv2.LINE_AA)
        out_path = out_dir / f"{path.stem}_res.jpg"
        cv2.imwrite(str(out_path), res)
        print(f"{path.name}: {n} dets, {min(n, opt.max_dets)} CAMs "
              f"[{time.time() - t0:.2f}s] -> {out_path}")


if __name__ == "__main__":
    main()
