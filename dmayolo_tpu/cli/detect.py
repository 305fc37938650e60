"""Inference CLI — images/dirs/videos -> annotated outputs + txt/crops.

Reference surface: detect.py:38-394 (batch-1 loop, multi-backend).  Ours
batches a whole directory through one jitted program per shape bucket and
annotates with cv2.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}
VID_EXTS = {".mp4", ".avi", ".mov", ".mkv"}

PALETTE = [
    (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255),
    (49, 210, 207), (10, 249, 72), (23, 204, 146), (134, 219, 61),
    (52, 147, 26), (187, 212, 0), (168, 153, 44), (255, 194, 0),
    (147, 69, 52), (255, 115, 100), (236, 24, 0), (255, 56, 132),
    (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
]


def build_parser():
    p = argparse.ArgumentParser("dmayolo-detect")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--source", type=str, required=True, help="image/dir/video")
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=640,
                   dest="imgsz")
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--names", type=str, default=None, help="dataset yaml for class names")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--save-crop", action="store_true")
    p.add_argument("--classify", type=str, default=None,
                   help="second-stage classifier checkpoint: keep only "
                        "detections whose class the classifier agrees with "
                        "(ref detect.py:103-104, 253-255 apply_classifier; "
                        "dead-by-default upstream)")
    p.add_argument("--classify-cfg", type=str, default=None,
                   help="model yaml for --classify when the checkpoint "
                        "doesn't embed one (must end in a Classify head)")
    p.add_argument("--visualize", action="store_true", help="dump feature-map PNGs for the first image")
    p.add_argument("--agnostic-nms", action="store_true")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--classes", type=int, nargs="+", default=None)
    p.add_argument("--project", type=str, default="runs/detect")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--line-thickness", type=int, default=3)
    p.add_argument("--hide-labels", action="store_true",
                   help="draw boxes without class labels")
    p.add_argument("--hide-conf", action="store_true",
                   help="draw labels without confidences")
    p.add_argument("--view-img", action="store_true",
                   help="show annotated results in a window (needs a display)")
    p.add_argument("--update", action="store_true",
                   help="strip optimizer state from the weights file after "
                        "the run (ref detect.py --update / strip_optimizer)")
    p.add_argument("--half", action="store_true",
                   help="accepted for parity; compute is bf16 by default on "
                        "TPU (reference --half = fp16)")
    p.add_argument("--fp32", action="store_true",
                   help="run the forward in float32 (default bf16)")
    p.add_argument("--device", type=str, default=None, help="cpu|tpu (default: auto)")
    return p


def _gather_sources(source: Path):
    if source.is_dir():
        return sorted(p for p in source.rglob("*") if p.suffix.lower() in IMG_EXTS)
    return [source]


def main(argv=None):
    opt = build_parser().parse_args(argv)
    from .common import check_img_size, setup_device

    setup_device(opt.device)
    import cv2
    import jax
    import jax.numpy as jnp
    import yaml

    from ..core.nms import batched_nms, nms_parts
    from ..data.augment import letterbox
    from ..eval.tta import forward_augment
    from ..eval.validator import _scale_to_native
    from ..nn.fuse import fuse_params
    from .common import increment_path, load_model_from_checkpoint

    from .backends import detect_backend, load_backend

    backend = detect_backend(opt.weights)
    model = None
    if backend == "native":
        model, params, stats = load_model_from_checkpoint(opt.weights, opt.cfg)
        opt.imgsz = check_img_size(opt.imgsz, int(model.stride.max()))
        params, stats = fuse_params(model, params, stats)
        nc = model.nc
        gs = int(model.stride.max())
        names = [str(i) for i in range(nc)]
    else:
        # exported-program backends (ref detect.py:96-141 DetectMultiBackend):
        # the artifact embeds preprocessing + decode at a FIXED (batch, imgsz)
        if opt.augment or opt.visualize:
            raise SystemExit(
                f"--augment/--visualize need the native model graph; the "
                f"{backend} artifact is a frozen decode program")
        backend_fn, bmeta = load_backend(opt.weights, backend)
        nc = int(bmeta["nc"])
        gs = int(bmeta["stride"])
        if opt.imgsz != bmeta["imgsz"]:
            print(f"{backend}: overriding --imgsz {opt.imgsz} -> "
                  f"{bmeta['imgsz']} (baked into the exported program)")
            opt.imgsz = int(bmeta["imgsz"])
        backend_bs = int(bmeta["batch_size"])
        opt.batch_size = backend_bs
        tdetect = bmeta.get("head") == "TDetect"
        names = [str(n) for n in bmeta.get("names") or []] or [
            str(i) for i in range(nc)]
    if opt.names:
        with open(opt.names) as f:
            d = yaml.safe_load(f)
        names = d.get("names", names)

    out = increment_path(f"{opt.project}/{opt.name}", exist_ok=opt.exist_ok)
    out.mkdir(parents=True, exist_ok=True)
    if opt.save_txt:
        (out / "labels").mkdir(exist_ok=True)

    class_mask = None
    if opt.classes is not None:
        class_mask = jnp.asarray(np.isin(np.arange(nc), opt.classes))

    classifier_fn = None
    if opt.classify:
        from ..eval.second_stage import load_second_stage

        classifier_fn = load_second_stage(opt.classify, opt.classify_cfg)
    from ..eval.second_stage import apply_classifier, save_one_box

    if backend != "native":
        @jax.jit
        def _nms_dec(dec):
            if tdetect:  # TDetect decode is (B, A, 4+nc): insert conf=1 col
                dec = jnp.concatenate(
                    [dec[..., :4], jnp.ones_like(dec[..., :1]), dec[..., 4:]],
                    axis=-1)
            return batched_nms(
                dec, conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
                agnostic=opt.agnostic_nms, max_det=opt.max_det,
                class_mask=class_mask)

        def infer(x):
            x = np.asarray(x)
            b = x.shape[0]
            if b > backend_bs:
                # runtime batch exceeds the artifact's static batch (e.g.
                # more --source streams than export --batch-size): chunk
                parts = [infer(x[i:i + backend_bs])
                         for i in range(0, b, backend_bs)]
                return (jnp.concatenate([p[0] for p in parts]),
                        jnp.concatenate([p[1] for p in parts]))
            if b < backend_bs:  # exported program has a static batch dim
                x = np.concatenate(
                    [x, np.zeros((backend_bs - b,) + x.shape[1:], x.dtype)])
            dets, valid = _nms_dec(jnp.asarray(backend_fn(x)))
            return dets[:b], valid[:b]

    dtype = jnp.float32 if opt.fp32 else jnp.bfloat16

    @jax.jit
    def _infer(p, s, x):
        xf = x.astype(dtype) / 255.0
        if opt.augment:
            dec = forward_augment(model, p, s, xf, dtype=dtype, fused=True)
            if dec.shape[-1] == model.nc + 4:
                dec = jnp.concatenate(
                    [dec[..., :4], jnp.ones_like(dec[..., :1]), dec[..., 4:]], axis=-1
                )
            return batched_nms(
                dec, conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
                agnostic=opt.agnostic_nms, max_det=opt.max_det, class_mask=class_mask,
            )
        # serving fast path: fused per-scale decode, identical results to
        # decode+batched_nms single-label (reference detect.py is single-label)
        raw = model.apply(p, s, xf, dtype=dtype, fused=True)
        boxes, scores, cls = model.decode_parts(raw, class_mask=class_mask)
        return nms_parts(
            boxes, scores, cls, conf_thres=opt.conf_thres,
            iou_thres=opt.iou_thres, agnostic=opt.agnostic_nms,
            max_det=opt.max_det, max_nms=30000,
        )

    if backend == "native":
        def infer(x):  # params as jit args, not baked constants
            return _infer(params, stats, x)

    def _maybe_update():
        if getattr(opt, "update", False):  # ref detect.py --update
            if backend != "native":
                print("--update: n/a for exported-program artifacts")
                return
            if str(opt.weights).endswith(".pt"):
                # reference-format checkpoints are read-only interop inputs;
                # strip_checkpoint writes our npz format only
                print("--update: skipped — reference .pt checkpoints are "
                      "loaded read-only (use export.py --include torch to "
                      "write torch weights)")
                return
            from ..utils.checkpoint import strip_checkpoint

            strip_checkpoint(opt.weights)
            print(f"--update: stripped optimizer state from {opt.weights}")

    if "," in str(opt.source) or str(opt.source).endswith(".streams"):
        res = _run_streams(opt, infer, names, out, classifier_fn)
        _maybe_update()
        return res
    src = Path(opt.source)
    if src.suffix.lower() in VID_EXTS or str(opt.source).isdigit() or "://" in str(opt.source):
        res = _run_video(opt, infer, names, out, classifier_fn)
        _maybe_update()
        return res
    files = _gather_sources(src)
    assert files, f"no inputs in {opt.source}"

    if opt.visualize:
        from ..utils.plots import feature_visualization

        im0 = cv2.imread(str(files[0]))
        lb = letterbox(im0, opt.imgsz, auto=False, stride=int(model.stride.max()))[0]
        xv = jnp.asarray(cv2.cvtColor(lb, cv2.COLOR_BGR2RGB)[None].astype(np.float32) / 255.0)
        feats = model.apply_with_features(params, stats, xv, fused=True)
        vis_dir = out / "features"
        for i, tname, t in feats:
            if hasattr(t, "shape") and getattr(t, "ndim", 0) == 4:
                feature_visualization(np.asarray(t, dtype=np.float32), tname, i, save_dir=vis_dir)
        print(f"feature maps -> {vis_dir}")
    bs = min(opt.batch_size, len(files))

    n_done = 0
    t0 = time.perf_counter()
    for start in range(0, len(files), bs):
        chunk = files[start : start + bs]
        ims0 = [cv2.imread(str(f)) for f in chunk]
        lbs = [letterbox(im, opt.imgsz, auto=False, stride=gs)[0] for im in ims0]
        x = np.stack([cv2.cvtColor(im, cv2.COLOR_BGR2RGB) for im in lbs])
        if x.shape[0] < bs:
            x = np.concatenate([x, np.zeros((bs - x.shape[0],) + x.shape[1:], x.dtype)])
        dets, valid = infer(jnp.asarray(x))
        dets = np.asarray(dets)
        valid = np.asarray(valid)

        for i, (f, im0) in enumerate(zip(chunk, ims0)):
            d = dets[i][valid[i]]
            if classifier_fn is not None:  # ref detect.py:253-255
                d = apply_classifier([d], classifier_fn, x.shape[1:3], [im0])[0]
            d[:, :4] = _scale_to_native(d[:, :4], x.shape[1:3], im0.shape[:2])
            n_done += 1
            imc = im0.copy() if opt.save_crop else None  # clean copy pre-annotation
            label_summary = {}
            for x1, y1, x2, y2, conf, cls in d:
                c = int(cls)
                label_summary[names[c]] = label_summary.get(names[c], 0) + 1
                if not opt.nosave or opt.view_img:
                    color = PALETTE[c % len(PALETTE)]
                    cv2.rectangle(im0, (int(x1), int(y1)), (int(x2), int(y2)),
                                  color, opt.line_thickness)
                    if not getattr(opt, "hide_labels", False):
                        txt = (names[c] if getattr(opt, "hide_conf", False)
                               else f"{names[c]} {conf:.2f}")
                        cv2.putText(im0, txt, (int(x1), int(y1) - 4),
                                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2)
            if not opt.nosave:
                cv2.imwrite(str(out / f.name), im0)
            if getattr(opt, "view_img", False):
                try:
                    cv2.imshow("dmayolo", im0)
                    cv2.waitKey(1)
                except Exception:  # headless: cv2.error or Qt plugin failure
                    print("--view-img: no display available, skipping")
                    opt.view_img = False
            if opt.save_crop:
                for j, (x1, y1, x2, y2, conf, cls) in enumerate(d):
                    # gain/pad margin + BGR like ref detect.py save_one_box call
                    cdir = out / "crops" / names[int(cls)]
                    save_one_box((x1, y1, x2, y2), imc,
                                 file=cdir / f"{f.stem}_{j}.jpg", BGR=True)
            if opt.save_txt:
                h, w = im0.shape[:2]
                lines = []
                for x1, y1, x2, y2, conf, cls in d:
                    row = [int(cls), (x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
                           (x2 - x1) / w, (y2 - y1) / h] + ([conf] if opt.save_conf else [])
                    lines.append(" ".join(f"{v:.6g}" if j else str(int(v)) for j, v in enumerate(row)))
                (out / "labels" / f"{f.stem}.txt").write_text("\n".join(lines) + "\n")
            print(f"{f.name}: {label_summary or 'no detections'}")

    dt = time.perf_counter() - t0
    print(f"done: {n_done} images in {dt:.2f}s ({1000*dt/max(n_done,1):.1f} ms/img) -> {out}")
    _maybe_update()
    return out


if __name__ == "__main__":
    main()


def _run_video(opt, infer, names, out, classifier_fn=None):
    """Video file / webcam index / stream URL inference (reference
    LoadImages video branch + LoadStreams, datasets.py:158-367)."""
    import cv2
    import numpy as np
    import jax.numpy as jnp

    from ..data.augment import letterbox
    from ..eval.second_stage import apply_classifier
    from ..eval.validator import _scale_to_native

    src = int(opt.source) if str(opt.source).isdigit() else opt.source
    cap = cv2.VideoCapture(src)
    assert cap.isOpened(), f"cannot open {opt.source}"
    fps = cap.get(cv2.CAP_PROP_FPS) or 30
    w0 = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h0 = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = None
    if not opt.nosave and isinstance(src, str):
        out_path = str(out / (Path(opt.source).stem + "_det.mp4"))
        writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w0, h0))

    n = 0
    import time as _time

    t0 = _time.perf_counter()
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        lb = letterbox(frame, opt.imgsz, auto=False)[0]
        x = cv2.cvtColor(lb, cv2.COLOR_BGR2RGB)[None]
        dets, valid = infer(jnp.asarray(np.broadcast_to(x, (max(1, 1),) + x.shape[1:]).copy()))
        d = np.asarray(dets)[0][np.asarray(valid)[0]]
        if classifier_fn is not None:  # ref detect.py:253-255
            d = apply_classifier([d], classifier_fn, lb.shape[:2], [frame])[0]
        d[:, :4] = _scale_to_native(d[:, :4], lb.shape[:2], frame.shape[:2])
        for x1, y1, x2, y2, conf, cls in d:
            c = int(cls)
            color = PALETTE[c % len(PALETTE)]
            cv2.rectangle(frame, (int(x1), int(y1)), (int(x2), int(y2)), color, opt.line_thickness)
            if not getattr(opt, "hide_labels", False):
                txt = (names[c] if getattr(opt, "hide_conf", False)
                       else f"{names[c]} {conf:.2f}")
                cv2.putText(frame, txt, (int(x1), int(y1) - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2)
        if writer is not None:
            writer.write(frame)
        if getattr(opt, "view_img", False):
            try:
                cv2.imshow("dmayolo", frame)
                cv2.waitKey(1)
            except Exception:  # headless: cv2.error or Qt plugin failure
                print("--view-img: no display available, skipping")
                opt.view_img = False
        n += 1
    if writer is not None:
        writer.release()
    cap.release()
    dt = _time.perf_counter() - t0
    print(f"video: {n} frames in {dt:.1f}s ({n/max(dt,1e-9):.1f} FPS) -> {out}")
    return out


def _run_streams(opt, infer, names, out, classifier_fn=None):
    """Multiple concurrent sources batched through one program per step —
    reference LoadStreams (datasets.py:282-367: one reader thread per
    source, batched inference).  Sources: comma-separated, or a .streams
    file with one URL/path/index per line."""
    import queue
    import threading

    import cv2
    import numpy as np
    import jax.numpy as jnp

    from ..data.augment import letterbox
    from ..eval.second_stage import apply_classifier
    from ..eval.validator import _scale_to_native

    srcs = (
        [s.strip() for s in Path(opt.source).read_text().splitlines() if s.strip()]
        if str(opt.source).endswith(".streams")
        else [s.strip() for s in str(opt.source).split(",") if s.strip()]
    )
    caps = [cv2.VideoCapture(int(s) if s.isdigit() else s) for s in srcs]
    assert all(c.isOpened() for c in caps), f"failed to open some of {srcs}"
    frames = [None] * len(srcs)
    alive = [True] * len(srcs)
    lock = threading.Lock()

    def reader(i):
        while alive[i]:
            ok, f = caps[i].read()
            if not ok:
                alive[i] = False
                break
            with lock:
                frames[i] = f

    threads = [threading.Thread(target=reader, args=(i,), daemon=True) for i in range(len(srcs))]
    for t in threads:
        t.start()

    import time as _time

    n_steps = 0
    t0 = _time.perf_counter()
    gs = int(16)
    try:
        while any(alive) and n_steps < getattr(opt, "max_stream_steps", 10**9):
            with lock:
                batch0 = [f.copy() for f in frames if f is not None]
            if len(batch0) < len([a for a in alive if a]):
                _time.sleep(0.01)
                continue
            if not batch0:
                break
            lbs = [letterbox(f, opt.imgsz, auto=False)[0] for f in batch0]
            x = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2RGB) for f in lbs])
            dets, valid = infer(jnp.asarray(x))
            dets, valid = np.asarray(dets), np.asarray(valid)
            n_steps += 1
            if n_steps % 10 == 0:
                ds = [dets[i][valid[i]] for i in range(len(batch0))]
                if classifier_fn is not None:  # ref detect.py:253-255
                    ds = apply_classifier(ds, classifier_fn,
                                          lbs[0].shape[:2], batch0)
                counts = [len(d) for d in ds]
                print(f"step {n_steps}: dets per stream {counts}", flush=True)
            if not any(alive):
                break
    finally:
        for i in range(len(srcs)):
            alive[i] = False
        for c in caps:
            c.release()
    dt = _time.perf_counter() - t0
    print(f"streams: {n_steps} batched steps over {len(srcs)} sources in {dt:.1f}s "
          f"({n_steps*len(srcs)/max(dt,1e-9):.1f} FPS aggregate)")
    return out
