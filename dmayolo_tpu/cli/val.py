"""Validation CLI — mAP evaluation (reference val.py:354-440 surface).

Supports --augment (TTA) and --save-txt (+--save-conf) prediction dumps in
the reference's runs/val/<name>/labels/*.txt layout so wbf.py is drop-in.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("dmayolo-val")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--cfg", type=str, default=None, help="model yaml (if not in ckpt meta)")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--imgsz", "--img", "--img-size", type=int, default=640,
                   dest="imgsz")
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--task", type=str, default="val", choices=["val", "test", "speed", "study"])
    p.add_argument("--augment", action="store_true", help="TTA")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--save-hybrid", action="store_true",
                   help="dataset labels join predictions before NMS as "
                        "conf-1.0 candidates; with --save-txt this writes "
                        "autolabelling hybrids (ref val.py:228-233)")
    p.add_argument("--verbose", action="store_true",
                   help="report mAP by class (always on when nc < 50, "
                        "matching the reference val.py:302)")
    p.add_argument("--half", action="store_true",
                   help="accepted for parity; compute is bf16 by default "
                        "(reference --half = fp16); see --fp32")
    p.add_argument("--save-json", action="store_true",
                   help="write COCO-format predictions json (+COCOeval when "
                        "pycocotools is importable; ref val.py:270-341)")
    p.add_argument("--project", type=str, default="runs/val")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ serving on the MXU (nn/quant.py): convs "
                        "run int8xint8->int32, decode stays float; "
                        "calibrated on --ncalib dataset images")
    p.add_argument("--ncalib", type=int, default=32,
                   help="calibration images for --int8")
    p.add_argument("--no-fuse", action="store_true")
    p.add_argument("--rect", action="store_true", help="rectangular val batches (pad 0.5)")
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--device", type=str, default=None, help="cpu|tpu (default: auto)")
    p.add_argument("--devices", type=int, default=1,
                   help="data-parallel eval over N local devices (batches "
                        "shard on a mesh 'data' axis; batch-size must divide)")
    p.add_argument("--spatial-shard", action="store_true",
                   help="with --devices: also shard image H over a "
                        "'spatial' mesh axis (large-image eval, e.g. the "
                        "2016px TTA recipe); uses a (N/2 x 2) mesh")
    p.add_argument("--max-nms", type=int, default=30000,
                   help="pre-NMS candidate budget (ref general.py:650)")
    p.add_argument("--nms-backend", type=str, default="scan",
                   choices=["scan", "matrix", "pallas"])
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)
    from .common import setup_device

    setup_device(opt.device)
    import jax.numpy as jnp

    from ..data.datasets import check_dataset
    from ..eval.validator import run_validation
    from ..nn.fuse import fuse_params
    from .common import check_img_size, increment_path, load_model_from_checkpoint

    model, params, stats = load_model_from_checkpoint(opt.weights, opt.cfg)
    opt.imgsz = check_img_size(opt.imgsz, int(model.stride.max()))
    fused = not opt.no_fuse
    if fused:
        params, stats = fuse_params(model, params, stats)

    data = check_dataset(opt.data)
    out = increment_path(f"{opt.project}/{opt.name}", exist_ok=opt.exist_ok)
    out.mkdir(parents=True, exist_ok=True)

    quant = None
    if opt.int8:
        if not fused:
            raise SystemExit("--int8 requires the fused inference path "
                             "(drop --no-fuse)")
        import cv2
        import numpy as _np

        from ..data.augment import letterbox
        from ..data.datasets import _scan_images
        from ..nn.quant import calibrate_act_scales, quant_coverage

        cal_src = data.get("train") or data["val"]
        files = _scan_images(cal_src)[: opt.ncalib]
        imgs = []
        for f in files:
            im = cv2.imread(str(f))
            if im is None:
                continue
            imgs.append(letterbox(im, opt.imgsz, auto=False)[0][..., ::-1]
                        .astype(_np.uint8))
        if not imgs:
            raise SystemExit(f"--int8: no readable calibration images under "
                             f"{cal_src}")
        batches = [_np.stack(imgs[i:i + 8]) for i in range(0, len(imgs), 8)]
        quant = calibrate_act_scales(model, params, stats, batches,
                                     dtype=jnp.float32)
        print(f"int8 calibration: {len(imgs)} images, "
              f"{quant_coverage(model, quant)}")

    split = data.get(opt.task if opt.task in ("val", "test") else "val") or data["val"]
    if opt.task == "speed":
        opt.conf_thres, opt.iou_thres = 0.25, 0.45
    mesh = None
    if opt.devices > 1:
        from ..parallel.mesh import make_mesh

        n_sp = 2 if opt.spatial_shard and opt.devices % 2 == 0 else 1
        if opt.spatial_shard and n_sp == 1:
            print(f"--spatial-shard needs an even --devices count "
                  f"(got {opt.devices}) — falling back to pure data "
                  f"parallelism")
        mesh = make_mesh(n_data=opt.devices // n_sp, n_spatial=n_sp)

    if opt.task == "study":
        # mAP/speed across image sizes (ref val.py:416-435)
        rows = []
        for sz in range(256, opt.imgsz + 128, 128):
            r = run_validation(
                model, params, stats, split, img_size=sz, batch_size=opt.batch_size,
                nc=data["nc"], conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
                max_det=opt.max_det, max_nms=opt.max_nms,
                nms_backend=opt.nms_backend,
                mesh=mesh, spatial=opt.spatial_shard,
                save_hybrid=opt.save_hybrid,
                dtype=jnp.float32 if opt.fp32 else jnp.bfloat16, fused=fused,
            )
            rows.append((sz, r.mp, r.mr, r.map50, r.map, r.speed_ms.get("inference+nms", 0)))
            print(f"study {sz}px: {r.summary()} {r.speed_ms}")
        import csv as _csv

        with open(out / "study.csv", "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["imgsz", "P", "R", "mAP50", "mAP", "ms_img"])
            w.writerows(rows)
        print(f"study -> {out/'study.csv'}")
        return rows

    jdict = [] if opt.save_json else None
    if opt.save_json:
        from ..eval.coco_json import coco80_to_coco91_class, is_coco_data

        class_map = coco80_to_coco91_class() if is_coco_data(data) else None
    else:
        class_map = None

    res = run_validation(
        model, params, stats, split,
        img_size=opt.imgsz, batch_size=opt.batch_size, nc=data["nc"],
        mesh=mesh, spatial=opt.spatial_shard,
        save_hybrid=opt.save_hybrid,
        conf_thres=opt.conf_thres, iou_thres=opt.iou_thres, max_det=opt.max_det,
        max_nms=opt.max_nms, nms_backend=opt.nms_backend,
        dtype=jnp.float32 if opt.fp32 else jnp.bfloat16, fused=fused,
        save_txt_dir=(out / "labels") if opt.save_txt else None,
        save_conf=opt.save_conf,
        augment=opt.augment,
        rect=opt.rect,
        single_cls=opt.single_cls,
        save_json=jdict,
        class_map=class_map,
        quant=quant,
    )
    if jdict is not None:
        from ..eval.coco_json import evaluate_coco, is_coco_data, write_coco_json

        w = Path(opt.weights).stem
        pred_json = write_coco_json(jdict, out / f"{w}_predictions.json")
        print(f"saved {len(jdict)} COCO prediction entries -> {pred_json}")
        anno_json = Path(data.get("path", "../coco")) / "annotations/instances_val2017.json"
        if not anno_json.exists():
            # no official annotations: build COCO GT from the YOLO labels so
            # the protocol runs on any dataset (native evaluator handles the
            # missing-pycocotools case)
            import json as _json

            from ..eval.coco_json import build_coco_gt_from_yolo

            # same split the predictions came from (--task test != val), and
            # the same category-id map the prediction writer used
            gt = build_coco_gt_from_yolo(
                split, nc=int(data["nc"]), names=data.get("names"),
                class_map=class_map, single_cls=opt.single_cls)
            anno_json = out / "coco_gt.json"
            with open(anno_json, "w") as f:
                _json.dump(gt, f)
            print(f"built COCO GT from YOLO labels -> {anno_json} "
                  f"({len(gt['annotations'])} annotations)")
        # scope COCOeval to the validated images: against full official
        # annotations, unscoped eval counts every other image's GT as FNs
        # (ref val.py:334 eval.params.imgIds)
        coco_res = evaluate_coco(pred_json, anno_json,
                                 img_ids=res.used_image_ids)
        if coco_res is not None:
            print(f"COCOeval: mAP@.5:.95={coco_res[0]:.4f} mAP@.5={coco_res[1]:.4f}")
    print(res.summary())
    print("speed:", {k: f"{v:.2f}ms" for k, v in res.speed_ms.items()})
    if (opt.verbose or int(data["nc"]) < 50) and res.per_class is not None:
        # full per-class table (reference val.py:302-306; verbose there is
        # forced on for nc < 50 standalone runs)
        pc = res.per_class
        print(f"  {'Class':>16} {'Labels':>7} {'P':>7} {'R':>7} "
              f"{'mAP@.5':>7} {'mAP@.5:.95':>10}")
        for j, ci in enumerate(pc["cls"]):
            print(f"  {data['names'][int(ci)]:>16} {int(pc['nt'][j]):>7} "
                  f"{pc['p'][j]:>7.4f} {pc['r'][j]:>7.4f} "
                  f"{pc['ap50'][j]:>7.4f} {pc['ap'][j]:>10.4f}")
    elif res.maps is not None:
        for i, name in enumerate(data["names"]):
            if res.maps[i] > 0:
                print(f"  {name:>16}: mAP@.5:.95 {res.maps[i]:.4f}")
    return res


if __name__ == "__main__":
    main()
