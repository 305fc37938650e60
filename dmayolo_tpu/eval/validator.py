"""Validator — mAP evaluation loop (reference val.py:88-353 equivalent).

Device side: one jitted program per image shape = forward + decode +
batched NMS (the reference runs NMS per-image in Python with
torchvision — ours is a single vmapped program for the whole batch).
Supports TTA (--augment) via eval/tta.py.
Host side: letterbox-inverse box scaling, 10-IoU TP matching, AP
aggregation (eval/metrics.py), optional txt prediction dumps in the
reference runs/val layout (feeds wbf).

Eval protocol matches the reference defaults: conf 0.001, NMS IoU 0.6,
multi-label, max_det 300 (val.py:92-93, 235).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.nms import batched_nms
from ..data.datasets import DetectionDataset
from .coco_json import append_coco_json
from ..data.loader import DataLoader
from ..eval.metrics import ap_per_class, process_batch
from .tta import forward_augment


@dataclass
class ValResult:
    mp: float = 0.0
    mr: float = 0.0
    map50: float = 0.0
    map75: float = 0.0  # the val2.py extra column (ref val2.py:186-352)
    map: float = 0.0
    maps: Optional[np.ndarray] = None  # per-class AP
    per_class: Optional[Dict[str, np.ndarray]] = None  # cls/p/r/ap50/ap/nt
    speed_ms: Dict[str, float] = field(default_factory=dict)
    nt: int = 0
    # image ids the --save-json writer used, for COCOeval imgIds scoping
    # (evaluating a subset against full official annotations otherwise
    # counts every non-validated image's GT as false negatives)
    used_image_ids: Optional[list] = None

    def summary(self) -> str:
        return (
            f"P={self.mp:.4f} R={self.mr:.4f} mAP@.5={self.map50:.4f} "
            f"mAP@.75={self.map75:.4f} mAP@.5:.95={self.map:.4f} ({self.nt} labels)"
        )


def make_infer_fn(model, params, stats, conf_thres, iou_thres, max_det,
                  dtype=jnp.bfloat16, fused: bool = False, augment: bool = False,
                  max_nms: int = 30000, nms_backend: str = "scan",
                  mesh=None, spatial: bool = False, hybrid: bool = False,
                  quant=None):
    """Build the jitted whole-batch forward+decode+NMS (optionally TTA).

    Params/stats are jit ARGUMENTS, not closure captures — captured arrays
    embed as program constants (a 78M-param model would inline ~313 MB
    into the executable / remote-compile request).

    With `mesh`, the batch is sharded over the mesh's 'data' axis and
    params are replicated — data-parallel inference over N chips in ONE
    jitted program (the serving analog of the train-step DP; inference has
    no cross-device math, so per-image results are bit-identical to
    single-device).
    """

    def _infer(p, s, x, *tgt):
        xf = x.astype(dtype) / 255.0
        if augment:
            dec = forward_augment(model, p, s, xf, dtype=dtype, fused=fused)
        else:
            raw = model.apply(p, s, xf, dtype=dtype, fused=fused, quant=quant)
            dec = model.decode(raw)
        if dec.shape[-1] == model.nc + 4:  # TDetect: insert obj=1 column
            dec = jnp.concatenate(
                [dec[..., :4], jnp.ones_like(dec[..., :1]), dec[..., 4:]], axis=-1
            )
        if hybrid:
            # --save-hybrid: dataset labels join the predictions before NMS
            # as conf-1.0 candidates (ref val.py:228-233 autolabelling).
            # tgt: (cls (B,M), box xywhn (B,M,4), mask (B,M))
            t_cls, t_box, t_mask = tgt
            h, w = x.shape[1], x.shape[2]
            scale = jnp.asarray([w, h, w, h], dec.dtype)
            boxes = t_box.astype(dec.dtype) * scale
            obj = t_mask.astype(dec.dtype)[..., None]
            onehot = (jax.nn.one_hot(t_cls.astype(jnp.int32), model.nc,
                                     dtype=dec.dtype) * obj)
            rows = jnp.concatenate([boxes, obj, onehot], axis=-1)  # (B,M,5+nc)
            dec = jnp.concatenate([dec, rows], axis=1)
        return batched_nms(
            dec,
            conf_thres=conf_thres,
            iou_thres=iou_thres,
            multi_label=True,
            max_det=max_det,
            max_nms=max_nms,
            backend=nms_backend,
        )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        # optionally also shard image H over 'spatial' (large-image eval,
        # e.g. the 2016px TTA recipe): GSPMD inserts the conv halo
        # exchanges; results stay identical to single-device
        spec = (P("data", "spatial") if spatial and "spatial" in mesh.axis_names
                and mesh.shape.get("spatial", 1) > 1 else P("data"))
        data = NamedSharding(mesh, spec)
        tgt_sh = (NamedSharding(mesh, P("data")),) * 3 if hybrid else ()
        jit_infer = jax.jit(_infer, in_shardings=(repl, repl, data) + tgt_sh)
    else:
        jit_infer = jax.jit(_infer)
    return lambda x, *tgt: jit_infer(params, stats, x, *tgt)


def _scale_to_native(boxes: np.ndarray, lb_shape, native_shape):
    """Letterbox-inverse (ref scale_coords, general.py:605-619), numpy."""
    gain = min(lb_shape[0] / native_shape[0], lb_shape[1] / native_shape[1])
    pad_x = (lb_shape[1] - native_shape[1] * gain) / 2
    pad_y = (lb_shape[0] - native_shape[0] * gain) / 2
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - pad_x) / gain
    out[:, [1, 3]] = (out[:, [1, 3]] - pad_y) / gain
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, native_shape[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, native_shape[0])
    return out


def _save_txt(dets_native, native_shape, path: Path, save_conf: bool):
    """xywhn txt rows (ref val.py save_one_txt)."""
    h, w = native_shape
    lines = []
    for x1, y1, x2, y2, conf, cls in dets_native:
        cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
        bw, bh = (x2 - x1) / w, (y2 - y1) / h
        row = [int(cls), cx, cy, bw, bh] + ([conf] if save_conf else [])
        lines.append(" ".join(f"{v:.6g}" if i else str(v) for i, v in enumerate(row)))
    path.write_text("\n".join(lines) + ("\n" if lines else ""))


def run_validation(
    model,
    params,
    stats,
    data_path,
    img_size: int = 640,
    batch_size: int = 16,
    nc: Optional[int] = None,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    fused: bool = False,
    max_targets: int = 256,
    augment: bool = False,
    save_txt_dir: Optional[Path] = None,
    save_conf: bool = False,
    rect: bool = False,
    pad: float = 0.5,
    single_cls: bool = False,
    max_nms: int = 30000,
    nms_backend: str = "scan",
    save_json: Optional[list] = None,
    class_map=None,
    mesh=None,
    spatial: bool = False,
    save_hybrid: bool = False,
    quant=None,
) -> ValResult:
    """rect=True enables the reference's aspect-sorted rectangular batches
    (val.py:172, pad 0.5) — shapes are bucketed per batch, so XLA compiles
    one program per distinct batch shape (bounded by the aspect spread).

    mesh: shard validation batches over the mesh's 'data' axis
    (data-parallel eval across chips); batch_size must divide evenly."""
    nc = nc if nc is not None else model.nc
    if mesh is not None:
        n_data = mesh.shape.get("data", 1)
        assert batch_size % n_data == 0, (
            f"batch_size {batch_size} must be divisible by the mesh data "
            f"axis ({n_data})")
    ds = DetectionDataset(
        data_path, img_size=img_size, augment=False, rect=rect,
        stride=int(model.stride.max()),
        nc=nc if not single_cls else 10**6,  # validate ids against the raw dataset
        batch_size=batch_size, pad=pad, single_cls=single_cls,
    )
    loader = DataLoader(ds, batch_size, max_targets=max_targets, shuffle=False,
                        drop_last=False)
    if quant is not None and augment:
        raise ValueError("--int8 with TTA (--augment) is not supported")
    infer = make_infer_fn(model, params, stats, conf_thres, iou_thres, max_det,
                          dtype=dtype, fused=fused, augment=augment,
                          max_nms=max_nms, nms_backend=nms_backend, mesh=mesh,
                          spatial=spatial, hybrid=save_hybrid, quant=quant)
    if save_txt_dir is not None:
        save_txt_dir = Path(save_txt_dir)
        save_txt_dir.mkdir(parents=True, exist_ok=True)
    if save_json is not None:
        from .coco_json import image_id_map

        json_ids = image_id_map(ds.im_files)

    iouv = np.linspace(0.5, 0.95, 10)
    stats_acc = []
    t_infer = 0.0
    t_first = 0.0
    n_first = 0
    n_timed = 0
    bs = batch_size
    first = True
    # identity map sized to the model (hoisted; reference val.py:311 uses
    # coco91 for COCO else list(range(1000)) — extend past 1000 for
    # LVIS-scale class counts)
    cmap = class_map if class_map is not None else list(range(max(1000, nc)))

    for batch in loader:
        imgs = batch.images
        n = imgs.shape[0]
        if n < bs:  # pad to keep one compiled shape
            fill = np.zeros((bs - n,) + imgs.shape[1:], imgs.dtype)
            imgs = np.concatenate([imgs, fill])
        t0 = time.perf_counter()
        if save_hybrid:
            def _pad0(a):
                a = np.asarray(a)
                if a.shape[0] < bs:
                    a = np.concatenate(
                        [a, np.zeros((bs - a.shape[0],) + a.shape[1:], a.dtype)])
                return jnp.asarray(a)

            dets, valid = infer(jnp.asarray(imgs), _pad0(batch.targets.cls),
                                _pad0(batch.targets.box),
                                _pad0(batch.targets.mask))
        else:
            dets, valid = infer(jnp.asarray(imgs))
        dets = np.asarray(jax.block_until_ready(dets))
        valid = np.asarray(valid)
        if first:  # first batch carries XLA compile time
            t_first = time.perf_counter() - t0
            n_first = n
        else:
            t_infer += time.perf_counter() - t0
            n_timed += n
        first = False

        h, w = imgs.shape[1:3]
        for i in range(n):
            d = dets[i][valid[i]]  # (k, 6) xyxy conf cls in letterbox space
            if single_cls:
                d[:, 5] = 0  # ref val.py:204: pred classes join the GT's 0
            lb = batch.targets
            m = np.asarray(lb.mask[i])
            cls = np.asarray(lb.cls[i])[m]
            box = np.asarray(lb.box[i])[m]  # xywhn
            if len(box):
                lx = box * np.array([w, h, w, h])
                labels = np.concatenate(
                    [
                        cls[:, None],
                        np.stack(
                            [
                                lx[:, 0] - lx[:, 2] / 2,
                                lx[:, 1] - lx[:, 3] / 2,
                                lx[:, 0] + lx[:, 2] / 2,
                                lx[:, 1] + lx[:, 3] / 2,
                            ],
                            1,
                        ),
                    ],
                    1,
                )
            else:
                labels = np.zeros((0, 5), np.float32)
            correct = process_batch(d, labels, iouv)
            stats_acc.append((correct, d[:, 4], d[:, 5], cls))

            if (save_txt_dir is not None or save_json is not None) \
                    and batch.indices is not None:
                idx = batch.indices[i]
                native = tuple(ds.shapes[idx])
                dn = d.copy()
                dn[:, :4] = _scale_to_native(d[:, :4], (h, w), native)
                stem = Path(ds.im_files[idx]).stem
                if save_txt_dir is not None:
                    _save_txt(dn, native, save_txt_dir / f"{stem}.txt", save_conf)
                if save_json is not None:  # COCO entries, ref val.py:273
                    append_coco_json(
                        jdict=save_json, dets_native=dn,
                        image_id=json_ids[str(ds.im_files[idx])],
                        class_map=cmap,
                    )

    if not stats_acc:
        return ValResult()

    tp = np.concatenate([s[0] for s in stats_acc])
    conf = np.concatenate([s[1] for s in stats_acc])
    pred_cls = np.concatenate([s[2] for s in stats_acc])
    tcls = np.concatenate([s[3] for s in stats_acc])
    res = ValResult(nt=len(tcls))
    if save_json is not None:
        res.used_image_ids = sorted(set(json_ids.values()), key=str)
    if n_timed:
        res.speed_ms = {"inference+nms": 1000 * t_infer / n_timed}
    else:  # single-batch val: only the compile-laden batch exists
        res.speed_ms = {"inference+nms(incl compile)": 1000 * t_first / max(n_first, 1)}
    if tp.size and tcls.size:
        p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, tcls)
        ap50, ap75, ap_mean = ap[:, 0], ap[:, 5], ap.mean(1)
        res.mp, res.mr = float(p.mean()), float(r.mean())
        res.map50, res.map75 = float(ap50.mean()), float(ap75.mean())
        res.map = float(ap_mean.mean())
        maps = np.zeros(nc)
        maps[classes] = ap_mean
        res.maps = maps
        # per-class table data (reference val.py:302-306 verbose report)
        nt_cls = np.bincount(tcls.astype(int), minlength=nc)[classes]
        res.per_class = {"cls": classes, "p": p, "r": r, "ap50": ap50,
                         "ap": ap_mean, "nt": nt_cls}
    return res
