"""Hub API: one-call model loading + input-robust inference wrapper.

Reference surface: hubconf.py:13-143 (torch.hub entrypoints) and
models/common.py:701-891 (AutoShape preprocess+infer+NMS wrapper and the
Detections results object with pandas/crop/render/save).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from collections import OrderedDict

from .core.nms import batched_nms
from .data.augment import letterbox
from .eval.validator import _scale_to_native
from .graph import DetectionModel
from .nn.fuse import fuse_params


class _LRUCache(OrderedDict):
    """Small shape->compiled-fn cache with least-recently-used eviction."""

    def __init__(self, maxsize: int = 8):
        super().__init__()
        self.maxsize = maxsize

    def __getitem__(self, key):
        val = super().__getitem__(key)
        self.move_to_end(key)
        return val

    def __setitem__(self, key, val):
        super().__setitem__(key, val)
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)


def load(weights=None, cfg: Optional[str] = None,
         nc: Optional[int] = None, names=None, device: Optional[str] = None):
    """Load model(s) as an AutoShape end-to-end callable.

    weights: npz checkpoint path, or a LIST of paths for an NMS ensemble
    (outputs concatenated before NMS — reference Ensemble,
    models/experimental.py:92-111); cfg: bundled config name or path.
    """
    if device:
        jax.config.update("jax_platforms", device)
    from .cli.common import load_model_from_checkpoint

    if isinstance(weights, (list, tuple)) and len(weights) > 1:
        members = []
        for w in weights:
            model, params, stats = load_model_from_checkpoint(w, cfg, nc=nc)
            members.append((model,) + fuse_params(model, params, stats))
        return AutoShapeEnsemble(members, names=names)
    if isinstance(weights, (list, tuple)):
        weights = weights[0] if weights else None
    if weights is None and cfg is None:
        cfg = "yolov5s.yaml"  # fresh default model
    model, params, stats = load_model_from_checkpoint(weights, cfg, nc=nc)
    params, stats = fuse_params(model, params, stats)
    return AutoShape(model, params, stats, names=names)


class AutoShape:
    """Robust-input preprocess + inference + NMS wrapper.
    ref: models/common.py:701-793."""

    conf = 0.25
    iou = 0.45
    max_det = 1000
    multi_label = False

    def __init__(self, model: DetectionModel, params, stats, names=None,
                 dtype=jnp.bfloat16):
        self.model = model
        self.params = params
        self.stats = stats
        self.names = names or [str(i) for i in range(model.nc)]
        self.dtype = dtype
        # LRU-bounded: a stream of odd-sized inputs must not compile without
        # bound (each distinct letterboxed shape is one XLA program)
        self._infer_cache = _LRUCache(maxsize=8)

    def _infer(self, shape):
        # params passed as jit args (closure capture would embed them as
        # program constants — huge executables for big models)
        if shape not in self._infer_cache:
            model, dtype = self.model, self.dtype

            @jax.jit
            def fn(p, s, x):
                raw = model.apply(p, s, x.astype(dtype) / 255.0,
                                  dtype=dtype, fused=True)
                if not self.multi_label:
                    # serving fast path: head-aware fused decode (identical
                    # results to decode + single-label batched_nms)
                    return model.serve_detections(
                        raw, conf_thres=self.conf, iou_thres=self.iou,
                        max_det=self.max_det, max_nms=30000)
                dec = model.decode(raw)
                if dec.shape[-1] == model.nc + 4:
                    dec = jnp.concatenate(
                        [dec[..., :4], jnp.ones_like(dec[..., :1]), dec[..., 4:]], -1
                    )
                return batched_nms(dec, conf_thres=self.conf, iou_thres=self.iou,
                                   multi_label=True, max_det=self.max_det)

            self._infer_cache[shape] = lambda x: fn(self.params, self.stats, x)
        return self._infer_cache[shape]

    @staticmethod
    def _to_rgb_array(im) -> np.ndarray:
        if isinstance(im, (str, Path)):
            import cv2

            arr = cv2.imread(str(im))
            assert arr is not None, f"unreadable image {im}"
            return arr[:, :, ::-1]  # BGR -> RGB
        if hasattr(im, "convert"):  # PIL
            return np.asarray(im.convert("RGB"))
        arr = np.asarray(im)
        if arr.ndim == 3 and arr.shape[0] < 5:  # CHW
            arr = arr.transpose(1, 2, 0)
        if arr.ndim == 2:
            arr = np.tile(arr[..., None], 3)
        return arr[..., :3]

    def __call__(self, imgs, size: int = 640):
        single = not isinstance(imgs, (list, tuple))
        items = [imgs] if single else list(imgs)
        arrays = [self._to_rgb_array(im) for im in items]
        shapes0 = [a.shape[:2] for a in arrays]
        gs = int(self.model.stride.max())
        size = int(np.ceil(size / gs) * gs)

        lbs = [letterbox(a, size, auto=False, stride=gs)[0] for a in arrays]
        x = np.stack(lbs).astype(np.uint8)
        dets, valid = self._infer(x.shape)(jnp.asarray(x))
        dets, valid = np.asarray(dets), np.asarray(valid)
        per_img = []
        for i, s0 in enumerate(shapes0):
            d = dets[i][valid[i]].copy()
            d[:, :4] = _scale_to_native(d[:, :4], x.shape[1:3], s0)
            per_img.append(d)
        files = [Path(im).name if isinstance(im, (str, Path)) else f"image{i}.jpg"
                 for i, im in enumerate(items)]
        return Detections(arrays, per_img, files, self.names)


class AutoShapeEnsemble(AutoShape):
    """Multi-model NMS ensemble: per-model decodes concatenated on the
    candidate axis before a single NMS pass (reference Ensemble semantics,
    models/experimental.py:92-111)."""

    def __init__(self, members, names=None, dtype=jnp.bfloat16):
        model0 = members[0][0]
        super().__init__(model0, members[0][1], members[0][2], names=names, dtype=dtype)
        self.members = members
        # max stride across members governs letterbox rounding (ref
        # attempt_load, experimental.py:150)
        self.model.stride = max(m[0].stride.max() for m in members) * np.ones(1)

    def _infer(self, shape):
        if shape not in self._infer_cache:
            dtype = self.dtype
            members = self.members

            @jax.jit
            def fn(all_params, all_stats, x):
                decs = []
                for (model, _, _), p, s in zip(members, all_params, all_stats):
                    dec = model.decode(model.apply(p, s, x.astype(dtype) / 255.0,
                                                   dtype=dtype, fused=True))
                    if dec.shape[-1] == model.nc + 4:
                        dec = jnp.concatenate(
                            [dec[..., :4], jnp.ones_like(dec[..., :1]), dec[..., 4:]], -1
                        )
                    decs.append(dec)
                dec = jnp.concatenate(decs, axis=1)
                return batched_nms(dec, conf_thres=self.conf, iou_thres=self.iou,
                                   multi_label=self.multi_label, max_det=self.max_det)

            ps = [m[1] for m in self.members]
            ss = [m[2] for m in self.members]
            self._infer_cache[shape] = lambda x: fn(ps, ss, x)
        return self._infer_cache[shape]


class Detections:
    """Inference results: print/pandas/crop/render/save/show/tolist and the
    xyxy/xywh/xyxyn/xywhn box views.  ref: models/common.py:795-891."""

    def __init__(self, imgs: List[np.ndarray], dets: List[np.ndarray], files, names):
        self.imgs = imgs
        self.xyxy = dets  # list of (n, 6) [xyxy, conf, cls]
        self.files = files
        self.names = names
        self.n = len(imgs)
        # normalisation vector per image (w, h, w, h, 1, 1) — ref common.py:800
        gn = [np.array([im.shape[1], im.shape[0], im.shape[1], im.shape[0], 1, 1],
                       np.float32) for im in imgs]
        self.xywh = [self._to_xywh(d) for d in dets]
        self.xyxyn = [d / g for d, g in zip(self.xyxy, gn)]
        self.xywhn = [d / g for d, g in zip(self.xywh, gn)]

    @staticmethod
    def _to_xywh(d):
        from .eval.second_stage import _xyxy2xywh_np

        out = np.array(d, np.float32, copy=True).reshape(-1, 6)
        out[:, :4] = _xyxy2xywh_np(out[:, :4])
        return out

    def __len__(self):
        return self.n

    def pandas(self):
        """Copy whose xyxy/xyxyn/xywh/xywhn are per-image DataFrames — the
        canonical `results.pandas().xyxy[0]` idiom (ref common.py:874-882)."""
        import copy as _copy

        import pandas as pd

        new = _copy.copy(self)
        ca = ["xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"]
        cb = ["xcenter", "ycenter", "width", "height", "confidence", "class", "name"]
        for k, cols in zip(["xyxy", "xyxyn", "xywh", "xywhn"], [ca, ca, cb, cb]):
            frames = []
            for d in getattr(self, k):
                rows = [list(map(float, r[:5])) + [int(r[5]), self.names[int(r[5])]]
                        for r in np.asarray(d)]
                frames.append(pd.DataFrame(rows, columns=cols))
            setattr(new, k, frames)
        return new

    def tolist(self):
        """Per-image single-item Detections (ref common.py:884-890)."""
        return [Detections([self.imgs[i]], [self.xyxy[i]], [self.files[i]],
                           self.names) for i in range(self.n)]

    def show(self):
        """Display annotated images (PIL .show; headless-safe no-op on failure)."""
        from PIL import Image

        for im in self.render():
            try:
                Image.fromarray(im.astype(np.uint8)).show()
            except Exception:
                print("show(): no display available")
                return

    def print(self):
        for i, d in enumerate(self.xyxy):
            counts = {}
            for *_, k in d:
                counts[self.names[int(k)]] = counts.get(self.names[int(k)], 0) + 1
            summary = ", ".join(f"{v} {k}" for k, v in counts.items()) or "no detections"
            print(f"image {i + 1}/{self.n}: {self.imgs[i].shape[1]}x{self.imgs[i].shape[0]} {summary}")

    def render(self):
        """Draw boxes onto copies of the images; returns list of RGB arrays."""
        import cv2

        out = []
        for im, d in zip(self.imgs, self.xyxy):
            im = np.ascontiguousarray(im.copy())
            for x1, y1, x2, y2, conf, k in d:
                cv2.rectangle(im, (int(x1), int(y1)), (int(x2), int(y2)), (255, 60, 60), 2)
                cv2.putText(im, f"{self.names[int(k)]} {conf:.2f}",
                            (int(x1), max(int(y1) - 4, 8)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 60, 60), 1)
            out.append(im)
        return out

    def save(self, save_dir="runs/hub"):
        import cv2

        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        for i, im in enumerate(self.render()):
            cv2.imwrite(str((save_dir / self.files[i]).with_suffix(".jpg")),
                        im[:, :, ::-1])
        return save_dir

    def crop(self, save_dir=None):
        """Per-detection crops with save_one_box's gain/pad margin
        (ref common.py:825-828 -> general.py:916), optionally saved."""
        import cv2

        from .eval.second_stage import expand_boxes

        crops = []
        for im, d in zip(self.imgs, self.xyxy):
            for j, (x1, y1, x2, y2, conf, k) in enumerate(d):
                h, w = im.shape[:2]
                ex1, ey1, ex2, ey2 = expand_boxes((x1, y1, x2, y2))[0]
                crop = im[int(max(ey1, 0)):int(min(ey2, h)),
                          int(max(ex1, 0)):int(min(ex2, w))]
                crops.append({"box": (x1, y1, x2, y2), "conf": conf,
                              "cls": int(k), "label": self.names[int(k)], "im": crop})
                if save_dir:
                    p = Path(save_dir) / self.names[int(k)]
                    p.mkdir(parents=True, exist_ok=True)
                    cv2.imwrite(str(p / f"crop{len(crops)}.jpg"), crop[:, :, ::-1])
        return crops
