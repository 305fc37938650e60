"""Dataset scanning, label caching, and per-item augmentation.

Feature-parity with the reference training dataset
(ref: utils/datasets.py:376-822 LoadImagesAndLabels + mosaic):
  * /images/ <-> /labels/ txt convention (datasets.py:370-373)
  * hash-validated .cache of parsed labels (datasets.py:507-541)
  * mosaic-4 (+mixup) or letterbox + random_perspective per item
  * HSV jitter, lr/ud flips
  * rect-batch shape planning for eval (datasets.py:462-483)

Returns numpy uint8 HWC RGB images + (n, 5) [cls, xywhn] labels; batching
to dense device arrays happens in loader.py.
"""
from __future__ import annotations

import hashlib
import os
import random
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np
import yaml

from .augment import (augment_hsv, copy_paste, cutout, flip_lr, flip_ud,
                      letterbox, mixup, photometric, random_perspective,
                      segments2boxes)

IMG_FORMATS = {"bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp", "mpo"}


def img2label_paths(img_paths: List[str]) -> List[str]:
    """/images/ -> /labels/, .ext -> .txt.  ref: datasets.py:370-373."""
    sa, sb = os.sep + "images" + os.sep, os.sep + "labels" + os.sep
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def check_dataset(data) -> Dict:
    """Parse a dataset yaml (path/train/val/test/nc/names).
    ref: utils/general.py:357-406 (without the network download path —
    this environment is offline; missing data is an error)."""
    if isinstance(data, (str, Path)):
        with open(data, errors="ignore") as f:
            d = yaml.safe_load(f)
        root = Path(d.get("path") or Path(data).parent)
    else:
        d = dict(data)
        root = Path(d.get("path") or ".")
    for k in ("train", "val", "test"):
        if d.get(k):
            v = d[k]
            if isinstance(v, str):
                d[k] = str(root / v) if not Path(v).is_absolute() else v
            else:
                d[k] = [str(root / x) for x in v]
    if "names" not in d:
        d["names"] = [str(i) for i in range(d["nc"])]
    assert len(d["names"]) == d["nc"], (len(d["names"]), d["nc"])

    # the reference auto-downloads missing datasets (general.py:416-447,
    # VisDrone.yaml download block); this build is offline-first, so a
    # missing dataset gets actionable setup instructions instead
    # gate on `val` like the reference (a train-only gap still fails at the
    # scan with the offending path); list whatever else is absent alongside
    def _missing(k):  # str or list-of-str (VOC-style multi-dir splits)
        v = d.get(k)
        paths = [v] if isinstance(v, str) else (v or [])
        return [p for p in paths if not Path(p).exists()]

    if _missing("val"):
        missing = [p for k in ("train", "val") for p in _missing(k)]
        name = Path(str(data)).stem.lower() if isinstance(data, (str, Path)) else ""
        hint = ""
        if "visdrone" in name:
            hint = (
                "\nVisDrone setup (offline): download the VisDrone2019-DET "
                "zips from https://github.com/VisDrone/VisDrone-Dataset on a "
                "connected machine, unzip under the yaml's `path`, then "
                "convert annotations:\n"
                "  python tools/visdrone2yolo.py <path>/VisDrone2019-DET-train\n"
                "  python tools/visdrone2yolo.py <path>/VisDrone2019-DET-val"
            )
        elif "uavdt" in name:
            hint = (
                "\nUAVDT setup (offline): obtain the UAV-benchmark-M archive, "
                "unpack under the yaml's `path`, then:\n"
                "  python tools/uavdt2yolo.py <path>/UAV-benchmark-M "
                "<path>/UAV-benchmark-MOTD_v1.0/GT\n"
                "  python tools/verify_labels.py <path>/images/train"
            )
        elif d.get("download"):
            hint = ("\nThe dataset yaml carries an upstream `download` recipe; "
                    "run it on a connected machine and place the result under "
                    "the yaml's `path`.")
        raise FileNotFoundError(
            f"dataset paths missing: {list(dict.fromkeys(missing))}{hint}")
    return d


def _scan_images(path) -> List[str]:
    """ref: datasets.py:393-404 (dir walk / txt filelist)."""
    files: List[str] = []
    for p in path if isinstance(path, list) else [path]:
        p = Path(p)
        if p.is_dir():
            files += [str(x) for x in sorted(p.rglob("*.*"))]
        elif p.is_file():  # txt list of image paths
            with open(p) as f:
                parent = str(p.parent) + os.sep
                files += [
                    x.replace("./", parent) if x.startswith("./") else x
                    for x in f.read().strip().splitlines()
                ]
        else:
            raise FileNotFoundError(f"{p} does not exist")
    return sorted(x for x in files if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS)


def _paths_hash(paths: List[str]) -> str:
    """size+mtime hash of the file set (cache validation).
    ref: datasets.py:33-37 get_hash."""
    h = hashlib.md5()
    for p in paths:
        try:
            st = os.stat(p)
            h.update(f"{p}{st.st_size}{st.st_mtime_ns}".encode())
        except OSError:
            h.update(p.encode())
    return h.hexdigest()


def verify_image_label(im_file: str, lb_file: str, nc: int):
    """Validate one image/label pair.  ref: datasets.py:884-931."""
    try:
        im = cv2.imread(im_file)
        if im is None:
            return None, f"unreadable image {im_file}"
        shape = im.shape[:2]
        if shape[0] < 10 or shape[1] < 10:
            return None, f"image too small {shape}"
        segments = []
        if os.path.isfile(lb_file):
            with open(lb_file) as f:
                lb = [x.split() for x in f.read().strip().splitlines() if len(x)]
            if any(len(x) > 6 for x in lb):  # polygon rows: cls + xy pairs
                classes = np.array([x[0] for x in lb], np.float32)
                segments = [np.array(x[1:], np.float32).reshape(-1, 2) for x in lb]
                lb = np.concatenate(
                    (classes.reshape(-1, 1), segments2boxes(segments)), 1
                )
            else:
                lb = np.array(lb, dtype=np.float32) if lb else np.zeros((0, 5), np.float32)
            if len(lb):
                if lb.shape[1] != 5:
                    return None, f"labels require 5 columns, got {lb.shape[1]}"
                if (lb < 0).any():
                    return None, "negative label values"
                if (lb[:, 1:] > 1).any():
                    return None, "non-normalised coordinates"
                if (lb[:, 0] >= nc).any():
                    return None, f"class id >= nc={nc}"
                _, idx = np.unique(lb, axis=0, return_index=True)
                if len(idx) < len(lb):
                    keep = np.sort(idx)
                    lb = lb[keep]
                    if segments:  # stay row-aligned with lb (ref datasets.py:941)
                        segments = [segments[x] for x in keep]
        else:
            lb = np.zeros((0, 5), np.float32)
        return (im_file, lb, shape, segments), None
    except Exception as e:  # corrupt file
        return None, f"{im_file}: {e}"


class DetectionDataset:
    """Training/eval dataset with mosaic pipeline."""

    CACHE_VERSION = "dmayolo-0.3"  # 0.3: +im_files (post-filter alignment)

    def __init__(self, path, img_size=640, augment=False, hyp: Optional[Dict] = None,
                 rect=False, stride=32, pad=0.0, nc=80, batch_size=16,
                 seed: int = 0, cache_images=False, single_cls=False,
                 cache_disk=False, fastload=False):
        self.img_size = img_size
        self.augment = augment
        self.hyp = hyp or {}
        self.rect = rect
        self.stride = stride
        self.pad = pad
        self.nc = nc
        self.mosaic = augment and not rect
        self.fastload = fastload
        self.mosaic_border = (-img_size // 2, -img_size // 2)
        self.rng = random.Random(seed)

        self.im_files = _scan_images(path)
        assert self.im_files, f"no images found in {path}"
        self.label_files = img2label_paths(self.im_files)
        self.labels, self.shapes = self._load_labels()
        if single_cls:  # ref datasets.py:456-459
            for lb in self.labels:
                if len(lb):
                    lb[:, 0] = 0
        self.n = len(self.im_files)
        self.indices = list(range(self.n))

        self._im_cache: Dict[int, tuple] = {}
        self.cache_images = cache_images
        self.cache_disk = cache_disk  # resized-image .npy cache (ref datasets.py:486-505)

        if self.rect:
            self._plan_rect_batches(batch_size)

    # -- label cache (ref: datasets.py:507-541) -----------------------------
    def _load_labels(self):
        cache_path = Path(self.label_files[0]).parent.with_suffix(".cache.npz") if self.label_files else None
        h = _paths_hash(self.im_files + self.label_files)
        if cache_path and cache_path.is_file():
            try:
                z = np.load(cache_path, allow_pickle=True)
                if (str(z["version"]) == self.CACHE_VERSION
                        and str(z["hash"]) == h and "im_files" in z.files):
                    # restore the SURVIVING file lists too: the hash covers
                    # the pre-filter set, so a scan that dropped corrupt
                    # files would otherwise leave im_files longer than
                    # labels and misalign every pair past the first drop
                    self.im_files = [str(f) for f in z["im_files"]]
                    self.label_files = img2label_paths(self.im_files)
                    segs = list(z["segments"]) if "segments" in z.files else [[] for _ in z["labels"]]
                    self.segments = segs
                    return list(z["labels"]), z["shapes"]
            except Exception:
                pass
        labels, shapes, ok_files, ok_labels, all_segs = [], [], [], [], []
        for im_f, lb_f in zip(self.im_files, self.label_files):
            res, msg = verify_image_label(im_f, lb_f, self.nc)
            if res is None:
                continue
            _, lb, shape, segs = res
            ok_files.append(im_f)
            ok_labels.append(lb_f)
            labels.append(lb)
            shapes.append(shape)
            all_segs.append(segs)
        self.segments = all_segs
        self.im_files, self.label_files = ok_files, ok_labels
        shapes = np.array(shapes, np.int64)
        if cache_path:
            try:
                # explicit 1-D object containers: np.array(..., dtype=object)
                # on same-shape rows builds a (n, k, 5) object ndarray whose
                # reload yields boxed-object labels (silent slow math)
                lab_arr = np.empty(len(labels), object)
                lab_arr[:] = labels
                seg_arr = np.empty(len(self.segments), object)
                seg_arr[:] = self.segments
                np.savez(
                    cache_path.with_suffix(""), version=self.CACHE_VERSION, hash=h,
                    labels=lab_arr, shapes=shapes, segments=seg_arr,
                    im_files=np.array(self.im_files, dtype=object),
                )
            except Exception:
                pass
        return labels, shapes

    # -- rect batching (ref: datasets.py:462-483) ---------------------------
    def _plan_rect_batches(self, batch_size: int):
        n = len(self.shapes)
        bi = np.floor(np.arange(n) / batch_size).astype(int)
        nb = bi[-1] + 1
        s = self.shapes  # (h, w)
        ar = s[:, 0] / s[:, 1]
        irect = ar.argsort()
        self.im_files = [self.im_files[i] for i in irect]
        self.label_files = [self.label_files[i] for i in irect]
        self.labels = [self.labels[i] for i in irect]
        self.segments = [self.segments[i] for i in irect]
        self.shapes = s[irect]
        ar = ar[irect]
        shapes = [[1, 1]] * nb
        for i in range(nb):
            ari = ar[bi == i]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                shapes[i] = [maxi, 1]
            elif mini > 1:
                shapes[i] = [1, 1 / mini]
        self.batch_shapes = (
            np.ceil(np.array(shapes) * self.img_size / self.stride + self.pad).astype(int)
            * self.stride
        )
        self.batch_index = bi

    # -- image io (ref: datasets.py:659-677) --------------------------------
    def load_image(self, i: int):
        if i in self._im_cache:
            return self._im_cache[i]
        # cache name carries the source suffix AND img_size: a bare
        # .npy would be stale across --img-size changes and collide for
        # same-stem files (photo.jpg vs photo.png)
        p = Path(self.im_files[i])
        npy = (p.parent / f"{p.name}.{self.img_size}.npy"
               if self.cache_disk else None)
        if npy is not None and npy.exists():
            try:
                im, h0, w0 = None, *np.load(str(npy) + ".meta.npy")
                im = np.load(npy)
                out = (im, (int(h0), int(w0)), im.shape[:2])
                if self.cache_images:
                    self._im_cache[i] = out
                return out
            except Exception:
                pass
        if self.fastload:
            # native decode+resize in one GIL-free call (JPEG only; falls
            # back below for other formats / decode errors)
            from . import fastload as _fl

            res = _fl.load(self.im_files[i], self.img_size, self.augment)
            if res is not None:
                im, (h0, w0), hw = res
                out = (im, (h0, w0), hw)
                if npy is not None and not npy.exists():
                    try:  # --cache disk must populate from this path too
                        np.save(npy, im)
                        np.save(str(npy) + ".meta.npy", np.array([h0, w0]))
                    except OSError:
                        pass
                if self.cache_images:
                    self._im_cache[i] = out
                return out
        im = cv2.imread(self.im_files[i])  # BGR
        assert im is not None, f"Image Not Found {self.im_files[i]}"
        h0, w0 = im.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_AREA if r < 1 and not self.augment else cv2.INTER_LINEAR
            im = cv2.resize(im, (int(w0 * r), int(h0 * r)), interpolation=interp)
        out = (im, (h0, w0), im.shape[:2])
        if npy is not None and not npy.exists():
            try:
                np.save(npy, im)
                np.save(str(npy) + ".meta.npy", np.array([h0, w0]))
            except OSError:
                pass
        if self.cache_images:
            self._im_cache[i] = out
        return out

    # -- mosaic (ref: datasets.py:680-747) ----------------------------------
    def load_mosaic(self, index: int, rng=None):
        rng = self.rng if rng is None else rng
        s = self.img_size
        yc = int(rng.uniform(-self.mosaic_border[0], 2 * s + self.mosaic_border[0]))
        xc = int(rng.uniform(-self.mosaic_border[1], 2 * s + self.mosaic_border[1]))
        indices = [index] + rng.choices(self.indices, k=3)
        rng.shuffle(indices)
        labels4, segments4 = [], []
        im4 = np.full((s * 2, s * 2, 3), 114, np.uint8)
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:  # top left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            im4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            lb = self.labels[idx].copy()
            segs = [sg.copy() for sg in self.segments[idx]] if len(self.segments[idx]) else []
            if len(lb):
                lb[:, 1:] = _xywhn2xyxy_np(lb[:, 1:], w, h, padw, padh)
                for sg in segs:
                    sg[:, 0] = sg[:, 0] * w + padw
                    sg[:, 1] = sg[:, 1] * h + padh
            labels4.append(lb)
            segments4.extend(segs)
        labels4 = np.concatenate(labels4, 0) if labels4 else np.zeros((0, 5), np.float32)
        np.clip(labels4[:, 1:], 0, 2 * s, out=labels4[:, 1:])
        for sg in segments4:
            np.clip(sg, 0, 2 * s, out=sg)
        im4, labels4, segments4 = copy_paste(
            im4, labels4, segments4, p=self.hyp.get("copy_paste", 0.0), rng=rng
        )
        im4, labels4 = random_perspective(
            im4,
            labels4,
            degrees=self.hyp.get("degrees", 0.0),
            translate=self.hyp.get("translate", 0.1),
            scale=self.hyp.get("scale", 0.5),
            shear=self.hyp.get("shear", 0.0),
            perspective=self.hyp.get("perspective", 0.0),
            border=self.mosaic_border,
            rng=rng,
            segments=segments4 if segments4 else None,
        )
        return im4, labels4

    def load_mosaic9(self, index: int, rng=None):
        """9-image mosaic.  ref: datasets.py:750-808."""
        rng = self.rng if rng is None else rng
        s = self.img_size
        indices = [index] + rng.choices(self.indices, k=8)
        rng.shuffle(indices)
        labels9, segments9 = [], []
        im9 = np.full((s * 3, s * 3, 3), 114, np.uint8)
        hp = wp = h0 = w0 = 0
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:  # center
                h0, w0 = h, w
                c = (s, s, s + w, s + h)
            elif i == 1:  # top
                c = (s, s - h, s + w, s)
            elif i == 2:  # top right
                c = (s + wp, s - h, s + wp + w, s)
            elif i == 3:  # right
                c = (s + w0, s, s + w0 + w, s + h)
            elif i == 4:  # bottom right
                c = (s + w0, s + hp, s + w0 + w, s + hp + h)
            elif i == 5:  # bottom
                c = (s + w0 - w, s + h0, s + w0, s + h0 + h)
            elif i == 6:  # bottom left
                c = (s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h)
            elif i == 7:  # left
                c = (s - w, s + h0 - h, s, s + h0)
            else:  # top left
                c = (s - w, s + h0 - hp - h, s, s + h0 - hp)
            padx, pady = c[:2]
            x1, y1, x2, y2 = (max(v, 0) for v in c)
            lb = self.labels[idx].copy()
            segs = [sg.copy() for sg in self.segments[idx]] if len(self.segments[idx]) else []
            if lb.size:
                lb[:, 1:] = _xywhn2xyxy_np(lb[:, 1:], w, h, padx, pady)
                for sg in segs:
                    sg[:, 0] = sg[:, 0] * w + padx
                    sg[:, 1] = sg[:, 1] * h + pady
            labels9.append(lb)
            segments9.extend(segs)
            im9[y1:y2, x1:x2] = img[y1 - pady :, x1 - padx :][: y2 - y1, : x2 - x1]
            hp, wp = h, w

        yc = int(rng.uniform(0, s))
        xc = int(rng.uniform(0, s))
        im9 = im9[yc : yc + 2 * s, xc : xc + 2 * s]
        labels9 = np.concatenate(labels9, 0) if labels9 else np.zeros((0, 5), np.float32)
        if labels9.size:
            labels9[:, [1, 3]] -= xc
            labels9[:, [2, 4]] -= yc
        for sg in segments9:
            sg -= np.array([xc, yc])
        np.clip(labels9[:, 1:], 0, 2 * s, out=labels9[:, 1:])
        for sg in segments9:
            np.clip(sg, 0, 2 * s, out=sg)
        im9, labels9 = random_perspective(
            im9, labels9,
            degrees=self.hyp.get("degrees", 0.0),
            translate=self.hyp.get("translate", 0.1),
            scale=self.hyp.get("scale", 0.5),
            shear=self.hyp.get("shear", 0.0),
            perspective=self.hyp.get("perspective", 0.0),
            border=self.mosaic_border,
            rng=rng,
            segments=segments9 if segments9 else None,
        )
        return im9, labels9

    # -- item (ref: datasets.py:552-622) ------------------------------------
    def __len__(self):
        return self.n

    def __getitem__(self, index: int):
        return self.get(index, self.rng)

    def get(self, index: int, rng):
        """Item fetch with an explicit rng.

        The loader's worker threads call this with a per-sample
        `random.Random(hash((seed, epoch, index)))` so the augmentation
        stream is a pure function of (seed, epoch, index) — independent of
        thread interleaving.  (`__getitem__` keeps the shared-rng path for
        direct sequential use.)"""
        hyp = self.hyp
        if self.mosaic and rng.random() < hyp.get("mosaic", 1.0):
            if rng.random() < hyp.get("mosaic9", 0.0):
                img, labels = self.load_mosaic9(index, rng)
            else:
                img, labels = self.load_mosaic(index, rng)
            if rng.random() < hyp.get("mixup", 0.0):
                img2, labels2 = self.load_mosaic(rng.choice(self.indices), rng)
                img, labels = mixup(img, labels, img2, labels2, rng)
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            shape = (
                self.batch_shapes[self.batch_index[index]]
                if self.rect
                else self.img_size
            )
            img, ratio, pad = letterbox(img, shape, auto=False, scaleup=self.augment)
            labels = self.labels[index].copy()
            if len(labels):
                labels[:, 1:] = _xywhn2xyxy_np(
                    labels[:, 1:], ratio[0] * w, ratio[1] * h, pad[0], pad[1]
                )
            if self.augment:
                img, labels = random_perspective(
                    img,
                    labels,
                    degrees=hyp.get("degrees", 0.0),
                    translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5),
                    shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0),
                    rng=rng,
                )

        nl = len(labels)
        out = np.zeros((nl, 5), np.float32)
        if nl:
            out[:, 0] = labels[:, 0]
            out[:, 1:] = _xyxy2xywhn_np(labels[:, 1:5], img.shape[1], img.shape[0])

        if self.augment and hyp.get("cutout", 0.0) > 0:
            # labels back to pixel xyxy for the IOA filter, then re-normalise
            if nl:
                px = out.copy()
                px[:, 1:] = _xywhn2xyxy_np(out[:, 1:], img.shape[1], img.shape[0])
                px = cutout(img, px, p=hyp["cutout"], rng=rng)
                nl = len(px)
                out = np.zeros((nl, 5), np.float32)
                if nl:
                    out[:, 0] = px[:, 0]
                    out[:, 1:] = _xyxy2xywhn_np(px[:, 1:5], img.shape[1], img.shape[0])
            else:
                cutout(img, np.zeros((0, 5), np.float32), p=hyp["cutout"], rng=rng)
        if self.augment:
            # photometric pipeline sits where the reference runs its optional
            # Albumentations pass: after geometry, before HSV (datasets.py:585)
            img = photometric(img, hyp, rng)
            augment_hsv(
                img,
                hyp.get("hsv_h", 0.015),
                hyp.get("hsv_s", 0.7),
                hyp.get("hsv_v", 0.4),
                rng,
            )
            if rng.random() < hyp.get("flipud", 0.0):
                img, out = flip_ud(img, out)
            if rng.random() < hyp.get("fliplr", 0.5):
                img, out = flip_lr(img, out)

        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return np.ascontiguousarray(img), out


def _xywhn2xyxy_np(x, w, h, padw=0, padh=0):
    y = np.empty_like(x)
    y[:, 0] = w * (x[:, 0] - x[:, 2] / 2) + padw
    y[:, 1] = h * (x[:, 1] - x[:, 3] / 2) + padh
    y[:, 2] = w * (x[:, 0] + x[:, 2] / 2) + padw
    y[:, 3] = h * (x[:, 1] + x[:, 3] / 2) + padh
    return y


def _xyxy2xywhn_np(x, w, h, eps=1e-3):
    x = x.copy()
    x[:, [0, 2]] = x[:, [0, 2]].clip(0, w - eps)
    x[:, [1, 3]] = x[:, [1, 3]].clip(0, h - eps)
    y = np.empty_like(x)
    y[:, 0] = ((x[:, 0] + x[:, 2]) / 2) / w
    y[:, 1] = ((x[:, 1] + x[:, 3]) / 2) / h
    y[:, 2] = (x[:, 2] - x[:, 0]) / w
    y[:, 3] = (x[:, 3] - x[:, 1]) / h
    return y
