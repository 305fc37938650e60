"""Second-stage classifier over detections + save_one_box crop math.

Reference surfaces:
- ``apply_classifier`` (utils/general.py:881-914): square each detection
  box (wh -> max), pad (*1.3 + 30), truncate, letterbox-invert, crop from
  the native BGR image, resize to 224, RGB-normalise, run a classifier,
  and keep only detections whose detector class agrees with the
  classifier's argmax.  Upstream this is dead-by-default (detect.py:88
  hardcodes ``classify=False``) and its ``load_classifier``
  (torch_utils.py:245) needs a torchvision download; ours takes ANY
  dmayolo checkpoint whose config ends in a ``Classify`` head, or any
  callable, and batches all crops of an image through one jitted program
  per power-of-two bucket.
- ``save_one_box`` (utils/general.py:916-929): crop a detection with a
  gain/pad margin, optionally squared, clipped to the image.

Host-side numpy/cv2 code — the classifier forward is the only device
work.
"""
from __future__ import annotations

import numpy as np


def _xyxy2xywh_np(b):
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=1)


def _xywh2xyxy_np(b):
    cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


def expand_boxes(xyxy, gain: float = 1.02, pad: float = 10.0, square: bool = False):
    """save_one_box's margin math (general.py:918-923): wh*gain + pad,
    optionally squared to max(w, h) first; truncated like torch .long()."""
    b = _xyxy2xywh_np(np.asarray(xyxy, np.float64).reshape(-1, 4))
    if square:
        m = b[:, 2:4].max(axis=1)
        b[:, 2] = b[:, 3] = m
    b[:, 2:4] = b[:, 2:4] * gain + pad
    return np.trunc(_xywh2xyxy_np(b))


def save_one_box(xyxy, im, file=None, gain: float = 1.02, pad: float = 10.0,
                 square: bool = False, BGR: bool = False, save: bool = True):
    """Crop one detection with margin; optionally write it (general.py:916).

    `im` is HWC BGR (cv2 layout); returns the crop in RGB unless BGR=True,
    exactly like the reference.  `file` is the destination path when
    ``save``; parent dirs are created.
    """
    box = expand_boxes(xyxy, gain=gain, pad=pad, square=square)[0]
    h, w = im.shape[:2]
    x1, y1 = int(np.clip(box[0], 0, w)), int(np.clip(box[1], 0, h))
    x2, y2 = int(np.clip(box[2], 0, w)), int(np.clip(box[3], 0, h))
    crop = im[y1:y2, x1:x2, ::(1 if BGR else -1)]
    if save and file is not None and crop.size:
        import cv2
        from pathlib import Path

        f = Path(file).with_suffix(".jpg")
        f.parent.mkdir(parents=True, exist_ok=True)
        # cv2 writes BGR; flip back if the crop was returned RGB
        cv2.imwrite(str(f), crop if BGR else crop[:, :, ::-1])
    return crop


def apply_classifier(dets, classifier_fn, lb_shape, im0s, size: int = 224):
    """Second-stage agreement filter (general.py:881-914).

    dets: list of (n, 6) numpy [x1 y1 x2 y2 conf cls] in LETTERBOX coords
      (the reference filters pre-scale_coords detections too).
    classifier_fn: (N, size, size, 3) float32 RGB in [0, 1] NHWC ->
      (N, n_classes) logits/scores; argmax must be class-index-aligned
      with the detector's classes.
    lb_shape: (h, w) of the letterboxed model input.
    im0s: native BGR image per entry of dets.

    Returns the filtered list; boxes keep their original (un-expanded,
    letterbox-coord) values like the reference (it clones before
    expanding).
    """
    import cv2

    out = []
    for d, im0 in zip(dets, im0s):
        d = np.asarray(d, np.float32)
        if d.shape[0] == 0:
            out.append(d)
            continue
        # square to max(w,h), *1.3 + 30, truncate (general.py:889-892)
        box = expand_boxes(d[:, :4], gain=1.3, pad=30.0, square=True)
        # letterbox-invert + clip (general.py:895 scale_coords)
        gain = min(lb_shape[0] / im0.shape[0], lb_shape[1] / im0.shape[1])
        pad_x = (lb_shape[1] - im0.shape[1] * gain) / 2
        pad_y = (lb_shape[0] - im0.shape[0] * gain) / 2
        box[:, [0, 2]] = ((box[:, [0, 2]] - pad_x) / gain).clip(0, im0.shape[1])
        box[:, [1, 3]] = ((box[:, [1, 3]] - pad_y) / gain).clip(0, im0.shape[0])
        ims, ok = [], np.ones(d.shape[0], bool)
        for j, (x1, y1, x2, y2) in enumerate(box):
            cut = im0[int(y1):int(y2), int(x1):int(x2)]
            if cut.size == 0:  # degenerate after clip: unclassifiable, drop
                ok[j] = False  # (the reference crashes here; we filter)
                continue
            cut = cv2.resize(cut, (size, size))[:, :, ::-1]  # BGR->RGB
            ims.append(cut.astype(np.float32) / 255.0)
        if not ims:
            out.append(d[:0])
            continue
        logits = np.asarray(classifier_fn(np.stack(ims)))
        cls2 = logits.argmax(1)
        agree = np.zeros(d.shape[0], bool)
        agree[ok] = d[ok, 5].astype(int) == cls2[: int(ok.sum())]
        out.append(d[agree])
    return out


def load_second_stage(weights: str, cfg: str | None = None):
    """Build a bucketed-jit classifier_fn from a dmayolo checkpoint whose
    config ends in a ``Classify`` head (nn/blocks.py Classify; ref
    common.py:893-910 / torch_utils.py:245 load_classifier analog)."""
    import jax
    import jax.numpy as jnp

    from ..cli.common import load_model_from_checkpoint
    from ..nn.fuse import fuse_params

    model, params, stats = load_model_from_checkpoint(weights, cfg)
    params, stats = fuse_params(model, params, stats)

    @jax.jit
    def _fwd(p, s, x):
        return model.apply(p, s, x, dtype=jnp.bfloat16, fused=True).astype(jnp.float32)

    def classifier_fn(x):
        n = x.shape[0]
        b = 1 << (n - 1).bit_length()  # pad to pow2: one program per bucket
        if b != n:
            x = np.concatenate([x, np.zeros((b - n,) + x.shape[1:], x.dtype)])
        return np.asarray(_fwd(params, stats, jnp.asarray(x)))[:n]

    return classifier_fn
