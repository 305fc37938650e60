"""Host-side image augmentation (numpy/cv2), feature-parity with the
reference pipeline (ref: utils/augmentations.py).

These run in loader worker threads (cv2 releases the GIL); images reach the
device as one uint8 NHWC batch per step, so host->TPU bandwidth stays
minimal and normalisation happens on-device.  A Pallas-fused on-device
variant of the hot ops (HSV + flip + normalise) can slot in later without
changing the data contract.

Labels here are (n, 5) [cls, x1, y1, x2, y2] pixel xyxy unless stated.
"""
from __future__ import annotations

import math
import random
from typing import Tuple

import cv2
import numpy as np

cv2.setNumThreads(0)  # ref: utils/general.py:38 — avoid thread explosions


def letterbox(im, new_shape=(640, 640), color=(114, 114, 114), auto=True,
              scale_fill=False, scaleup=True, stride=32):
    """Aspect-preserving resize + pad.  ref: utils/augmentations.py:92-122."""
    shape = im.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, ratio, (dw, dh)


def augment_hsv(im, hgain=0.5, sgain=0.5, vgain=0.5, rng: random.Random = random):
    """LUT-based HSV jitter in place.  ref: utils/augmentations.py:48-61."""
    if not (hgain or sgain or vgain):
        return
    r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(im.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(im.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(im.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=im)


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1, eps=1e-16):
    """Keep boxes that survive the affine sanely.  ref: augmentations.py:273-278."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_perspective(im, targets=np.zeros((0, 5)), degrees=10, translate=0.1,
                       scale=0.1, shear=10, perspective=0.0, border=(0, 0),
                       rng: random.Random = random, segments=None):
    """Combined centre/perspective/rotate/scale/shear/translate warp of image
    + xyxy boxes.  ref: utils/augmentations.py:125-211."""
    height = im.shape[0] + border[0] * 2
    width = im.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -im.shape[1] / 2
    C[1, 2] = -im.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            im = cv2.warpPerspective(im, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            im = cv2.warpAffine(im, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    n = len(targets)
    if n:
        use_segments = segments is not None and len(segments) == n and any(len(s) for s in segments)
        if use_segments:  # warp polygons (ref augmentations.py:180-192)
            segments = resample_segments(segments)
            new = np.zeros((n, 4))
            for i, seg in enumerate(segments):
                xy = np.ones((len(seg), 3))
                xy[:, :2] = seg
                xy = xy @ M.T
                xy = xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]
                new[i] = segment2box(xy, width, height)
            keep = box_candidates(box1=targets[:, 1:5].T * s, box2=new.T, area_thr=0.01)
            targets = targets[keep]
            targets[:, 1:5] = new[keep]
            return im, targets
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = box_candidates(box1=targets[:, 1:5].T * s, box2=new.T, area_thr=0.10)
        targets = targets[keep]
        targets[:, 1:5] = new[keep]
    return im, targets


def segment2box(segment, width=640, height=640):
    """Polygon -> clipped xyxy box.  ref: utils/general.py:579-585."""
    x, y = segment.T
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    return (np.array([x.min(), y.min(), x.max(), y.max()])
            if x.size else np.zeros(4))


def segments2boxes(segments):
    """Polygons -> (n, 4) xywh boxes.  ref: utils/general.py:587-593."""
    boxes = []
    for seg in segments:
        x, y = seg.T
        boxes.append([x.min(), y.min(), x.max(), y.max()])
    b = np.asarray(boxes, np.float32)
    out = np.empty_like(b)
    out[:, 0] = (b[:, 0] + b[:, 2]) / 2
    out[:, 1] = (b[:, 1] + b[:, 3]) / 2
    out[:, 2] = b[:, 2] - b[:, 0]
    out[:, 3] = b[:, 3] - b[:, 1]
    return out


def resample_segments(segments, n=1000):
    """Upsample each (m, 2) polygon to n points.  ref: general.py:596-602."""
    out = []
    for seg in segments:
        seg = np.concatenate((seg, seg[0:1]), 0)
        x = np.linspace(0, len(seg) - 1, n)
        xp = np.arange(len(seg))
        out.append(
            np.stack([np.interp(x, xp, seg[:, i]) for i in range(2)], -1)
        )
    return out


def copy_paste(im, labels, segments, p=0.5, rng: random.Random = random):
    """Segment flip-paste augmentation (IOA < 0.30 gate).
    ref: utils/augmentations.py:214-235."""
    n = len(segments)
    # labels[j] pairs with segments[j] POSITIONALLY; a mosaic mixing
    # box-only and polygon images yields len(segments) < len(labels) and
    # the pairing is meaningless (the reference has the same latent
    # assumption) — apply only when every label carries a segment
    if n != len(labels):
        return im, labels, segments
    if p and n:
        import cv2

        h, w = im.shape[:2]
        im_new = np.zeros(im.shape, np.uint8)
        for j in rng.sample(range(n), k=round(p * n)):
            l, seg = labels[j], segments[j]
            box = np.array([w - l[3], l[2], w - l[1], l[4]])
            ioa = _bbox_ioa(box, labels[:, 1:5])
            if (ioa < 0.30).all():
                labels = np.concatenate((labels, [[l[0], *box]]), 0)
                segments.append(np.concatenate((w - seg[:, 0:1], seg[:, 1:2]), 1))
                cv2.drawContours(im_new, [segments[j].astype(np.int32)], -1,
                                 (255, 255, 255), cv2.FILLED)
        result = cv2.bitwise_and(src1=im, src2=im_new)
        result = cv2.flip(result, 1)
        mask = result > 0
        im[mask] = result[mask]
    return im, labels, segments


def mixup(im, labels, im2, labels2, rng: random.Random = random):
    """beta(32,32) image blend.  ref: utils/augmentations.py:257-263."""
    # derive the beta sample from the threaded rng so seeded runs reproduce
    r = np.random.default_rng(rng.getrandbits(32)).beta(32.0, 32.0)
    im = (im * r + im2 * (1 - r)).astype(np.uint8)
    return im, np.concatenate((labels, labels2), 0)


def blur(im, k: int):
    """Box blur with an odd kernel (cv2.blur)."""
    return cv2.blur(im, (k, k))


def median_blur(im, k: int):
    """Median blur with an odd kernel (cv2.medianBlur)."""
    return cv2.medianBlur(im, k)


def to_gray(im):
    """Collapse to luma and replicate back to 3 channels (BGR input)."""
    g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)


def clahe(im, clip_limit: float = 2.0, tile: int = 8):
    """Contrast-limited adaptive histogram equalisation on the LAB
    lightness channel (BGR in/out)."""
    lab = cv2.cvtColor(im, cv2.COLOR_BGR2LAB)
    lab[..., 0] = cv2.createCLAHE(
        clipLimit=float(clip_limit), tileGridSize=(tile, tile)
    ).apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)


def brightness_contrast(im, alpha: float = 1.0, beta: float = 0.0):
    """out = clip(im * alpha + beta * 255); alpha = contrast, beta = brightness."""
    return np.clip(im.astype(np.float32) * alpha + beta * 255.0, 0, 255).astype(np.uint8)


def photometric(im, hyp, rng: random.Random = random):
    """Native equivalent of the reference's optional Albumentations pipeline
    (utils/augmentations.py:17-45): blur / median-blur / grayscale / CLAHE /
    brightness-contrast, each an independent per-image Bernoulli draw.

    Gated behind hyp keys (all default 0 = off, like cutout):
      blur, median_blur, to_gray, clahe, brightness_contrast
    The reference pipeline's probabilities are (0.01, 0.3, 0.01, 0.3, 0.3);
    its kernel/clip parameter draws are reproduced here. Photometric only —
    boxes are untouched.
    """
    if rng.random() < hyp.get("blur", 0.0):
        im = blur(im, rng.choice([3, 5, 7]))
    if rng.random() < hyp.get("median_blur", 0.0):
        im = median_blur(im, rng.choice([3, 5, 7]))
    if rng.random() < hyp.get("to_gray", 0.0):
        im = to_gray(im)
    if rng.random() < hyp.get("clahe", 0.0):
        im = clahe(im, clip_limit=rng.uniform(1.0, 4.0))
    if rng.random() < hyp.get("brightness_contrast", 0.0):
        im = brightness_contrast(
            im, alpha=1.0 + rng.uniform(-0.2, 0.2), beta=rng.uniform(-0.2, 0.2)
        )
    return im


def cutout(im, labels, p=0.5, rng: random.Random = random):
    """Random occlusion squares.  ref: utils/augmentations.py:236-254."""
    if rng.random() >= p:
        return labels
    h, w = im.shape[:2]
    scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
    for s in scales:
        mask_h = rng.randint(1, int(h * s))
        mask_w = rng.randint(1, int(w * s))
        xmin = max(0, rng.randint(0, w) - mask_w // 2)
        ymin = max(0, rng.randint(0, h) - mask_h // 2)
        xmax = min(w, xmin + mask_w)
        ymax = min(h, ymin + mask_h)
        im[ymin:ymax, xmin:xmax] = [rng.randint(64, 191) for _ in range(3)]
        if len(labels) and s > 0.03:
            ioa = _bbox_ioa(np.array([xmin, ymin, xmax, ymax], np.float32), labels[:, 1:5])
            labels = labels[ioa < 0.60]
    return labels


def _bbox_ioa(box1, box2, eps=1e-7):
    """Intersection over box2 area."""
    b2x1, b2y1, b2x2, b2y2 = box2[:, 0], box2[:, 1], box2[:, 2], box2[:, 3]
    inter = (np.minimum(box1[2], b2x2) - np.maximum(box1[0], b2x1)).clip(0) * (
        np.minimum(box1[3], b2y2) - np.maximum(box1[1], b2y1)
    ).clip(0)
    return inter / ((b2x2 - b2x1) * (b2y2 - b2y1) + eps)


def flip_lr(im, labels_xywhn):
    im = np.fliplr(im)
    if len(labels_xywhn):
        labels_xywhn[:, 1] = 1 - labels_xywhn[:, 1]
    return np.ascontiguousarray(im), labels_xywhn


def flip_ud(im, labels_xywhn):
    im = np.flipud(im)
    if len(labels_xywhn):
        labels_xywhn[:, 2] = 1 - labels_xywhn[:, 2]
    return np.ascontiguousarray(im), labels_xywhn
