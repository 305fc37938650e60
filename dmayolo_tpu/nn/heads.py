"""Detection heads: anchor-based Detect and anchor-free TDetect (+DFL).

ref: models/yolo.py:40-114 (Detect), models/detect_t.py:23-101 (TDetect).

TPU design notes:
  * feature maps stay NHWC; the per-scale raw output is (B, ny, nx, na, no)
    — the natural layout for vectorised loss computation;
  * decode grids are generated at trace time from static shapes (XLA
    constant-folds them) — no grid caching / dynamic-shape checks needed;
  * the flattened inference output is emitted in the reference's
    (na, ny, nx) candidate order so box outputs are comparable 1:1.
"""
from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, Sequential, Vars
from .primitives import Conv2d
from .blocks import ConvBN


class Detect(Module):
    """Anchor-based YOLOv5 head.  ref: models/yolo.py:40-114."""

    def __init__(self, nc=80, anchors=(), ch=(), inplace=True):
        super().__init__()
        self.nc = nc
        self.no = nc + 5
        self.nl = len(anchors)
        self.na = len(anchors[0]) // 2
        # pixel-space anchors from the yaml; rescaled to stride units by the
        # model builder after the stride probe (ref: yolo.py:164-168)
        self.anchors = np.asarray(anchors, np.float32).reshape(self.nl, -1, 2)
        self.stride = None  # set by builder
        self.m = self.add("m", Sequential([Conv2d(x, self.no * self.na, 1, bias=True) for x in ch]))

    def bias_init(self, params, cf=None):
        """Focal-style prior bias init (ref: yolo.py:293-301). Mutates the
        flat params dict in place; returns it."""
        for i, s in enumerate(self.stride):
            key = self.path + ("m", str(i), "bias")
            b = np.asarray(params[key]).reshape(self.na, -1).copy()
            b[:, 4] += math.log(8 / (640 / s) ** 2)
            if cf is None:
                b[:, 5:] += math.log(0.6 / (self.nc - 0.999999))
            else:
                b[:, 5:] += np.log(cf / cf.sum())
            params[key] = jnp.asarray(b.reshape(-1))
        return params

    def __call__(self, v: Vars, xs: Sequence[jax.Array]) -> List[jax.Array]:
        """Raw head outputs: list of (B, ny, nx, na, no), sigmoid NOT applied."""
        out = []
        for i in range(self.nl):
            y = self.m.mods[i](v, xs[i])  # (B, ny, nx, na*no)
            b, ny, nx, _ = y.shape
            out.append(y.reshape(b, ny, nx, self.na, self.no))
        return out

    def decode(self, raw: Sequence[jax.Array]) -> jax.Array:
        """Inference decode -> (B, sum(na*ny*nx), no) in reference candidate
        order (a, y, x).  xy=(2sig-0.5+grid)*stride, wh=(2sig)^2*anchor_px.
        ref: yolo.py:83-103."""
        z = []
        for i, x in enumerate(raw):
            b, ny, nx, na, no = x.shape
            y = jax.nn.sigmoid(x.astype(jnp.float32))
            gx = jnp.arange(nx, dtype=jnp.float32)
            gy = jnp.arange(ny, dtype=jnp.float32)
            grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (ny, nx, 2)
            anchor_px = jnp.asarray(self.anchors[i] * self.stride[i])  # (na, 2)
            xy = (y[..., 0:2] * 2 - 0.5 + grid[None, :, :, None, :]) * self.stride[i]
            wh = (y[..., 2:4] * 2) ** 2 * anchor_px[None, None, None, :, :]
            dec = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
            # reference flatten order is (na, ny, nx): transpose before reshape
            dec = dec.transpose(0, 3, 1, 2, 4).reshape(b, na * ny * nx, no)
            z.append(dec)
        return jnp.concatenate(z, axis=1)

    def decode_parts(self, raw: Sequence[jax.Array], class_mask=None):
        """Serving-path decode: per-scale fused sigmoid + box + best-class.

        Returns (boxes_xyxy (B,N,4), scores (B,N), cls (B,N)) in reference
        candidate order — the (B, N, 5+nc) tensor `decode` materialises
        (and NMS then re-reads through several HBM passes) never exists.
        Numerically identical to decode -> conf=obj*cls -> argmax/max.
        """
        bxs, scs, cls_ = [], [], []
        for i, x in enumerate(raw):
            b, ny, nx, na, no = x.shape
            y = jax.nn.sigmoid(x.astype(jnp.float32))
            gx = jnp.arange(nx, dtype=jnp.float32)
            gy = jnp.arange(ny, dtype=jnp.float32)
            grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
            anchor_px = jnp.asarray(self.anchors[i] * self.stride[i])
            xy = (y[..., 0:2] * 2 - 0.5 + grid[None, :, :, None, :]) * self.stride[i]
            wh = (y[..., 2:4] * 2) ** 2 * anchor_px[None, None, None, :, :]
            half = wh * 0.5
            box = jnp.concatenate([xy - half, xy + half], axis=-1)
            conf = y[..., 4:5] * y[..., 5:]
            # reference classes-filter semantics (general.py:683-693): pick
            # the best class FIRST, then drop whole detections whose best
            # class is excluded — never re-label with the best allowed class
            best = jnp.max(conf, axis=-1)
            bc = jnp.argmax(conf, axis=-1)
            if class_mask is not None:
                best = jnp.where(class_mask[bc], best, 0.0)
            bc = bc.astype(jnp.float32)
            bxs.append(box.transpose(0, 3, 1, 2, 4).reshape(b, na * ny * nx, 4))
            scs.append(best.transpose(0, 3, 1, 2).reshape(b, na * ny * nx))
            cls_.append(bc.transpose(0, 3, 1, 2).reshape(b, na * ny * nx))
        return (jnp.concatenate(bxs, 1), jnp.concatenate(scs, 1),
                jnp.concatenate(cls_, 1))


def dfl_expectation(box_logits: jax.Array, reg_max: int = 16) -> jax.Array:
    """Distribution-focal decode: softmax expectation over reg_max bins.

    box_logits: (..., 4, reg_max) -> (..., 4).  ref: detect_t.py:92-101.
    """
    p = jax.nn.softmax(box_logits.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def dist2bbox(distance, anchor_points, xywh: bool = True):
    """(l,t,r,b) distances + cell centres -> boxes.  ref: detect_t.py:81-90."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def make_anchor_points(shapes, strides, offset: float = 0.5):
    """Cell centres + per-cell stride for a list of (ny, nx) shapes.

    Returns (A, 2) anchor points (feature units) and (A, 1) strides.
    ref: detect_t.py:67-79.
    """
    pts, sts = [], []
    for (ny, nx), s in zip(shapes, strides):
        sx = jnp.arange(nx, dtype=jnp.float32) + offset
        sy = jnp.arange(ny, dtype=jnp.float32) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        sts.append(jnp.full((ny * nx, 1), float(s), jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(sts)


class TDetect(Module):
    """Anchor-free decoupled head with DFL box regression.
    ref: models/detect_t.py:23-65."""

    reg_max = 16

    def __init__(self, nc=80, ch=(), inplace=True):
        super().__init__()
        self.nc = nc
        self.nl = len(ch)
        self.no = nc + self.reg_max * 4
        self.stride = None  # set by builder
        c2, c3 = max(ch[0] // 4, 16), max(ch[0], self.no - 4)
        self.cv2 = self.add(
            "cv2",
            Sequential(
                [
                    Sequential([ConvBN(x, c2, 3), ConvBN(c2, c2, 3), Conv2d(c2, 4 * self.reg_max, 1, bias=True)])
                    for x in ch
                ]
            ),
        )
        self.cv3 = self.add(
            "cv3",
            Sequential(
                [
                    Sequential([ConvBN(x, c3, 3), ConvBN(c3, c3, 3), Conv2d(c3, self.nc, 1, bias=True)])
                    for x in ch
                ]
            ),
        )

    def bias_init(self, params):
        """ref: detect_t.py:61-65."""
        for i, s in enumerate(self.stride):
            bkey = self.path + ("cv2", str(i), "2", "bias")
            params[bkey] = jnp.ones_like(params[bkey])
            ckey = self.path + ("cv3", str(i), "2", "bias")
            params[ckey] = jnp.full_like(params[ckey], math.log(5 / self.nc / (640 / s) ** 2))
        return params

    def __call__(self, v: Vars, xs: Sequence[jax.Array]):
        """Raw outputs: list of (B, ny, nx, 4*reg_max + nc)."""
        out = []
        for i in range(self.nl):
            box = self.cv2.mods[i](v, xs[i])
            cls = self.cv3.mods[i](v, xs[i])
            out.append(jnp.concatenate([box, cls], axis=-1))
        return out

    def flatten(self, raw: Sequence[jax.Array]):
        """Concatenate scales -> (B, A, no); returns (box_logits, cls_logits)."""
        flat = jnp.concatenate([x.reshape(x.shape[0], -1, self.no) for x in raw], axis=1)
        return flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]

    def decode(self, raw: Sequence[jax.Array]) -> jax.Array:
        """Inference decode -> (B, A, 4 + nc): xywh pixels + class probs.
        ref: detect_t.py:46-59."""
        shapes = [(x.shape[1], x.shape[2]) for x in raw]
        anchor_points, strides = make_anchor_points(shapes, self.stride)
        box_logits, cls_logits = self.flatten(raw)
        b, a, _ = box_logits.shape
        dist = dfl_expectation(box_logits.reshape(b, a, 4, self.reg_max))
        dbox = dist2bbox(dist, anchor_points[None], xywh=True) * strides[None]
        return jnp.concatenate([dbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)

    def decode_parts(self, raw: Sequence[jax.Array], class_mask=None):
        """Serving-path decode (cf. Detect.decode_parts): fused DFL box +
        best-class score, xyxy pixels.  TDetect confidence is the class
        probability alone (no objectness), matching decode+obj=1 NMS."""
        shapes = [(x.shape[1], x.shape[2]) for x in raw]
        anchor_points, strides = make_anchor_points(shapes, self.stride)
        box_logits, cls_logits = self.flatten(raw)
        b, a, _ = box_logits.shape
        dist = dfl_expectation(box_logits.reshape(b, a, 4, self.reg_max))
        boxes = dist2bbox(dist, anchor_points[None], xywh=False) * strides[None]
        conf = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        # best class first, then drop excluded detections whole (see
        # Detect.decode_parts; ref general.py:683-693)
        best = jnp.max(conf, axis=-1)
        bc = jnp.argmax(conf, axis=-1)
        if class_mask is not None:
            best = jnp.where(class_mask[bc], best, 0.0)
        return boxes, best, bc.astype(jnp.float32)
