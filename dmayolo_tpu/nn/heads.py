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

    def decode_parts(self, raw: Sequence[jax.Array], class_mask=None,
                     ref_order: bool = True):
        """Serving-path decode: per-scale fused sigmoid + box + best-class.

        Returns (boxes_xyxy (B,N,4), scores (B,N), cls (B,N)) in reference
        candidate order — the (B, N, 5+nc) tensor `decode` materialises
        (and NMS then re-reads through several HBM passes) never exists.
        Numerically identical to decode -> conf=obj*cls -> argmax/max.

        ref_order=False keeps the native (y, x, a) flatten instead of the
        reference's (a, y, x) — it only matters for equal-score NMS
        tie-breaks.  Chip-measured NEUTRAL (round 5): XLA fuses the
        reference-order transposes into the surrounding decode, so this
        is an ablation knob, not an optimisation (docs/ROOFLINE.md §2b).
        """
        bxs, scs, cls_ = [], [], []
        for i, x in enumerate(raw):
            b, ny, nx, na, no = x.shape
            # class reduce on the raw logits: sigmoid is strictly monotone,
            # so max_c sigmoid(obj)*sigmoid(cls_c) == sigmoid(obj) *
            # sigmoid(max_c cls_c) and argmax(logits) == argmax(probs) —
            # the (…, nc) f32 probability tensor never materialises
            # (bit-identical outputs; exp_v5s_decode2.py chip-verified)
            best_logit = jnp.max(x[..., 5:], axis=-1)
            bc = jnp.argmax(x[..., 5:], axis=-1)
            y4 = jax.nn.sigmoid(x[..., 0:4].astype(jnp.float32))
            gx = jnp.arange(nx, dtype=jnp.float32)
            gy = jnp.arange(ny, dtype=jnp.float32)
            grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
            anchor_px = jnp.asarray(self.anchors[i] * self.stride[i])
            xy = (y4[..., 0:2] * 2 - 0.5 + grid[None, :, :, None, :]) * self.stride[i]
            wh = (y4[..., 2:4] * 2) ** 2 * anchor_px[None, None, None, :, :]
            half = wh * 0.5
            box = jnp.concatenate([xy - half, xy + half], axis=-1)
            # reference classes-filter semantics (general.py:683-693): pick
            # the best class FIRST, then drop whole detections whose best
            # class is excluded — never re-label with the best allowed class
            best = (jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
                    * jax.nn.sigmoid(best_logit.astype(jnp.float32)))
            if class_mask is not None:
                best = jnp.where(class_mask[bc], best, 0.0)
            bc = bc.astype(jnp.float32)
            if ref_order:  # (a, y, x) flatten to match the reference
                bxs.append(box.transpose(0, 3, 1, 2, 4).reshape(b, na * ny * nx, 4))
                scs.append(best.transpose(0, 3, 1, 2).reshape(b, na * ny * nx))
                cls_.append(bc.transpose(0, 3, 1, 2).reshape(b, na * ny * nx))
            else:  # native contiguous (y, x, a) — reshape only, no copies
                bxs.append(box.reshape(b, na * ny * nx, 4))
                scs.append(best.reshape(b, na * ny * nx))
                cls_.append(bc.reshape(b, na * ny * nx))
        return (jnp.concatenate(bxs, 1), jnp.concatenate(scs, 1),
                jnp.concatenate(cls_, 1))

    def decode_scores(self, raw: Sequence[jax.Array], class_mask=None):
        """Lazy-decode pass 1: best-class scores only, (B, N) f32 in the
        reference candidate order (same values as decode_parts' `scores`).

        Skips all box math — boxes are decoded by `decode_at` for the few
        candidates that survive top-k, so the (B, N, 4) box tensor (and its
        layout-hostile 4-wide minor dim) never exists.  Traffic per scale is
        one read of the raw head output and one (B, na*ny*nx) f32 write.
        """
        outs = []
        for x in raw:
            b, ny, nx, na, no = x.shape
            # slim class reduce on raw logits (see decode_parts): only the
            # obj + best-cls logits ever see f32 sigmoid
            best = (jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
                    * jax.nn.sigmoid(jnp.max(x[..., 5:], axis=-1)
                                     .astype(jnp.float32)))
            if class_mask is not None:
                bc = jnp.argmax(x[..., 5:], axis=-1)
                best = jnp.where(class_mask[bc], best, 0.0)
            outs.append(best.transpose(0, 3, 1, 2).reshape(b, na * ny * nx))
        return jnp.concatenate(outs, 1)

    def _candidate_constants(self, shapes):
        """(N, 5) f32 numpy table [grid_x, grid_y, anchor_w_px, anchor_h_px,
        stride] per candidate in reference (scale, a, y, x) order — built
        host-side from static shapes, a trace-time constant."""
        rows = []
        for i, (ny, nx) in enumerate(shapes):
            s = float(self.stride[i])
            gx, gy = np.meshgrid(np.arange(nx, dtype=np.float32),
                                 np.arange(ny, dtype=np.float32), indexing="xy")
            anchor_px = self.anchors[i] * s  # (na, 2)
            t = np.empty((self.na, ny, nx, 5), np.float32)
            t[..., 0] = gx[None]
            t[..., 1] = gy[None]
            t[..., 2] = anchor_px[:, None, None, 0]
            t[..., 3] = anchor_px[:, None, None, 1]
            t[..., 4] = s
            rows.append(t.reshape(-1, 5))
        return np.concatenate(rows, 0)

    def decode_at(self, raw: Sequence[jax.Array], idx: jax.Array):
        """Lazy-decode pass 2: decode boxes + best class at gathered indices.

        idx: (B, K) global candidate indices in reference order (from top-k
        over `decode_scores`).  Gathers K raw rows per scale with integer
        index remapping ((a,y,x) reference order -> the natural (y,x,a) row
        layout, so the raw tensors are never transposed), then runs exactly
        the per-element math of `decode_parts` on the (B, K, no) slice.
        Returns (boxes_xyxy (B, K, 4), cls (B, K) f32).
        """
        b = raw[0].shape[0]
        no = raw[0].shape[-1]
        rows = jnp.zeros((b, idx.shape[1], no), raw[0].dtype)
        off = 0
        for x in raw:
            _, ny, nx, na, _ = x.shape
            n_i = na * ny * nx
            flat = x.reshape(b, n_i, no)                 # natural (y,x,a) order
            li = jnp.clip(idx - off, 0, n_i - 1)
            nat = (li % (ny * nx)) * na + li // (ny * nx)
            got = jnp.take_along_axis(flat, nat[..., None], axis=1)
            pick = (idx >= off) & (idx < off + n_i)
            rows = jnp.where(pick[..., None], got, rows)
            off += n_i
        shapes = [(x.shape[1], x.shape[2]) for x in raw]
        cv = jnp.asarray(self._candidate_constants(shapes))[idx]  # (B,K,5)
        y = jax.nn.sigmoid(rows[..., 0:4].astype(jnp.float32))
        xy = (y[..., 0:2] * 2 - 0.5 + cv[..., 0:2]) * cv[..., 4:5]
        wh = (y[..., 2:4] * 2) ** 2 * cv[..., 2:4]
        half = wh * 0.5
        boxes = jnp.concatenate([xy - half, xy + half], axis=-1)
        # argmax over logits == argmax over obj*probs (monotone sigmoid,
        # obj shared across classes)
        return boxes, jnp.argmax(rows[..., 5:], axis=-1).astype(jnp.float32)


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
        # best class first, then drop excluded detections whole (see
        # Detect.decode_parts; ref general.py:683-693).  Class reduce on
        # raw logits (monotone sigmoid) — the (B, A, nc) f32 probability
        # tensor never materialises; bit-identical outputs.
        best = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1).astype(jnp.float32))
        bc = jnp.argmax(cls_logits, axis=-1)
        if class_mask is not None:
            best = jnp.where(class_mask[bc], best, 0.0)
        return boxes, best, bc.astype(jnp.float32)

    def decode_scores(self, raw: Sequence[jax.Array], class_mask=None):
        """Lazy-decode pass 1 (cf. Detect.decode_scores): best-class scores
        (B, A) f32.  TDetect candidates are already in natural (y, x) order,
        and — the big win — the DFL softmax-expectation over every anchor's
        4x reg_max box bins is skipped entirely here."""
        outs = []
        for x in raw:
            b = x.shape[0]
            # slim class reduce on raw logits (see decode_parts)
            logits = x[..., 4 * self.reg_max:]
            best = jax.nn.sigmoid(jnp.max(logits, axis=-1).astype(jnp.float32))
            if class_mask is not None:
                bc = jnp.argmax(logits, axis=-1)
                best = jnp.where(class_mask[bc], best, 0.0)
            outs.append(best.reshape(b, -1))
        return jnp.concatenate(outs, 1)

    def _candidate_constants(self, shapes):
        """(A, 3) f32 numpy [anchor_x, anchor_y, stride] (feature units /
        px), matching make_anchor_points' values and order exactly."""
        rows = []
        for (ny, nx), s in zip(shapes, self.stride):
            gx, gy = np.meshgrid(np.arange(nx, dtype=np.float32) + 0.5,
                                 np.arange(ny, dtype=np.float32) + 0.5,
                                 indexing="xy")
            t = np.stack([gx, gy, np.full_like(gx, float(s))], -1)
            rows.append(t.reshape(-1, 3))
        return np.concatenate(rows, 0)

    def decode_at(self, raw: Sequence[jax.Array], idx: jax.Array):
        """Lazy-decode pass 2 (cf. Detect.decode_at): DFL box decode + best
        class for the gathered (B, K) candidate rows only.  Returns
        (boxes_xyxy (B, K, 4), cls (B, K) f32)."""
        b = raw[0].shape[0]
        rows = jnp.zeros((b, idx.shape[1], self.no), raw[0].dtype)
        off = 0
        for x in raw:
            _, ny, nx, _ = x.shape
            n_i = ny * nx
            flat = x.reshape(b, n_i, self.no)
            li = jnp.clip(idx - off, 0, n_i - 1)
            got = jnp.take_along_axis(flat, li[..., None], axis=1)
            pick = (idx >= off) & (idx < off + n_i)
            rows = jnp.where(pick[..., None], got, rows)
            off += n_i
        shapes = [(x.shape[1], x.shape[2]) for x in raw]
        cv = jnp.asarray(self._candidate_constants(shapes))[idx]  # (B,K,3)
        k = idx.shape[1]
        dist = dfl_expectation(
            rows[..., : 4 * self.reg_max].reshape(b, k, 4, self.reg_max))
        boxes = dist2bbox(dist, cv[..., 0:2], xywh=False) * cv[..., 2:3]
        # argmax over logits == argmax over probs (monotone sigmoid)
        return boxes, jnp.argmax(rows[..., 4 * self.reg_max:],
                                 axis=-1).astype(jnp.float32)
