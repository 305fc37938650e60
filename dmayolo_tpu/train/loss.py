"""Anchor-based training loss (SIoU + BCE obj/cls) — dense/static redesign.

The reference ComputeLoss (ref: utils/loss.py:135-276) builds ragged target
lists with boolean-mask gathers; under XLA everything is reformulated as
dense masked ops over a fixed (B, M, na, 5-offset) candidate grid:

  * targets arrive dense: (B, M, 5) [cls, cx, cy, w, h] normalised + mask
  * anchor wh-ratio filter and 5-cell neighbour expansion become boolean
    masks (exactly the semantics of build_targets, loss.py:220-276)
  * per-candidate predictions are gathered with take_along_axis
  * the objectness target grid is a scatter-max (equivalent to the
    reference's iou-ascending overwrite, loss.py:189-194)

Everything jits, vmaps and differentiates; batch dims shard over the mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..core.iou import bbox_iou


def smooth_bce(eps: float = 0.1):
    """ref: utils/loss.py:13-17 (same eps=0.1 default; ComputeLoss always
    passes hyp label_smoothing explicitly, like the reference)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with positive-class weighting
    (torch BCEWithLogitsLoss(pos_weight=...) semantics)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_bce_with_logits(logits, targets, gamma: float, alpha: float = 0.25,
                          pos_weight: float = 1.0):
    """FocalLoss wrapper used when hyp fl_gamma > 0.  ref: utils/loss.py:36-59."""
    loss = bce_with_logits(logits, targets, pos_weight)
    pred_prob = jax.nn.sigmoid(logits.astype(jnp.float32))
    p_t = targets * pred_prob + (1 - targets) * (1 - pred_prob)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    modulating = (1.0 - p_t) ** gamma
    return loss * alpha_factor * modulating


def bce_blur_with_logits(logits, targets, alpha: float = 0.05, pos_weight: float = 1.0):
    """BCEBlur: down-weights missing-label false positives.
    ref: utils/loss.py:21-34."""
    loss = bce_with_logits(logits, targets, pos_weight)
    pred = jax.nn.sigmoid(logits.astype(jnp.float32))
    dx = pred - targets
    alpha_factor = 1 - jnp.exp((dx - 1) / (alpha + 1e-4))
    return loss * alpha_factor


def qfocal_bce_with_logits(logits, targets, gamma: float = 1.5, alpha: float = 0.25,
                           pos_weight: float = 1.0):
    """Quality focal loss.  ref: utils/loss.py:106-132."""
    loss = bce_with_logits(logits, targets, pos_weight)
    pred_prob = jax.nn.sigmoid(logits.astype(jnp.float32))
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    modulating = jnp.abs(targets - pred_prob) ** gamma
    return loss * alpha_factor * modulating


def varifocal_with_logits(pred_score, gt_score, label, alpha: float = 0.75,
                          gamma: float = 2.0):
    """Varifocal loss (sum-reduced).  ref: utils/tal.py:73-85."""
    pred_score = pred_score.astype(jnp.float32)
    weight = (
        alpha * jax.nn.sigmoid(pred_score) ** gamma * (1 - label) + gt_score * label
    )
    return jnp.sum(bce_with_logits(pred_score, gt_score) * weight)


class Targets(NamedTuple):
    """Dense targets: cls (B, M), xywh normalised 0-1 (B, M, 4), mask (B, M)."""

    cls: jax.Array
    box: jax.Array
    mask: jax.Array


def targets_from_flat(flat, batch_size: int, max_targets: int) -> Targets:
    """Convert reference-style (n, 6) [img, cls, xywh] host arrays to dense.

    Host-side utility (numpy ok) — the device loss only sees dense targets.
    """
    import numpy as np

    flat = np.asarray(flat)
    cls = np.zeros((batch_size, max_targets), np.float32)
    box = np.zeros((batch_size, max_targets, 4), np.float32)
    mask = np.zeros((batch_size, max_targets), bool)
    for b in range(batch_size):
        rows = flat[flat[:, 0] == b][:max_targets]
        n = len(rows)
        cls[b, :n] = rows[:, 1]
        box[b, :n] = rows[:, 2:6]
        mask[b, :n] = True
    return Targets(jnp.asarray(cls), jnp.asarray(box), jnp.asarray(mask))


# the 5-cell neighbour offsets, g=0.5 bias (ref: utils/loss.py:229-233)
_OFFSETS = jnp.asarray(
    [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]], jnp.float32
)


class ComputeLoss:
    """Anchor-based YOLOv5 loss with SIoU regression (DMA default).

    Args:
        anchors: (nl, na, 2) in stride units (from the built model head).
        hyp: hyperparameter dict (box/obj/cls/cls_pw/obj_pw/anchor_t/
             label_smoothing/fl_gamma keys, ref: data/hyps/*.yaml).
        nc: class count.
        iou_variant: 'SIoU' (reference default, loss.py:185) or 'CIoU'.
    """

    def __init__(self, anchors, hyp: Dict, nc: int, autobalance: bool = False,
                 iou_variant: str = "SIoU"):
        import numpy as np

        self.anchors = jnp.asarray(np.asarray(anchors, np.float32))
        self.nl, self.na = self.anchors.shape[:2]
        self.nc = nc
        self.hyp = dict(hyp)
        self.gr = 1.0
        self.balance = {3: [4.0, 1.0, 0.4]}.get(self.nl, [4.0, 1.0, 0.25, 0.06, 0.02])
        self.cp, self.cn = smooth_bce(self.hyp.get("label_smoothing", 0.0))
        self.iou_variant = iou_variant

    def __call__(self, preds: Sequence[jax.Array], targets: Targets):
        """preds: list of (B, ny, nx, na, 5+nc) raw logits (NHWC head layout).

        Returns (total_loss, dict of components) — total matches the
        reference's `(lbox+lobj+lcls) * bs` scaling (loss.py:218).
        """
        hyp = self.hyp
        bs = preds[0].shape[0]
        lbox = lobj = lcls = 0.0
        fl_gamma = hyp.get("fl_gamma", 0.0)

        for i, p in enumerate(preds):
            b, ny, nx, na, no = p.shape
            p = p.astype(jnp.float32)
            cand = self._build_targets_level(targets, i, ny, nx)
            m = cand["mask"]  # (B, K) valid candidate mask
            n_valid = jnp.sum(m)
            denom = jnp.maximum(n_valid, 1.0)

            # gather per-candidate predictions: flat spatial index
            pf = p.reshape(b, ny * nx * na, no)
            idx = (cand["gj"] * nx + cand["gi"]) * na + cand["a"]  # (B, K)
            ps = jnp.take_along_axis(pf, idx[..., None], axis=1)  # (B, K, no)

            # -- box: SIoU in cell-offset space (ref loss.py:182-186)
            pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2 - 0.5
            pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2) ** 2 * cand["anc"]
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            iou = bbox_iou(pbox, cand["tbox"], xywh=True,
                           **{self.iou_variant: True})  # (B, K)
            lbox = lbox + jnp.sum((1.0 - iou) * m) / denom

            # -- objectness target: scatter-max of detached iou (ref 189-194)
            # flattened-1D scatter (most portable TPU lowering)
            score = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None)) * m
            s_total = ny * nx * na
            flat_idx = (jnp.arange(b)[:, None] * s_total + idx).reshape(-1)
            flat_obj = (
                jnp.zeros((b * s_total,), jnp.float32)
                .at[flat_idx]
                .max(score.reshape(-1))
                .reshape(b, s_total)
            )
            tobj = (1.0 - self.gr) + self.gr * flat_obj
            tobj = jnp.where(flat_obj > 0, tobj, 0.0)
            obj_bce = (
                focal_bce_with_logits(pf[..., 4], tobj, fl_gamma, pos_weight=hyp["obj_pw"])
                if fl_gamma > 0
                else bce_with_logits(pf[..., 4], tobj, hyp["obj_pw"])
            )
            lobj = lobj + jnp.mean(obj_bce) * self.balance[i]

            # -- classification (ref 197-200)
            if self.nc > 1:
                t = jnp.full((b, ps.shape[1], self.nc), self.cn, jnp.float32)
                t = jnp.where(
                    jax.nn.one_hot(cand["cls"], self.nc, dtype=jnp.float32) > 0, self.cp, t
                )
                cls_bce = (
                    focal_bce_with_logits(ps[..., 5:], t, fl_gamma, pos_weight=hyp["cls_pw"])
                    if fl_gamma > 0
                    else bce_with_logits(ps[..., 5:], t, hyp["cls_pw"])
                )
                lcls = lcls + jnp.sum(cls_bce * m[..., None]) / (denom * self.nc)

        lbox = lbox * hyp["box"]
        lobj = lobj * hyp["obj"]
        lcls = lcls * hyp["cls"]
        total = (lbox + lobj + lcls) * bs
        return total, {"box": lbox, "obj": lobj, "cls": lcls}

    def _build_targets_level(self, targets: Targets, i: int, ny: int, nx: int):
        """Dense build_targets for one level (ref: utils/loss.py:220-276).

        Produces a fixed (B, M*na*5) candidate set with validity mask and
        per-candidate (gj, gi, a, tbox, anchor, cls).
        """
        anchors = self.anchors[i]  # (na, 2) stride units
        gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
        box = targets.box * gain  # (B, M, 4) grid units
        gxy = box[..., 0:2]
        # padded target rows carry zeros; give them unit wh so masked-out
        # candidates stay finite inside bbox_iou (0-width against 0-width
        # hits 0/0 in the SIoU shape cost, and NaN*0 poisons the masked sum)
        gwh = jnp.where(targets.mask[..., None], box[..., 2:4], 1.0)

        # anchor ratio filter (B, M, na). A REAL label can be degenerate too
        # (0-width boxes survive conversion on some datasets; only the mosaic
        # path filters wh>2px): like the reference, 0/anchor -> max(r,1/r)
        # = inf fails the gate, dropping the label — but its tbox wh must
        # still be finite-safe below (exclusion is a *0, not a selection).
        r = gwh[:, :, None, :] / anchors[None, None]
        a_mask = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < self.hyp["anchor_t"]
        a_mask = a_mask & targets.mask[:, :, None]
        gwh = jnp.where(gwh > 0, gwh, 1.0)  # sanitize AFTER the gate

        # neighbour-offset masks (B, M, 5)
        gx, gy = gxy[..., 0], gxy[..., 1]
        jm = (gx % 1 < 0.5) & (gx > 1)
        km = (gy % 1 < 0.5) & (gy > 1)
        lm = ((nx - gx) % 1 < 0.5) & ((nx - gx) > 1)
        mm = ((ny - gy) % 1 < 0.5) & ((ny - gy) > 1)
        off_mask = jnp.stack([jnp.ones_like(jm), jm, km, lm, mm], axis=-1)

        # full candidate grid (B, M, na, 5)
        valid = a_mask[..., None] & off_mask[:, :, None, :]

        off = _OFFSETS  # (5, 2) — note reference offsets are (x, y)
        gij = jnp.floor(gxy[:, :, None, None, :] - off[None, None, None])  # (B,M,1,5,2)
        gij = jnp.broadcast_to(gij, valid.shape + (2,))
        # indices are clamped for gather/scatter; tbox keeps the unclamped
        # cell like the reference (loss.py:265-272)
        gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)
        gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

        txy = gxy[:, :, None, None, :] - gij  # fractional offset in (-0.5, 1.5)
        twh = jnp.broadcast_to(gwh[:, :, None, None, :], valid.shape + (2,))
        tbox = jnp.concatenate([txy, twh], axis=-1)

        B, M = targets.cls.shape
        na = self.na
        K = M * na * 5

        def flat(x, tail=()):
            return x.reshape((B, K) + tail)

        anc = jnp.broadcast_to(anchors[None, None, :, None, :], valid.shape + (2,))
        cls = jnp.broadcast_to(targets.cls[:, :, None, None], valid.shape).astype(jnp.int32)
        return {
            "mask": flat(valid).astype(jnp.float32),
            "gi": flat(gi),
            "gj": flat(gj),
            "a": jnp.broadcast_to(
                jnp.arange(na)[None, None, :, None], valid.shape
            ).reshape(B, K),
            "tbox": flat(tbox, (4,)),
            "anc": flat(anc, (2,)),
            "cls": flat(cls),
        }
