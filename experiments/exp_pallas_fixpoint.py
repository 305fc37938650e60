"""Pallas fixpoint-NMS: IoU matrix + suppression fixpoint entirely in VMEM.

exp_v5s_tail3 showed the XLA matrix-NMS tail costs ~3 ms in-context even
with ZERO valid candidates — the (B,512,512) IoU materialisation and its
fusion fragments are the cost, not the iterations.  Per image the whole
problem fits VMEM ((512,512) f32 = 1 MiB), so one grid program per image
can read (4,K)+scores, build IoU+S on the VPU, run the antitone-bracket
fixpoint as MXU matvecs, and write a (1,K) keep mask — HBM traffic ~1 MB
total instead of ~400 MB.

Semantics: exact greedy NMS keep flags, identical to
core/nms.py::_fixpoint_keep (same bracket iteration).

    python experiments/exp_pallas_fixpoint.py
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import BS, calibrate, scan_time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NEG_INF = -1e10


def _fixpoint_nms_kernel(boxes_ref, scores_ref, keep_ref, *, iou_thres: float):
    # boxes_ref: (1, 4, K) [x1;y1;x2;y2 rows], scores_ref: (1, 1, K)
    # keep_ref: (1, 1, K) f32 (1.0 = keep)
    coords = boxes_ref[0]                       # (4, K)
    k = coords.shape[-1]
    x1r, y1r = coords[0:1, :], coords[1:2, :]   # (1, K) row vectors (j index)
    x2r, y2r = coords[2:3, :], coords[3:4, :]
    ct = jnp.transpose(coords)                  # (K, 4)
    x1c, y1c = ct[:, 0:1], ct[:, 1:2]           # (K, 1) col vectors (i index)
    x2c, y2c = ct[:, 2:3], ct[:, 3:4]

    area_r = (x2r - x1r) * (y2r - y1r)          # (1, K)
    area_c = (x2c - x1c) * (y2c - y1c)          # (K, 1)
    iw = jnp.clip(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0, None)
    ih = jnp.clip(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0, None)
    inter = iw * ih                             # (K, K)
    # iou > t  <=>  inter > t * (union + eps)  (exact, positive denominators)
    union = area_c + area_r - inter + 1e-7

    sc = scores_ref[0]                          # (1, K) f32
    valid = sc > NEG_INF / 2                    # (1, K)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # S_ij = 1 where i (higher rank) suppresses j; valid_i via column bcast
    # (transpose the f32 scores, not the bool — Mosaic has no i1 transpose)
    valid_c = jnp.transpose(sc) > NEG_INF / 2   # (K, 1)
    S = jnp.where((inter > iou_thres * union) & (row < col) & valid_c,
                  1.0, 0.0).astype(jnp.float32)

    vf = valid.astype(jnp.float32)              # (1, K)

    def T(kv):  # kv: (1, K) f32 0/1
        sup = jnp.dot(kv, S, preferred_element_type=jnp.float32)  # (1, K)
        return jnp.where((sup < 0.5), vf, 0.0)

    lo0 = T(vf)
    hi0 = T(lo0)

    def cond(st):
        lo, hi, i = st
        return jnp.logical_and(jnp.any(lo != hi), i < k)

    def body(st):
        lo, hi, i = st
        return T(hi), T(lo), i + 1

    lo, _, _ = jax.lax.while_loop(cond, body, (lo0, hi0, jnp.int32(0)))
    keep_ref[0] = lo[None] if lo.ndim == 1 else lo


@functools.partial(jax.jit, static_argnames=("iou_thres",))
def pallas_fixpoint_keep(boxes, scores, iou_thres: float = 0.45):
    """boxes (B,K,4) xyxy rank-sorted, scores (B,K) with NEG_INF invalid.
    Returns keep (B,K) bool — greedy-NMS keep flags."""
    b, k, _ = boxes.shape
    bt = boxes.transpose(0, 2, 1)               # (B, 4, K)
    sc = scores[:, None, :]                     # (B, 1, K)
    keep = pl.pallas_call(
        functools.partial(_fixpoint_nms_kernel, iou_thres=iou_thres),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(bt, sc)
    return keep[:, 0, :] > 0.5


def main():
    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.core.nms import (MAX_WH, NEG_INF as NI, _fixpoint_keep,
                                      _pairwise_iou, _top_k_candidates)
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    rng = np.random.default_rng(0)

    # ---- correctness vs _fixpoint_keep on adversarial candidates --------
    B, K = 16, 512
    cxy = rng.uniform(0, 640, (B, K, 2)).astype(np.float32)
    cwh = rng.uniform(4, 200, (B, K, 2)).astype(np.float32)
    cb = np.concatenate([cxy, cxy + cwh], -1)
    cs = np.sort(rng.uniform(0, 1, (B, K)).astype(np.float32))[:, ::-1].copy()
    cs[:, 400:] = NEG_INF  # some invalid tail
    # clustered duplicates to force deep chains
    cb[0, :256] = cb[0, 0] + rng.normal(0, 3, (256, 4)).astype(np.float32)
    cbj, csj = jnp.asarray(cb), jnp.asarray(cs)

    ref = _fixpoint_keep(_pairwise_iou(cbj, cbj), csj > NI / 2, 0.45)
    got = pallas_fixpoint_keep(cbj, csj, 0.45)
    same = bool(jnp.all(ref == got))
    print(f"correctness vs _fixpoint_keep: {'EXACT' if same else 'MISMATCH'}"
          f" ({int(jnp.sum(ref != got))} diffs)", flush=True)
    assert same

    calibrate()

    # ---- in-context timing on yolov5s ----------------------------------
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = DetectionModel(
        os.path.join(repo, "dmayolo_tpu/configs/models/yolov5s.yaml"), nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(model, params, stats)
    head = model.head
    x = jnp.asarray(rng.integers(0, 255, (BS, 640, 640, 3), dtype=np.uint8))

    def fwd(xx, p, s):
        xf = xx.astype(jnp.bfloat16) / 255.0
        return model.apply(p, s, xf, fused=True, dtype=jnp.bfloat16)

    KK = 512

    def upto(xx, p, s):
        bb, ss, cc = head.decode_parts(fwd(xx, p, s))
        cand = jnp.where(ss > 0.25, ss, NI)
        tsc, tix = _top_k_candidates(cand, KK)
        tb = jnp.take_along_axis(bb, tix[..., None], axis=1)
        tc = jnp.take_along_axis(cc, tix, axis=1)
        nb = tb + (tc * MAX_WH)[..., None]
        return nb, tsc, tb, tc

    def tail_xla(xx, p, s):
        nb, tsc, tb, tc = upto(xx, p, s)
        return _fixpoint_keep(_pairwise_iou(nb, nb), tsc > NI / 2, 0.45)

    def tail_pallas(xx, p, s):
        nb, tsc, tb, tc = upto(xx, p, s)
        return pallas_fixpoint_keep(nb, tsc, 0.45)

    print(f"\nyolov5s bs{BS} in-context keep-flag variants:", flush=True)
    scan_time(tail_xla, (x, fp, fs), "XLA iou+fixpoint")
    scan_time(tail_pallas, (x, fp, fs), "Pallas VMEM fixpoint")


if __name__ == "__main__":
    main()
