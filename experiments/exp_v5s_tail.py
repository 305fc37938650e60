"""yolov5s serving-tail attack: decode layout + NMS fixpoint blocking.

Round-3 verdict item 1: yolov5s bs128 sits at 4,543 img/s vs the 5,000
north star (ceiling 7,400).  exp_serve_decomp yolov5s: fwd 19.5 ms,
decode 4.56, topk 1.13, nms-rest 3.79 (28.97 total).  The tail is 9.5 ms
for what is at most ~0.5 ms of HBM traffic.  Hypotheses:

  decode: the three per-scale transposes to reference (a,y,x) candidate
    order move tensors with 4-/1-/1-wide minor dims (layout-hostile on
    TPU).  Variant: transpose the RAW head output once per scale
    ((B,ny,nx,na,no) -> (B,na,ny,nx,no), minor dim no=15 bf16) and decode
    in that layout — same candidate order, one well-shaped transpose.
  fixpoint NMS: each while_loop iteration re-reads the (B,512,512) bf16
    suppression matrix (~67 MB) twice; ~10 iterations = ~1.3 GB.  Variant:
    block-sequential form (nms_matrix_blocked) at block 64/128 reads the
    cross-IoU once.

    python experiments/exp_v5s_tail.py [yolov5s]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import BS, calibrate, scan_time  # noqa: E402


def decode_parts_tfirst(head, raw, class_mask=None):
    """decode_parts variant: one transpose of raw per scale, then decode in
    (B, na, ny, nx, no) layout.  Identical values + candidate order."""
    import jax
    import jax.numpy as jnp

    bxs, scs, cls_ = [], [], []
    for i, x in enumerate(raw):
        b, ny, nx, na, no = x.shape
        xt = x.transpose(0, 3, 1, 2, 4)  # (B, na, ny, nx, no), minor=no
        y = jax.nn.sigmoid(xt.astype(jnp.float32))
        gx = jnp.arange(nx, dtype=jnp.float32)
        gy = jnp.arange(ny, dtype=jnp.float32)
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
        anchor_px = jnp.asarray(head.anchors[i] * head.stride[i])
        xy = (y[..., 0:2] * 2 - 0.5 + grid[None, None, :, :, :]) * head.stride[i]
        wh = (y[..., 2:4] * 2) ** 2 * anchor_px[None, :, None, None, :]
        half = wh * 0.5
        box = jnp.concatenate([xy - half, xy + half], axis=-1)
        conf = y[..., 4:5] * y[..., 5:]
        best = jnp.max(conf, axis=-1)
        bc = jnp.argmax(conf, axis=-1)
        if class_mask is not None:
            best = jnp.where(class_mask[bc], best, 0.0)
        bxs.append(box.reshape(b, na * ny * nx, 4))
        scs.append(best.reshape(b, na * ny * nx))
        cls_.append(bc.astype(jnp.float32).reshape(b, na * ny * nx))
    import jax.numpy as jnp
    return (jnp.concatenate(bxs, 1), jnp.concatenate(scs, 1),
            jnp.concatenate(cls_, 1))


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.core.nms import (NEG_INF, _fixpoint_keep, _pairwise_iou,
                                      _top_k_candidates, nms_from_topk,
                                      nms_matrix_blocked, nms_parts)
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = sys.argv[1] if len(sys.argv) > 1 else "yolov5s"
    model = DetectionModel(
        os.path.join(repo, f"dmayolo_tpu/configs/models/{name}.yaml"), nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(model, params, stats)
    head = model.head

    x = jnp.asarray(rng.integers(0, 255, (BS, 640, 640, 3), dtype=np.uint8))

    def fwd(xx, p, s):
        xf = xx.astype(jnp.bfloat16) / 255.0
        return model.apply(p, s, xf, fused=True, dtype=jnp.bfloat16)

    # ---- correctness gate: tfirst decode == current decode_parts --------
    raw = jax.jit(lambda xx: fwd(xx, fp, fs))(x[:4])
    b0, s0, c0 = jax.jit(lambda r: head.decode_parts(r))(raw)
    b1, s1, c1 = jax.jit(lambda r: decode_parts_tfirst(head, r))(raw)
    for a, bb, lbl in ((b0, b1, "boxes"), (s0, s1, "scores"), (c0, c1, "cls")):
        d = float(jnp.max(jnp.abs(a - bb)))
        print(f"  tfirst {lbl} max|diff| = {d:.3e}")
        assert d == 0.0, f"tfirst decode mismatch on {lbl}"

    # ---- decode variants, cumulative over fwd ---------------------------
    print(f"\n{name} bs{BS} decode variants (cumulative fwd+decode):")
    scan_time(lambda xx, p, s: head.decode_parts(fwd(xx, p, s)),
              (x, fp, fs), "fwd + decode (current)")
    scan_time(lambda xx, p, s: decode_parts_tfirst(head, fwd(xx, p, s)),
              (x, fp, fs), "fwd + decode (transpose-first)")

    # ---- full serve path variants ---------------------------------------
    def full_current(xx, p, s):
        bb, ss, cc = head.decode_parts(fwd(xx, p, s))
        return nms_parts(bb, ss, cc, conf_thres=0.25, iou_thres=0.45,
                         max_det=300, max_nms=512, backend="matrix")

    def full_tfirst(xx, p, s):
        bb, ss, cc = decode_parts_tfirst(head, fwd(xx, p, s))
        return nms_parts(bb, ss, cc, conf_thres=0.25, iou_thres=0.45,
                         max_det=300, max_nms=512, backend="matrix")

    def full_tfirst_blocked(block):
        def f(xx, p, s):
            bb, ss, cc = decode_parts_tfirst(head, fwd(xx, p, s))
            cand = jnp.where(ss > 0.25, ss, NEG_INF)
            tsc, tix = _top_k_candidates(cand, 512)
            tb = jnp.take_along_axis(bb, tix[..., None], axis=1)
            tc = jnp.take_along_axis(cc, tix, axis=1)
            from dmayolo_tpu.core.nms import MAX_WH
            nb = tb + (tc * MAX_WH)[..., None]
            ki, kv = nms_matrix_blocked(nb, tsc, 0.45, 300, block=block)
            ob = jnp.take_along_axis(tb, ki[..., None], axis=1)
            os_ = jnp.take_along_axis(tsc, ki, axis=1)
            oc = jnp.take_along_axis(tc, ki, axis=1)
            dets = jnp.concatenate([ob, os_[..., None], oc[..., None]], -1)
            return jnp.where(kv[..., None], dets, 0.0), kv
        return f

    print(f"\n{name} bs{BS} full serve path:")
    scan_time(full_current, (x, fp, fs), "current (fixpoint K=512)")
    scan_time(full_tfirst, (x, fp, fs), "tfirst decode + fixpoint")
    for blk in (64, 128, 256):
        scan_time(full_tfirst_blocked(blk), (x, fp, fs),
                  f"tfirst + blocked NMS C={blk}")

    # ---- NMS internals at K=512 on synthetic candidates -----------------
    K = 512
    cxy = rng.uniform(0, 640, (BS, K, 2)).astype(np.float32)
    cwh = rng.uniform(4, 120, (BS, K, 2)).astype(np.float32)
    cb = jnp.asarray(np.concatenate([cxy, cxy + cwh], -1))
    cs = jnp.asarray(
        np.sort(rng.uniform(0.25, 1, (BS, K)).astype(np.float32))[:, ::-1].copy())

    print(f"\nNMS internals at (B={BS}, K={K}):")
    scan_time(lambda b_, s_: _fixpoint_keep(_pairwise_iou(b_, b_), s_ > 0, 0.45),
              (cb, cs), "full fixpoint")
    for blk in (64, 128, 256):
        scan_time(lambda b_, s_, bl=blk: nms_matrix_blocked(
            b_, jnp.where(s_ > 0, s_, NEG_INF), 0.45, 300, block=bl),
            (cb, cs), f"blocked C={blk}")


if __name__ == "__main__":
    main()
