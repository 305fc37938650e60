"""Fine-grained yolov5s serving-tail decomposition (follow-up to
exp_v5s_tail.py: swapping the NMS fixpoint for the 7x-faster blocked form
changed end-to-end NOTHING, so the ~5 ms post-decode tail is elsewhere).

Cumulative ladder over the full program:
  fwd+decode -> +gate+topk(scores) -> +gather boxes -> +gather cls ->
  +class offset -> +iou+fixpoint -> +final gathers (= full serve).
Plus variants: lax.top_k vs approx_max_k, packed single-tensor gather.

    python experiments/exp_v5s_tail2.py [yolov5s]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import BS, calibrate, scan_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.core.nms import (MAX_WH, NEG_INF, _fixpoint_keep,
                                      _pairwise_iou, _top_k_candidates,
                                      nms_matrix, nms_matrix_blocked)
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

    def dec(xx, p, s):
        return head.decode_parts(fwd(xx, p, s))

    K = 512

    def l0(xx, p, s):
        return dec(xx, p, s)

    def l1(xx, p, s):  # + gate + topk scores
        bb, ss, cc = dec(xx, p, s)
        cand = jnp.where(ss > 0.25, ss, NEG_INF)
        return _top_k_candidates(cand, K)

    def l1b(xx, p, s):  # lax.top_k instead
        bb, ss, cc = dec(xx, p, s)
        cand = jnp.where(ss > 0.25, ss, NEG_INF)
        return jax.lax.top_k(cand, K)

    def l2(xx, p, s):  # + gather boxes
        bb, ss, cc = dec(xx, p, s)
        cand = jnp.where(ss > 0.25, ss, NEG_INF)
        tsc, tix = _top_k_candidates(cand, K)
        return tsc, jnp.take_along_axis(bb, tix[..., None], axis=1)

    def l3(xx, p, s):  # + gather cls
        bb, ss, cc = dec(xx, p, s)
        cand = jnp.where(ss > 0.25, ss, NEG_INF)
        tsc, tix = _top_k_candidates(cand, K)
        tb = jnp.take_along_axis(bb, tix[..., None], axis=1)
        tc = jnp.take_along_axis(cc, tix, axis=1)
        return tsc, tb, tc

    def l4(xx, p, s):  # + offset + iou + fixpoint keep (no final gathers)
        bb, ss, cc = dec(xx, p, s)
        cand = jnp.where(ss > 0.25, ss, NEG_INF)
        tsc, tix = _top_k_candidates(cand, K)
        tb = jnp.take_along_axis(bb, tix[..., None], axis=1)
        tc = jnp.take_along_axis(cc, tix, axis=1)
        nb = tb + (tc * MAX_WH)[..., None]
        keep = _fixpoint_keep(_pairwise_iou(nb, nb), tsc > NEG_INF / 2, 0.45)
        return keep, tsc, tb, tc

    def l5(xx, p, s):  # full serve (fixpoint) = l4 + topk300 + final gathers
        bb, ss, cc = dec(xx, p, s)
        cand = jnp.where(ss > 0.25, ss, NEG_INF)
        tsc, tix = _top_k_candidates(cand, K)
        tb = jnp.take_along_axis(bb, tix[..., None], axis=1)
        tc = jnp.take_along_axis(cc, tix, axis=1)
        nb = tb + (tc * MAX_WH)[..., None]
        ki, kv = nms_matrix(nb, tsc, 0.45, 300)
        ob = jnp.take_along_axis(tb, ki[..., None], axis=1)
        osc = jnp.take_along_axis(tsc, ki, axis=1)
        oc = jnp.take_along_axis(tc, ki, axis=1)
        dets = jnp.concatenate([ob, osc[..., None], oc[..., None]], -1)
        return jnp.where(kv[..., None], dets, 0.0), kv

    print(f"{name} bs{BS} tail ladder (cumulative):")
    scan_time(l0, (x, fp, fs), "fwd + decode")
    scan_time(l1, (x, fp, fs), "+ gate + approx_max_k")
    scan_time(l1b, (x, fp, fs), "+ gate + lax.top_k (alt)")
    scan_time(l2, (x, fp, fs), "+ gather boxes")
    scan_time(l3, (x, fp, fs), "+ gather cls")
    scan_time(l4, (x, fp, fs), "+ offset+iou+fixpoint")
    scan_time(l5, (x, fp, fs), "+ final gathers (= full serve)")


if __name__ == "__main__":
    main()
