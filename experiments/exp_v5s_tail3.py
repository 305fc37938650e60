"""Isolate the in-context NMS fixpoint cost on yolov5s bs128.

Ladder (exp_v5s_tail2): +offset+iou+fixpoint adds 2.7 ms in-context while
the same fixpoint on synthetic uniform candidates is 2.1 ms and the
blocked form 0.31 ms — yet blocked wins nothing in-context.  Split the
cost: control (while_loop) vs convergence depth (real candidates from a
prior-init model are heavily clustered) vs compute.

    python experiments/exp_v5s_tail3.py
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
                                      nms_matrix_blocked)
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

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

    K = 512

    def upto_nmsboxes(xx, p, s):
        bb, ss, cc = head.decode_parts(fwd(xx, p, s))
        cand = jnp.where(ss > 0.25, ss, NEG_INF)
        tsc, tix = _top_k_candidates(cand, K)
        tb = jnp.take_along_axis(bb, tix[..., None], axis=1)
        tc = jnp.take_along_axis(cc, tix, axis=1)
        nb = tb + (tc * MAX_WH)[..., None]
        return nb, tsc

    # diagnostics on real candidates: how many valid, what chain depth?
    nb, tsc = jax.jit(lambda xx: upto_nmsboxes(xx, fp, fs))(x)
    valid = np.asarray(tsc > NEG_INF / 2)
    print(f"valid candidates/img: mean {valid.sum(1).mean():.0f} "
          f"min {valid.sum(1).min()} max {valid.sum(1).max()}")

    # measure convergence depth of the bracket iteration on real data
    # (counter carried inside the device while_loop — one host read)
    @jax.jit
    def bracket_depth(nb_, valid_):
        iou = _pairwise_iou(nb_, nb_)
        kk = iou.shape[-1]
        rank = jnp.arange(kk)
        S = ((iou > 0.45) & (rank[None, :, None] < rank[None, None, :])
             & valid_[:, :, None]).astype(jnp.bfloat16)

        def T(kv):
            sup = jnp.einsum("bij,bi->bj", S, kv.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return (sup < 0.5) & valid_

        def cond(st):
            lo, hi, i = st
            return jnp.logical_and(jnp.any(lo != hi), i < kk)

        def body(st):
            lo, hi, i = st
            return T(hi), T(lo), i + 1

        lo0 = T(valid_)
        _, _, n = jax.lax.while_loop(cond, body, (lo0, T(lo0), jnp.int32(0)))
        return n

    depth = int(bracket_depth(nb, jnp.asarray(valid)))
    print(f"bracket iterations to converge on real candidates: {depth}",
          flush=True)

    def fixpoint_n(iters):
        def kernel(iou_, valid_):
            kq = iou_.shape[-1]
            rk = jnp.arange(kq)
            Sq = ((iou_ > 0.45) & (rk[None, :, None] < rk[None, None, :])
                  & valid_[:, :, None]).astype(jnp.bfloat16)

            def Tq(kv):
                sup = jnp.einsum("bij,bi->bj", Sq, kv.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                return (sup < 0.5) & valid_

            lo_ = Tq(valid_)
            for _ in range(iters):
                lo_ = Tq(Tq(lo_))
            return lo_
        return kernel

    def l4_variant(nms_fn):
        def f(xx, p, s):
            nb_, tsc_ = upto_nmsboxes(xx, p, s)
            return nms_fn(nb_, tsc_), tsc_
        return f

    print("\nin-context tail variants (cumulative full-program):")
    scan_time(l4_variant(lambda b_, s_: s_ > NEG_INF / 2), (x, fp, fs),
              "no NMS (keep=valid)")
    scan_time(l4_variant(lambda b_, s_: _fixpoint_keep(
        _pairwise_iou(b_, b_), s_ > NEG_INF / 2, 0.45)), (x, fp, fs),
        "fixpoint (while_loop)")
    for it in (2, 4, 8):
        scan_time(l4_variant(
            lambda b_, s_, i=it: fixpoint_n(i)(_pairwise_iou(b_, b_),
                                               s_ > NEG_INF / 2)),
            (x, fp, fs), f"unrolled {it}x2 T-evals")
    scan_time(l4_variant(lambda b_, s_: nms_matrix_blocked(
        b_, s_, 0.45, 300, block=64)[1]), (x, fp, fs),
        "blocked C=64 (incl. top300)")


if __name__ == "__main__":
    main()
