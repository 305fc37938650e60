"""Decompose a model's bs128 serving pipeline (default yolov5n): where do the ms go?

yolov5n serves at 8,647 img/s = 14.8 ms/batch-128, which is 31% of its
7.1 GF/img compute ceiling (27,700 img/s).  Two candidate explanations:
(a) the NMS/decode tail, (b) lane under-occupancy of v5n's tiny channel
counts (16-64 ch = 12-50% of the 128 MXU lanes), which would make the
*forward* bound ~3x the naive FLOP bound.  This measures the pipeline
cumulatively — fwd only, +decode, +topk, +NMS — all scan-timed (bench.py
methodology), plus NMS internals on synthetic candidates.  Whatever
dominates is the optimisation target; if nothing does, 31% is
architectural and ROOFLINE gets the decomposition.

    python experiments/exp_serve_decomp.py [yolov5s]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20
_OVERHEAD_MS = [0.0]
BS = 128


def calibrate():
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 8), jnp.float32)

    @jax.jit
    def run(xx):
        def body(c, _):
            return c * 0.5, ()
        c, _ = jax.lax.scan(body, jnp.sum(xx), None, length=ITERS)
        return c

    float(run(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) * 1000)
    _OVERHEAD_MS[0] = sorted(ts)[len(ts) // 2]
    print(f"scan overhead {_OVERHEAD_MS[0]:.1f} ms/run", flush=True)


def scan_time(fn, args, label):
    """Time fn(*args) in-program; args[0] must be a uint8/float array the
    carry can fold into (bench.py timed() methodology)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(a0, *rest):
        def body(c, _):
            out = fn(a0 + c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (jnp.sum(leaf.astype(jnp.float32)) * 1e-30).astype(a0.dtype), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), a0.dtype), None, length=ITERS)
        return c

    jax.block_until_ready(run(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(*args))
    dt = ((time.perf_counter() - t0) * 1000 - _OVERHEAD_MS[0]) / ITERS
    print(f"  {label:34s} {dt:8.3f} ms/batch  ({BS / dt * 1000:7.0f} img/s)",
          flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.core.nms import (_fixpoint_keep, _pairwise_iou,
                                      _top_k_candidates, nms_parts)
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = sys.argv[1] if len(sys.argv) > 1 else "yolov5n"
    model = DetectionModel(
        os.path.join(repo, f"dmayolo_tpu/configs/models/{name}.yaml"), nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(model, params, stats)

    x = jnp.asarray(rng.integers(0, 255, (BS, 640, 640, 3), dtype=np.uint8))

    def fwd(xx, p, s):
        xf = xx.astype(jnp.bfloat16) / 255.0
        return model.apply(p, s, xf, fused=True, dtype=jnp.bfloat16)

    def fwd_decode(xx, p, s):
        return model.decode_parts(fwd(xx, p, s))

    def fwd_decode_topk(xx, p, s):
        boxes, scores, cls = model.decode_parts(fwd(xx, p, s))
        sc, idx = _top_k_candidates(scores, 512)
        return sc, jnp.take_along_axis(boxes, idx[..., None], axis=1)

    def full(xx, p, s):
        boxes, scores, cls = model.decode_parts(fwd(xx, p, s))
        return nms_parts(boxes, scores, cls, conf_thres=0.25, iou_thres=0.45,
                         max_det=300, max_nms=512, backend="matrix")

    print(f"{name} bs{BS} 640px bf16 fused, cumulative:", flush=True)
    t_f = scan_time(fwd, (x, fp, fs), "fwd only")
    t_fd = scan_time(fwd_decode, (x, fp, fs), "fwd + decode")
    t_fdt = scan_time(fwd_decode_topk, (x, fp, fs), "fwd + decode + top-k")
    t_all = scan_time(full, (x, fp, fs), "fwd + decode + NMS (serve path)")
    print(f"\n  decode {t_fd - t_f:.2f}  topk {t_fdt - t_fd:.2f}  "
          f"nms-rest {t_all - t_fdt:.2f}  (of {t_all:.2f} total)", flush=True)

    # NMS internals on synthetic candidates (post-topk shapes)
    K = 512
    cxy = rng.uniform(0, 640, (BS, K, 2)).astype(np.float32)
    cwh = rng.uniform(4, 120, (BS, K, 2)).astype(np.float32)
    cb = jnp.asarray(np.concatenate([cxy, cxy + cwh], -1))
    cs = jnp.asarray(np.sort(rng.uniform(0.25, 1, (BS, K)).astype(np.float32))[:, ::-1].copy())

    scan_time(lambda b_, s_: _pairwise_iou(b_, b_), (cb, cs),
              "  iou matrix (B,512,512)")
    scan_time(lambda b_, s_: _fixpoint_keep(_pairwise_iou(b_, b_), s_ > 0, 0.45),
              (cb, cs), "  iou + fixpoint")

    # forward-side naive FLOP bound for context
    try:
        an = jax.jit(lambda xx: fwd(xx, fp, fs)).lower(x).compile().cost_analysis()
        fl = an.get("flops", 0.0)
        print(f"\n  XLA fwd flops/batch = {fl / 1e9:.1f} GF -> naive bound "
              f"{fl / 197e12 * 1e3:.2f} ms; measured {t_f:.2f} ms "
              f"({fl / 197e12 * 1e3 / t_f * 100:.0f}% of peak)", flush=True)
    except Exception as e:
        print(f"  cost analysis unavailable: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
