"""Lazy vs eager serving decode on the chip.

Eager: decode_parts (all-anchor box decode) + nms_parts.
Lazy:  decode_topk (fused score pass -> top-k -> decode K boxes) +
       nms_from_topk.  Identical outputs (tests/test_lazy_decode.py);
this measures what skipping the all-anchor box math buys per model.

    python experiments/exp_lazy_decode.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import calibrate, scan_time  # noqa: E402


def main():
    import jax.numpy as jnp
    import jax

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.core.nms import nms_from_topk, nms_parts
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, bs in (("yolov5n", 128), ("yolov5s", 128),
                     ("ablation-ca-scconv-sppfcspc", 128),
                     ("CASPD_ODRTA", 64)):
        if only and name != only:
            continue
        model = DetectionModel(
            os.path.join(repo, f"dmayolo_tpu/configs/models/{name}.yaml"),
            nc=10)
        params, stats = model.init_with_priors(jax.random.PRNGKey(0))
        fp, fs = fuse_params(model, params, stats)
        x = jnp.asarray(rng.integers(0, 255, (bs, 640, 640, 3), dtype=np.uint8))

        def fwd(xx, p, s):
            xf = xx.astype(jnp.bfloat16) / 255.0
            return model.apply(p, s, xf, fused=True, dtype=jnp.bfloat16)

        def eager(xx, p, s):
            boxes, scores, cls = model.decode_parts(fwd(xx, p, s))
            return nms_parts(boxes, scores, cls, conf_thres=0.25,
                             iou_thres=0.45, max_det=300, max_nms=512,
                             backend="matrix")

        def lazy(xx, p, s):
            tb, ts, tc = model.decode_topk(fwd(xx, p, s), k=512,
                                           conf_thres=0.25)
            return nms_from_topk(tb, ts, tc, iou_thres=0.45, max_det=300,
                                 backend="matrix")

        import exp_serve_decomp as d
        d.BS = bs  # scan_time prints img/s off its module global
        print(f"{name} bs{bs} 640px bf16 fused:", flush=True)
        te = scan_time(eager, (x, fp, fs), "eager decode_parts+nms_parts")
        tl = scan_time(lazy, (x, fp, fs), "lazy  decode_topk+nms_from_topk")
        print(f"  -> lazy saves {te - tl:.2f} ms/batch "
              f"({bs / tl * 1000:.0f} vs {bs / te * 1000:.0f} img/s)\n",
              flush=True)
        del model, params, stats, fp, fs, x


if __name__ == "__main__":
    main()
