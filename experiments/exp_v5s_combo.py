"""yolov5s serving after the slim-decode + fused-S NMS changes.

Measures the PRODUCTION paths (serve_detections eager, and the lazy
decode_topk tail force-enabled for Detect — the slim decode_scores skips
all box math, which may flip the r3 eager-vs-lazy verdict for Detect).

    python experiments/exp_v5s_combo.py [model ...]
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
    from dmayolo_tpu.core.nms import NEG_INF, nms_from_topk, nms_parts
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = sys.argv[1:] or ["yolov5s"]
    for name in names:
        model = DetectionModel(
            os.path.join(repo, f"dmayolo_tpu/configs/models/{name}.yaml"),
            nc=10)
        params, stats = model.init_with_priors(jax.random.PRNGKey(0))
        fp, fs = fuse_params(model, params, stats)
        head = model.head
        bs = BS if name not in ("ablation-ca-scconv-sppfcspc",) else 128
        x = jnp.asarray(
            rng.integers(0, 255, (bs, 640, 640, 3), dtype=np.uint8))

        def fwd(xx, p, s):
            xf = xx.astype(jnp.bfloat16) / 255.0
            return model.apply(p, s, xf, fused=True, dtype=jnp.bfloat16)

        def eager(xx, p, s):
            raw = fwd(xx, p, s)
            return model.serve_detections(raw, conf_thres=0.25,
                                          iou_thres=0.45, max_det=300,
                                          max_nms=512, backend="matrix")

        def lazy(xx, p, s):
            raw = fwd(xx, p, s)
            tb, ts, tc = model.decode_topk(raw, k=512, conf_thres=0.25)
            return nms_from_topk(tb, ts, tc, iou_thres=0.45, max_det=300,
                                 backend="matrix")

        print(f"\n{name} bs{bs} production serve:", flush=True)
        scan_time(eager, (x, fp, fs), "eager (serve_detections)")
        scan_time(lazy, (x, fp, fs), "lazy (decode_topk tail)")


if __name__ == "__main__":
    main()
