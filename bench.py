"""Benchmark: flagship-model batch inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: the north-star target of 5,000 img/s/chip at 640px batch
inference (BASELINE.md; the reference itself publishes only V100 numbers —
4.9 ms/img fp16 batch-32 YOLOv5x ~= 204 img/s).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_S = 5000.0


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    from dmayolo_tpu.core.nms import batched_nms
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    from pathlib import Path

    cfg = str(Path(__file__).resolve().parent
              / "dmayolo_tpu/configs/models/ablation-ca-scconv-sppfcspc.yaml")
    batch, img = 64, 640

    model = DetectionModel(cfg, nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fparams, fstats = fuse_params(model, params, stats)

    @jax.jit
    def infer(p, s, x):
        raw = model.apply(p, s, x.astype(jnp.bfloat16) / 255.0, fused=True,
                          dtype=jnp.bfloat16)
        dec = model.decode(raw)
        # full serving path: normalise + forward + decode + NMS in ONE program
        return batched_nms(dec, conf_thres=0.25, iou_thres=0.45, max_det=300,
                           max_nms=2048)

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, img, img, 3), dtype=np.uint8)
    )

    # warmup / compile
    jax.block_until_ready(infer(fparams, fstats, x))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(fparams, fstats, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "flagship_bf16_batch64_640px_infer_nms",
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
