"""Model inspection CLI — the reference's `python models/yolo.py --cfg`
micro-harness (models/yolo.py:481-499): build a config, print the layer
table / param count / GFLOPs, optionally profile per layer.

Usage: python -m dmayolo_tpu.cli.model --cfg yolov5s.yaml [--profile] [--imgsz 640]
"""
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser("dmayolo-model")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--imgsz", "--img", type=int, default=640, dest="imgsz")
    p.add_argument("--profile", action="store_true", help="per-layer timing")
    p.add_argument("--batch", type=int, default=1,
                   help="profile batch size (use serving batch, e.g. 128)")
    p.add_argument("--bf16", action="store_true",
                   help="profile in bfloat16 (serving dtype)")
    p.add_argument("--fused", action="store_true",
                   help="profile BN-folded inference weights (fuse_params)")
    p.add_argument("--verbose", action="store_true", help="print the layer table")
    p.add_argument("--device", type=str, default=None)
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)
    from .common import setup_device

    setup_device(opt.device)
    import jax

    from ..graph import DetectionModel
    from ..utils.model_info import model_info, profile_layers
    from .common import resolve_config

    model = DetectionModel(resolve_config(opt.cfg, "models"), nc=opt.nc)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    if opt.verbose:
        print(model.describe())
    model_info(model, params, stats, img_size=opt.imgsz)
    if opt.profile:
        import jax.numpy as jnp

        if opt.fused:
            from ..nn.fuse import fuse_params

            params, stats = fuse_params(model, params, stats)
        profile_layers(model, params, stats,
                       img_size=opt.imgsz if opt.batch > 1 else min(opt.imgsz, 320),
                       batch=opt.batch,
                       dtype=jnp.bfloat16 if opt.bf16 else jnp.float32,
                       fused=opt.fused)
    return model


if __name__ == "__main__":
    main()
