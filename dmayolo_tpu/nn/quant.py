"""int8 post-training quantization for TPU serving.

The reference's only quantized artifact is the --int8 TFLite export
(ref export.py:197-205) for edge CPUs.  On TPU the MXU natively runs
int8 x int8 -> int32 at roughly 2x the bf16 rate (chip-measured 1.8-3.1x
at yolov5s layer shapes, experiments/exp_int8_conv.py), so the same PTQ
idea is a SERVING accelerator here, not just an export format.

Scheme (mirrors cli/export.py's int8 TFLite design decisions):
  * per-tensor symmetric input scale per conv, calibrated from
    representative images (|x|max over calibration batches / 127);
  * per-output-channel symmetric weight scale (folded-BN weights);
  * int32 accumulation, dequantised f32 epilogue — activation/BN/concat
    math stays full-precision, and the DECODE stays float (the quantized
    graph ends at the raw head tensors, same as the TFLite artifact);
  * the stem (c1 < 16) and grouped convs stay bf16: the 3-channel stem
    measured SLOWER in int8 (44 TOP/s vs 58 TF/s bf16 — nothing to feed
    the MXU with), and grouped int8 conv lowering is unproven here.

Use:
    scales = calibrate_act_scales(model, fp, fs, batches)  # uint8 NHWC
    raw = model.apply(fp, fs, x, fused=True, dtype=jnp.bfloat16,
                      quant=scales)
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

Path = Tuple[str, ...]


def eligible_conv_paths(model, min_cin: int = 16) -> Dict[Path, "object"]:
    """{conv_path: Conv2d module} for convs the int8 path supports."""
    from .primitives import Conv2d

    out = {}

    def walk(mod):
        for c in mod._children.values():
            walk(c)
        if (isinstance(mod, Conv2d) and mod.g == 1 and mod.c1 >= min_cin
                and "dfl" not in mod.path):
            # the DFL expectation conv stays float: negligible compute,
            # and box regression is the part most sensitive to its bins
            out[mod.path + ()] = mod

    walk(model)
    return out


def calibrate_act_scales(model, params, stats, batches: Iterable,
                         dtype=jnp.float32, min_cin: int = 16,
                         exclude: Optional[Iterable[Path]] = None
                         ) -> Dict[Path, float]:
    """Per-conv input scales from representative batches.

    batches: iterable of uint8/float NHWC image batches (uint8 is
    normalised /255 like the serving path).  Returns {conv_path: scale}
    covering every eligible conv; feed to model.apply(quant=...).
    """
    eligible = eligible_conv_paths(model, min_cin=min_cin)
    observe: Dict[Path, list] = {}
    n = 0
    for b in batches:
        x = jnp.asarray(b)
        if x.dtype == jnp.uint8:
            x = x.astype(dtype) / 255.0
        model.apply(params, stats, x, fused=True, dtype=dtype,
                    quant_observe=observe)
        n += 1
    if n == 0:
        raise ValueError("int8 calibration needs at least one batch")
    excl = set(map(tuple, exclude)) if exclude else set()
    scales = {}
    for path, maxes in observe.items():
        if path in eligible and path not in excl:
            amax = float(np.max([float(m) for m in maxes]))
            scales[path] = max(amax, 1e-6) / 127.0
    return scales


def quant_coverage(model, scales: Dict[Path, float]) -> str:
    """One-line human summary: how much of the conv compute is int8."""
    eligible = eligible_conv_paths(model, min_cin=1)
    n_int8 = sum(1 for p in eligible if p in scales)
    return f"int8 convs: {n_int8}/{len(eligible)}"
