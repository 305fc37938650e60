"""Does int8 buy conv throughput on this chip at yolov5s serving shapes?

v5e's MXU runs s8xs8->s32 at 394 TOPs nominal — 2x the bf16 peak. If XLA
exposes that for conv_general_dilated, an int8 PTQ serving path could
lift yolov5s (26.6 GF/img, 62% MXU at bs128) past the 5,000 img/s north
star without touching the architecture. This measures raw conv speed
bf16 vs int8 at the four dominant v5s layer shapes, plus one full
C3-block-sized chain, using the scan-timer methodology.

    python experiments/exp_int8_conv.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import calibrate, scan_time  # noqa: E402

# (label, B, H, W, Cin, Cout, k, stride) — v5s @640 serving, NHWC
SHAPES = [
    ("P2 160^2 64->64 3x3", 128, 160, 160, 64, 64, 3, 1),
    ("P3 80^2 128->128 3x3", 128, 80, 80, 128, 128, 3, 1),
    ("P4 40^2 256->256 3x3", 128, 40, 40, 256, 256, 3, 1),
    ("P5 20^2 512->512 3x3", 128, 20, 20, 512, 512, 3, 1),
    ("P1 320^2 3->32 6x6 s2", 128, 640, 640, 3, 32, 6, 2),
]


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

    for label, b, h, w, cin, cout, k, s in SHAPES:
        x8 = jnp.asarray(rng.integers(-127, 127, (b, h, w, cin), np.int8))
        w8 = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout), np.int8))
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(
            x8.shape, w8.shape, ("NHWC", "HWIO", "NHWC"))

        def conv_bf16(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (s, s), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)

        def conv_int8(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (s, s), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        flops = 2 * b * (h // s) * (w // s) * k * k * cin * cout
        print(f"\n{label}  ({flops / 1e9:.1f} GF):", flush=True)
        try:
            t_b = scan_time(conv_bf16, (xb, wb), "bf16")
            print(f"    bf16  {flops / t_b / 1e9:8.0f} TF/s", flush=True)
        except Exception as e:
            print(f"    bf16 error: {type(e).__name__}: {e}", flush=True)
        try:
            t_i = scan_time(conv_int8, (x8, w8), "int8->int32")
            print(f"    int8  {flops / t_i / 1e9:8.0f} TOP/s", flush=True)
        except Exception as e:
            print(f"    int8 error: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
