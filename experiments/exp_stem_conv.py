"""Stem conv rewrite: 6x6/s2/p2 on 3ch  ==  space-to-depth(2) + 3x3/s1/p1 on 12ch.

The YOLOv5 stem (ref models/yolov5s.yaml backbone[0]: Conv(3,C,6,2,2))
feeds the MXU 3 input channels — 3/128 lanes.  Indexing identity: with
ky = 2a + by (a in 0..2, by in 0..1), input row 2y + ky - 2 =
2(y + a - 1) + by, so the 6x6/s2 conv over x equals a 3x3/s1 conv over
the 2x2 space-to-depth packing of x (12 channels), with the kernel
re-indexed W6[2a+by, 2b+bx, c, o] -> W3[a, b, (by,bx,c), o].  Exact in
exact arithmetic — this measures whether XLA's own conv lowering already
exploits it, and what the rewrite buys at serving shapes (bs128 640px
bf16, v5s C=32 and v5x C=80), plus numerical agreement.

    python experiments/exp_stem_conv.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import calibrate, scan_time  # noqa: E402


def spd2(x):
    """2x2 space-to-depth, NHWC: (B,H,W,C) -> (B,H/2,W/2,4C).

    Channel order (by, bx, c) matches the kernel re-indexing below.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/2, W/2, by, bx, c
    return x.reshape(b, h // 2, w // 2, 4 * c)


def repack_w6(w6):
    """(6,6,C,O) 6x6 kernel -> (3,3,4C,O) kernel over the SPD tensor."""
    k, k2, c, o = w6.shape
    assert k == 6 and k2 == 6
    w = w6.reshape(3, 2, 3, 2, c, o)          # a, by, b, bx, c, o
    w = w.transpose(0, 2, 1, 3, 4, 5)         # a, b, by, bx, c, o
    return w.reshape(3, 3, 4 * c, o)


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

    for label, bs, cout in (("v5s stem 3->32", 128, 32),
                            ("v5x stem 3->80", 32, 80)):
        x = jnp.asarray(
            rng.integers(0, 255, (bs, 640, 640, 3), np.uint8))
        w6 = jnp.asarray(rng.normal(0, 0.1, (6, 6, 3, cout)) \
                         .astype(np.float32)).astype(jnp.bfloat16)
        w3 = jnp.asarray(repack_w6(np.asarray(w6)))

        dn6 = jax.lax.conv_dimension_numbers(
            (bs, 640, 640, 3), (6, 6, 3, cout), ("NHWC", "HWIO", "NHWC"))
        dn3 = jax.lax.conv_dimension_numbers(
            (bs, 320, 320, 12), (3, 3, 12, cout), ("NHWC", "HWIO", "NHWC"))

        def direct(xx, wgt):
            xf = xx.astype(jnp.bfloat16) / 255.0
            return jax.lax.conv_general_dilated(
                xf, wgt, (2, 2), [(2, 2), (2, 2)], dimension_numbers=dn6,
                preferred_element_type=jnp.bfloat16)

        def spd(xx, wgt):
            xf = spd2(xx).astype(jnp.bfloat16) / 255.0
            return jax.lax.conv_general_dilated(
                xf, wgt, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn3,
                preferred_element_type=jnp.bfloat16)

        a = jax.jit(direct)(x[:2], w6)
        b = jax.jit(spd)(x[:2], w3)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        flops = 2 * bs * 320 * 320 * 36 * 3 * cout
        print(f"\n{label} bs{bs} ({flops / 1e9:.1f} GF/batch, "
              f"max|diff|={err:.4f}):", flush=True)
        t_d = scan_time(direct, (x, w6), "direct 6x6/s2")  # ms/batch
        print(f"    direct  {flops / t_d / 1e9:6.1f} TF/s", flush=True)
        t_s = scan_time(spd, (x, w3), "spd + 3x3/s1")
        print(f"    spd3x3  {flops / t_s / 1e9:6.1f} TF/s  "
              f"({t_d / t_s:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
