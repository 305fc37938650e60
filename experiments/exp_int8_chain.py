"""Where does the int8 per-conv win go end-to-end?

exp_int8_conv.py measured isolated convs at 1.8-3.1x bf16, but the full
yolov5s int8 serve came in at +1.5% (4,779 vs 4,706 img/s, round 5).
Hypothesis: the inter-conv requant chain (int32 dequant -> SiLU ->
re-quantize to int8) doesn't fuse the way the bf16 path's SiLU does, and
the int32 conv output doubles write traffic.

Chains of 4 convs at the P3 serving shape (bs128, 80x80, 128ch, 3x3):
  A  bf16 conv -> SiLU            (production baseline)
  B  int8 conv -> int32 -> f32 dequant+SiLU -> quantize -> int8 conv
  C  B with the dequant in bf16
  D  int8 convs with NO requant between (int8 in, int8 out via clip) —
     the fusion ceiling: what B/C would cost if XLA fused perfectly.

    python experiments/exp_int8_chain.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import calibrate, scan_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    calibrate()
    rng = np.random.default_rng(0)
    B, H, C, K, DEPTH = 128, 80, 128, 3, 4

    w = jnp.asarray(rng.normal(0, 0.05, (K, K, C, C)).astype(np.float32))
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
    w8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    x = jnp.asarray(rng.normal(0, 1, (B, H, H, C)).astype(np.float32))
    s_x = float(np.abs(np.asarray(x)).max() / 127.0)

    def conv(xx, wgt, pet):
        return jax.lax.conv_general_dilated(
            xx, wgt, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    def chain_a(xx):
        y = xx.astype(jnp.bfloat16)
        for _ in range(DEPTH):
            y = jax.nn.silu(conv(y, w.astype(jnp.bfloat16), jnp.bfloat16))
        return jnp.sum(y.astype(jnp.float32))

    def chain_b(xx):
        y = xx
        for _ in range(DEPTH):
            q = jnp.clip(jnp.round(y.astype(jnp.float32) / s_x),
                         -127, 127).astype(jnp.int8)
            acc = conv(q, w8, jnp.int32)
            y = jax.nn.silu(acc.astype(jnp.float32) * (s_x * s_w))
        return jnp.sum(y)

    def chain_c(xx):
        y = xx.astype(jnp.bfloat16)
        sc = (s_x * s_w).astype(jnp.bfloat16)
        for _ in range(DEPTH):
            q = jnp.clip(jnp.round(y.astype(jnp.float32) / s_x),
                         -127, 127).astype(jnp.int8)
            acc = conv(q, w8, jnp.int32)
            y = jax.nn.silu(acc.astype(jnp.bfloat16) * sc)
        return jnp.sum(y.astype(jnp.float32))

    def chain_d(xx):
        q = jnp.clip(jnp.round(xx.astype(jnp.float32) / s_x),
                     -127, 127).astype(jnp.int8)
        for _ in range(DEPTH):
            acc = conv(q, w8, jnp.int32)
            q = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)  # cheap requant
        return jnp.sum(q.astype(jnp.float32))

    gf = DEPTH * 2 * B * H * H * C * C * K * K / 1e9
    print(f"4-conv chain at P3 (bs{B}, {H}x{H}, {C}ch, {K}x{K}; "
          f"{gf:.0f} GF/chain):")
    for name, fn in (("A bf16+SiLU", chain_a), ("B int8 f32-requant", chain_b),
                     ("C int8 bf16-requant", chain_c),
                     ("D int8 no-requant ceiling", chain_d)):
        scan_time(fn, (x,), name)


if __name__ == "__main__":
    main()
