"""Same-input parallel-conv packing: conv(x,W1) || conv(x,W2) vs
conv(x, [W1;W2]) at the flagship's C3 cv1/cv2 shapes.

Every C3 applies two 1x1 convs to the SAME input tensor (cv1, cv2).  At
the flagship's P2 (bs128, 160px, 64ch) each conv is HBM-bound: ~419 MB
input read apiece vs 0.14 ms of MXU work, and each fills only 64 of 128
output lanes.  Packing the filters reads x once and fills the lanes.
Exact per output channel.  This measures whether XLA already shares the
read (fusion/CSE) and what packing buys at each C3 shape class.

    python experiments/exp_packconv.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import calibrate, scan_time  # noqa: E402
import exp_serve_decomp as d  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

    # (B, H, C): flagship C3 shape classes at bs128/640px
    shapes = [(128, 160, 64), (128, 80, 128), (128, 40, 256), (128, 20, 512)]
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    for b, h, c in shapes:
        d.BS = b
        cc = c // 2 if c > 64 else c  # C3 hidden width c_ = c*e (e=0.5) or 64
        x = jnp.asarray(rng.normal(0, 1, (b, h, h, c)).astype(np.float32),
                        dtype=jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.1, (1, 1, c, cc)), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(0, 0.1, (1, 1, c, cc)), jnp.bfloat16)
        wp = jnp.concatenate([w1, w2], axis=-1)

        def two(xx, a, bb):
            y1 = jax.nn.silu(conv(xx, a))
            y2 = jax.nn.silu(conv(xx, bb))
            return y1, y2

        def packed(xx, ww):
            y = jax.nn.silu(conv(xx, ww))
            return y[..., :cc], y[..., cc:]

        print(f"(B{b},{h}x{h},{c}->2x{cc}) 1x1 bf16:", flush=True)
        t2 = scan_time(two, (x, w1, w2), "two separate convs")
        tp = scan_time(packed, (x, wp), "packed conv + split")
        print(f"  -> packing saves {t2 - tp:.3f} ms\n", flush=True)


if __name__ == "__main__":
    main()
