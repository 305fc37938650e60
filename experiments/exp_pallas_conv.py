"""Race Pallas conv3x3_s1 vs lax.conv at the 1536px-regime shapes.

The XLA baseline at (4,768,768,64) measured 11.85 ms (~15 TF/s) in round 2
session 3; batch-heavy layouts prove ~67 TF/s is reachable for the same
work.  This experiment measures whether the VMEM-retile Pallas kernel
closes the gap.  Run on an idle host (ROUND2_NOTES measurement pitfalls).

MEASURED (v5e, 2026-08-18, idle host, fresh cache) — the kernel caps at
~15-17 TF/s at every shape regardless of rh/variant, i.e. it reproduces
XLA's own bound for the pathological layout rather than the batch-heavy
67 TF/s ceiling:

  (4,768,768,64->64)    lax.conv 33.10 ms  5.3 TF/s | pallas im2col 11.80 ms 14.7 TF/s (2.81x)
  (8,768,768,64->64)    lax.conv 13.40 ms 26.0 TF/s | pallas im2col 20.81 ms 16.7 TF/s (0.64x)
  (8,384,384,128->128)  lax.conv  6.08 ms 57.2 TF/s | pallas im2col  6.40 ms 54.4 TF/s (0.95x)
  (8,384,384,64->64)    lax.conv  5.21 ms 16.7 TF/s | pallas im2col  7.09 ms 12.3 TF/s (0.74x)
  (128,320,320,64->64)  lax.conv  9.47 ms 102 TF/s  | pallas im2col 57.5 ms 16.8 TF/s (0.16x)

Verdict: the only winning regime is the tiny-batch/huge-spatial/64-ch
corner (bs4 @1536px) where XLA is at 5 TF/s — but the production 1536
recipe banked in round 2 session 3 is bs8+remat, where lax.conv is 26
TF/s and the kernel LOSES 0.64x.  The per-step VPU im2col repack (lane-
offset windowed slices), not DMA, is the ~16 TF/s wall: sum9 (no lane
repack, 9 matmuls) is no faster, so the strided (dy,dx)-offset reads
themselves are the bound.  The kernel stays in-tree as the TPU-kernel
path for shapes XLA mishandles (opt-in; golden-tested in
tests/test_pallas_conv.py) but is NOT wired into Conv by default.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from dmayolo_tpu.nn.pallas_conv import conv3x3_s1


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out[0, 0, 0])  # force a real device round trip
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out[0, 0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (4, 768, 768, 64, 64),    # SCConv k3 @1536 bs4
        (8, 768, 768, 64, 64),    # same @bs8 (the remat recipe batch)
        (8, 384, 384, 128, 128),  # SCConv k3 stage 2
        (8, 384, 384, 64, 64),    # C3(128) bottleneck 3x3
        (128, 320, 320, 64, 64),  # serving P1-ish @640 bs128 (XLA near-bound here?)
    ]
    for B, H, W, C1, C2 in shapes:
        x = jnp.asarray(rng.normal(size=(B, H, W, C1)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.normal(size=(3, 3, C1, C2)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
        gf = 2 * B * H * W * 9 * C1 * C2 / 1e9

        ref = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        t_ref = timed(ref, x, w)
        print(f"({B},{H},{W},{C1}->{C2})  lax.conv {t_ref*1e3:7.2f} ms  {gf/t_ref/1e3:6.1f} TF/s")

        for variant in ("im2col", "sum9"):
            for rh in (8, 16, 32):
                try:
                    f = jax.jit(lambda x, w, v=variant, r=rh: conv3x3_s1(x, w, rh=r, variant=v))
                    t = timed(f, x, w)
                    print(f"    pallas {variant:6s} rh={rh:2d} {t*1e3:7.2f} ms  {gf/t/1e3:6.1f} TF/s  ({t_ref/t:4.2f}x)")
                except Exception as e:
                    print(f"    pallas {variant:6s} rh={rh:2d} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
