"""Can the Pallas 3x3 kernel beat XLA on the 1536px BACKWARD convs?

docs/ROOFLINE.md §3 localises the 1536px-recipe gap (20.3 img/s, 32% MFU)
to 3x3 convs at large-spatial x 64ch where XLA's emitter runs 5-15 TF/s.
The forward-side Pallas kernel (nn/pallas_conv.py) caps at ~15-17 TF/s —
not enough to beat XLA's forward (~15 TF/s) — but the BACKWARD dX is
itself a 3x3/s1 conv with rot180+channel-transposed weights, and XLA's
dX at these shapes was measured *slower* than its forward (the 2.66x
fwd ratio of exp_bwd_decomp).  If XLA's dX at (8,768,768,64) runs at
5-8 TF/s, the same Pallas kernel that loses on forward wins on backward.

Measures, per deployed shape class of the bs8/1536px recipe:
  1. XLA fwd conv
  2. XLA dX only (vjp wrt x)
  3. XLA dW only (vjp wrt w)
  4. Pallas dX  (conv3x3_s1 on the cotangent with w_hat)
All scan-timed (the only method that holds over the axon tunnel).

    python experiments/exp_bwd_pallas.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20
_OVERHEAD_MS = [0.0]


def calibrate():
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 8), jnp.float32)

    @jax.jit
    def run(xx):
        def body(c, _):
            return c * 0.5, ()
        c, _ = jax.lax.scan(body, jnp.sum(xx), None, length=ITERS)
        return c

    float(run(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) * 1000)
    _OVERHEAD_MS[0] = sorted(ts)[len(ts) // 2]
    print(f"scan overhead {_OVERHEAD_MS[0]:.1f} ms/run", flush=True)


def scan_time(fn, args, label, flops=None):
    """Time fn(*args) via an in-program scan.  All big arrays must be in
    `args` (explicit jit operands) — a closed-over device array becomes an
    HLO constant and the axon remote-compile request 413s past ~100 MB."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(a0, *rest):
        def body(c, _):
            out = fn(a0 + c, *rest)
            return (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(a0.dtype), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), a0.dtype), None, length=ITERS)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    dt = ((time.perf_counter() - t0) * 1000 - _OVERHEAD_MS[0]) / ITERS
    tf = f"  {flops / dt:6.1f} TF/s" if flops else ""
    print(f"  {label:26s} {dt:8.3f} ms{tf}", flush=True)
    return dt


def conv(x, w):
    import jax
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.nn.pallas_conv import conv3x3_s1, pick_tile

    calibrate()
    rng = np.random.default_rng(0)
    results = []
    # bs8/1536px flagship shape classes (stem output downward)
    for (B, H, W, C1, C2) in [
        (8, 768, 768, 64, 64),
        (8, 768, 768, 64, 128),     # stage-2 downsample input class
        (8, 384, 384, 128, 128),
        (8, 384, 384, 64, 64),      # C3 bottleneck hidden at P2
        (8, 192, 192, 256, 256),
    ]:
        gf = 2 * B * H * W * 9 * C1 * C2 / 1e9
        print(f"\nshape ({B},{H},{W},{C1})->{C2}  {gf:.1f} GF:", flush=True)
        x = jnp.asarray(rng.normal(size=(B, H, W, C1)).astype(np.float32),
                        dtype=jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, C1, C2)).astype(np.float32) * .05,
                        dtype=jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(B, H, W, C2)).astype(np.float32),
                        dtype=jnp.bfloat16)
        w_hat = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # rot180 + c-swap

        t_fwd = scan_time(lambda xx, ww: conv(xx, ww), (x, w), "XLA fwd", gf)

        # dX: vjp wrt x, driven by the cotangent g
        def dx_xla(gg, ww):
            _, vjp = jax.vjp(lambda xx: conv(xx, ww),
                             jnp.zeros(gg.shape[:3] + (ww.shape[2],), gg.dtype))
            return vjp(gg)[0]
        t_dx = scan_time(dx_xla, (g, w), "XLA dX", gf)

        def dw_xla(gg, xx, ww):
            _, vjp = jax.vjp(lambda w_: conv(xx, w_), ww)
            return vjp(gg)[0]
        t_dw = scan_time(dw_xla, (g, x, w), "XLA dW", gf)

        row = {"shape": (B, H, W, C1, C2), "fwd": t_fwd, "dx_xla": t_dx,
               "dw_xla": t_dw}
        th, tw = pick_tile(H), pick_tile(W)
        c1p = -(-C2 // 128) * 128  # dX input channels = C2, lane-padded
        vmem_mb = ((th or 0) + 2) * ((tw or 0) + 8) * c1p * 2 / 2**20
        if th and tw and vmem_mb < 12:  # kernel scratch must fit scoped VMEM
            t_pdx = scan_time(lambda gg, wh: conv3x3_s1(gg, wh), (g, w_hat),
                              "Pallas dX", gf)
            # parity check
            ref = jax.jit(dx_xla)(g, w)
            got = conv3x3_s1(g, w_hat)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - got.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
            print(f"  parity max|d|/max|ref| = {err / scale:.2e}", flush=True)
            row["dx_pallas"] = t_pdx
            row["dx_relerr"] = err / scale
        results.append(row)

    print("\nsummary:", flush=True)
    for r in results:
        s = r["shape"]
        line = (f"  {s}: fwd {r['fwd']:.2f}  dX {r['dx_xla']:.2f}"
                f"  dW {r['dw_xla']:.2f}")
        if "dx_pallas" in r:
            line += (f"  pallas-dX {r['dx_pallas']:.2f}"
                     f"  ({r['dx_xla'] / r['dx_pallas']:.2f}x)")
        print(line, flush=True)


if __name__ == "__main__":
    main()
