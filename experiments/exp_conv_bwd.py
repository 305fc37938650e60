"""Per-op backward microbench: which ops make the flagship dX chain 2.7x fwd?

exp_bwd_decomp (validated with the in-program-scan method below) measured
the input-gradient chain at 2.66x the forward (bs32/640px bf16) while dW
adds only 0.7x. This bench times fwd vs grad-wrt-input for each op class
in the flagship, using lax.scan INSIDE one program + a host read — the
only reliable timing on the axon tunnel (a bare python dispatch loop with
block_until_ready returns without waiting for unconsumed results;
measured 8192^3 matmul "0.04 ms" vs 8.0 ms ground truth).

    python experiments/exp_conv_bwd.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 40
_OVERHEAD_MS = [0.0]  # one host-read roundtrip per run(), measured below


def scan_time(fn, x, label, flops=None):
    """Time fn(x)->array via ITERS-long in-program scan + host read (ms).
    Subtracts the fixed per-run tunnel/readback overhead measured by an
    identity scan (~25 ms/run on the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xx):
        def body(c, _):
            out = fn(xx + c)
            return (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(x.dtype), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=ITERS)
        return c

    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    dt = ((time.perf_counter() - t0) * 1000 - _OVERHEAD_MS[0]) / ITERS
    tf = f"  {flops / dt / 1e9:6.1f} TF/s" if flops else ""
    print(f"  {label:24s} {dt:8.3f} ms{tf}")
    return dt


def calibrate_overhead():
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
    print(f"fixed per-run overhead: {_OVERHEAD_MS[0]:.1f} ms "
          f"({_OVERHEAD_MS[0]/ITERS:.3f} ms/iter at ITERS={ITERS})")


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache("~/.cache/dmayolo_jax_expbwd")
    calibrate_overhead()
    rng = np.random.default_rng(0)

    def conv_case(label, b, h, w_, c1, c2, k, s):
        x = jnp.asarray(rng.normal(size=(b, h, w_, c1)).astype(np.float32),
                        dtype=jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k, c1, c2)).astype(np.float32),
                        dtype=jnp.bfloat16)

        def f(xx):
            return jax.lax.conv_general_dilated(
                xx, w, (s, s), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def gx(xx):
            return jax.grad(lambda a: jnp.sum(f(a).astype(jnp.float32)))(xx)

        flops = 2 * b * (h // s) * (w_ // s) * k * k * c1 * c2
        print(f"{label}:")
        tf_ = scan_time(f, x, "fwd", flops)
        tx = scan_time(gx, x, "dX", flops)
        print(f"  {'dX/fwd':24s} {tx/tf_:8.2f}x")

    # flagship conv population at bs32/640px
    conv_case("stem 6x6 s2 3->64 640px", 32, 640, 640, 3, 64, 6, 2)
    conv_case("P2   3x3 s2 64->128 320px", 32, 320, 320, 64, 128, 3, 2)
    conv_case("C3   3x3 s1 64ch 160px", 32, 160, 160, 64, 64, 3, 1)
    conv_case("P3   3x3 s2 128->256 160px", 32, 160, 160, 128, 256, 3, 2)
    conv_case("C3   3x3 s1 128ch 80px", 32, 80, 80, 128, 128, 3, 1)
    conv_case("P4   3x3 s2 256->512 80px", 32, 80, 80, 256, 512, 3, 2)
    conv_case("C3   3x3 s1 256ch 40px", 32, 40, 40, 256, 256, 3, 1)
    conv_case("P5   3x3 s2 512->1024 40px", 32, 40, 40, 512, 1024, 3, 2)
    conv_case("neck 1x1 s1 512->256 40px", 32, 40, 40, 512, 256, 1, 1)

    # non-conv suspects
    x = jnp.asarray(rng.normal(size=(32, 160, 160, 128)).astype(np.float32),
                    dtype=jnp.bfloat16)

    def silu(xx):
        return xx * jax.nn.sigmoid(xx)

    print("SiLU 160px 128ch:")
    tf_ = scan_time(silu, x, "fwd")
    scan_time(lambda xx: jax.grad(
        lambda a: jnp.sum(silu(a).astype(jnp.float32)))(xx), x, "dX")

    from dmayolo_tpu.nn.primitives import max_pool

    def mp5(xx):
        return max_pool(xx, 5, 1)

    xs = jnp.asarray(rng.normal(size=(32, 20, 20, 512)).astype(np.float32),
                     dtype=jnp.bfloat16)
    print("maxpool k5 20px 512ch (SPPFCSPC):")
    tf_ = scan_time(mp5, xs, "fwd")
    scan_time(lambda xx: jax.grad(
        lambda a: jnp.sum(mp5(a).astype(jnp.float32)))(xx), xs, "dX")

    xb = jnp.asarray(rng.normal(size=(32, 160, 160, 128)).astype(np.float32))
    def bn(xx):
        m = jnp.mean(xx, axis=(0, 1, 2))
        v = jnp.var(xx, axis=(0, 1, 2))
        return (xx - m) * jax.lax.rsqrt(v + 1e-3)

    print("BN train-mode 160px 128ch (f32):")
    tf_ = scan_time(bn, xb, "fwd")
    scan_time(lambda xx: jax.grad(lambda a: jnp.sum(bn(a)))(xx), xb, "dX")


if __name__ == "__main__":
    main()
