"""Can optimization_barrier split the slow conv-transpose+BN-grad fusions?

ROUND2_NOTES session-6: the flagship 640px train step (190 ms) spends
101 ms in backward convs, and the slow class is multi-output kOutput
fusions where XLA fuses a dX conv-transpose with the preceding BN's
gradient channel-reduces (`EmitOutputBatchInSublanes`) — 3-6 ms each
where the ISOLATED dX conv runs at 1.1x its forward.  The r2
countermeasures (remat, batch shape, matmul-form reduces) all attacked
the ops, not the fusion decision itself.  Untried lever: a backward-side
`lax.optimization_barrier` between BN and conv — forward is identity,
but the cotangent entering the conv-transpose becomes a fusion boundary,
so the BN-grad reduces can no longer be folded into the transpose loop.

Two measurements, timed with the in-program scan method (the only one
that holds over the axon tunnel — see bench.py timed()):

1. microbench: a 3-deep chain of (conv3x3 64ch -> train-mode BN -> SiLU)
   at (32,160,160,64) — the P2 shape class the trace blames — fwd and
   value_and_grad, with barriers off/on.
2. the REAL flagship train step (make_train_step, bs32/640px bf16),
   with ConvBN monkeypatched to insert the barrier.

    python experiments/exp_bwd_barrier.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30
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


def scan_time(fn, x, label, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xx):
        def body(c, _):
            out = fn(xx + c)
            return (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(xx.dtype), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), xx.dtype), None, length=iters)
        return c

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = ((time.perf_counter() - t0) * 1000 - _OVERHEAD_MS[0]) / iters
    print(f"  {label:34s} {dt:8.3f} ms", flush=True)
    return dt


def make_grad_barrier():
    import jax

    @jax.custom_vjp
    def grad_barrier(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        return (jax.lax.optimization_barrier(g),)

    grad_barrier.defvjp(fwd, bwd)
    return grad_barrier


def microbench():
    import jax
    import jax.numpy as jnp

    gb = make_grad_barrier()
    rng = np.random.default_rng(0)
    B, H, W, C = 32, 160, 160, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                    dtype=jnp.bfloat16)
    ws = [jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05,
                      dtype=jnp.bfloat16) for _ in range(3)]
    scales = [jnp.ones((C,), jnp.float32) for _ in range(3)]

    def block(xx, w, s, barrier):
        y = jax.lax.conv_general_dilated(
            xx, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if barrier:
            y = gb(y)
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, axis=(0, 1, 2))
        v = jnp.maximum(jnp.mean(jnp.square(yf), (0, 1, 2)) - jnp.square(m), 0.0)
        yn = ((yf - m) * jax.lax.rsqrt(v + 1e-3) * s).astype(xx.dtype)
        return yn * jax.nn.sigmoid(yn)

    def chain(xx, barrier):
        for w, s in zip(ws, scales):
            xx = block(xx, w, s, barrier)
        return xx

    def vag(barrier):
        def f(xx):
            def loss(args):
                wl, sl = args
                y = xx
                for w, s in zip(wl, sl):
                    y = block(y, w, s, barrier)
                return jnp.sum(y.astype(jnp.float32))
            g = jax.grad(loss)((ws, scales))
            return g[0][0]
        return f

    print(f"microbench chain of 3x (conv3x3 {C}ch + BN + SiLU) @ {B}x{H}x{W}:")
    scan_time(lambda xx: chain(xx, False), x, "fwd (no barrier)")
    scan_time(lambda xx: chain(xx, True), x, "fwd (barrier)")
    t0 = scan_time(vag(False), x, "grad wrt params (no barrier)")
    t1 = scan_time(vag(True), x, "grad wrt params (barrier)")
    return t0, t1


def trainstep(barrier):
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn import blocks
    from dmayolo_tpu.train.loss import ComputeLoss, Targets
    from dmayolo_tpu.train.optim import Schedule, param_groups
    from dmayolo_tpu.train.step import init_train_state, make_train_step

    enable_compilation_cache(
        f"~/.cache/dmayolo_expbarrier_{int(bool(barrier))}")

    if barrier:
        gb = make_grad_barrier()
        orig = blocks.ConvBN.__call__

        def patched(self, v, xx):
            y = self.conv(v, xx)
            if not v.ctx.fused:
                y = gb(y)
                y = self.bn(v, y)
            return self.act(y)

        blocks.ConvBN.__call__ = patched

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = DetectionModel(
        os.path.join(repo, "dmayolo_tpu/configs/models/"
                           "ablation-ca-scconv-sppfcspc.yaml"), nc=10)
    rng = np.random.default_rng(0)
    hyp = {"box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
           "anchor_t": 4.0, "label_smoothing": 0.0, "fl_gamma": 0.0,
           "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
           "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1}
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    loss = ComputeLoss(model.head.anchors, hyp, nc=10)
    sched = Schedule(hyp, epochs=100, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, loss, sched, param_groups(model),
                                   weight_decay=5e-4, dtype=jnp.bfloat16))
    bs = 32
    state = init_train_state(params, stats)
    tgt = Targets(
        jnp.asarray(rng.integers(0, 10, (bs, 8)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.2, 0.8, (bs, 8, 4)).astype(np.float32)),
        jnp.asarray(np.ones((bs, 8), bool)),
    )
    x = jnp.asarray(rng.uniform(0, 1, (bs, 640, 640, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    state, met = step(state, x, tgt, key)
    jax.block_until_ready(met["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, met = step(state, x, tgt, key)
    jax.block_until_ready(met["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"barrier": bool(barrier),
                      "step_ms": round(dt * 1000, 1),
                      "img_s": round(bs / dt, 1),
                      "loss": float(met["loss"])}), flush=True)


def main():
    if "--child" in sys.argv:
        trainstep(barrier="barrier" in sys.argv)
        return
    calibrate()
    t0, t1 = microbench()
    print(f"\nmicro grad speedup: {t0 / t1:.3f}x", flush=True)
    # full train step in subprocesses (fresh compile cache each)
    import subprocess
    for args in (["--child"], ["--child", "barrier"]):
        r = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                           timeout=3600)
        if r.returncode != 0:
            print(f"child {args} failed rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
