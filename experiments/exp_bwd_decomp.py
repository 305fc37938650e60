"""Backward-pass decomposition of the flagship train step (one TPU chip).

Question: value_and_grad measures ~2.4x the forward (session-2 decomp:
fwd-train 29.3 ms, value_and_grad 98.4 ms at bs16) where conv math says
~2x (dX + dW each cost roughly one forward's conv FLOPs). Localise the
extra: time (a) fwd+loss, (b) grad w.r.t. INPUT only (the dX chain, no
dW convs), (c) value_and_grad w.r.t. params (dX + dW), bf16, bs32/640px.

If (b) - (a) ~ (a) but (c) - (b) >> (a), the dW (filter-gradient) convs
are the inefficient half; if (b) is already > 2x (a), the dX chain
(transposed convs at stride 2) is.

Run on an idle host (the tunnel inflates timings under CPU load):
    python experiments/exp_bwd_decomp.py [bs] [imgsz]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


HYP = {
    "box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "label_smoothing": 0.0, "fl_gamma": 0.0,
}


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.train.loss import ComputeLoss, Targets

    enable_compilation_cache("~/.cache/dmayolo_jax_expbwd")

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "dmayolo_tpu", "configs", "models",
                       "ablation-ca-scconv-sppfcspc.yaml")
    model = DetectionModel(cfg, nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    loss_fn = ComputeLoss(model.head.anchors, HYP, nc=10)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (bs, size, size, 3)).astype(np.float32))
    m = 8
    tgt = Targets(
        jnp.asarray(rng.integers(0, 10, (bs, m)).astype(np.float32)),
        jnp.asarray(np.stack([
            rng.uniform(0.3, 0.7, (bs, m)), rng.uniform(0.3, 0.7, (bs, m)),
            rng.uniform(0.1, 0.25, (bs, m)), rng.uniform(0.1, 0.25, (bs, m)),
        ], axis=-1).astype(np.float32)),
        jnp.asarray(np.arange(m)[None, :] < 4).repeat(bs, 0),
    )

    def loss_of(p, xx):
        raw, _ = model.apply(p, stats, xx.astype(jnp.bfloat16), train=True,
                             rng=jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        total, items = loss_fn(raw, tgt)
        return total

    f_val = jax.jit(loss_of)
    f_dx = jax.jit(jax.grad(loss_of, argnums=1))
    f_dw = jax.jit(jax.value_and_grad(loss_of, argnums=0))

    t_val = timeit(f_val, params, x)
    t_dx = timeit(f_dx, params, x)
    t_dw = timeit(f_dw, params, x)
    print(f"bs{bs}/{size}px bf16 flagship ({1000*bs/t_dw:.1f} img/s at value_and_grad):")
    print(f"  fwd+loss                 {t_val:7.2f} ms")
    print(f"  grad wrt input (dX only) {t_dx:7.2f} ms  ({t_dx/t_val:.2f}x fwd)")
    print(f"  value_and_grad (dX+dW)   {t_dw:7.2f} ms  ({t_dw/t_val:.2f}x fwd)")
    print(f"  implied dW-extra         {t_dw - t_dx:7.2f} ms")


if __name__ == "__main__":
    main()
