"""Model info: parameter counts, per-layer summary, FLOPs via XLA cost
analysis, per-layer timing profile.

ref: utils/torch_utils.py model_info (thop-FLOPs) and
models/yolo.py:278-291 (_profile_one_layer).  On XLA the FLOP count comes
from compiled-program cost analysis instead of thop.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def param_count(params) -> int:
    return sum(int(p.size) for p in params.values())


def flops(model, params, stats, img_size: int = 640, batch: int = 1) -> Optional[float]:
    """Total forward FLOPs from XLA cost analysis (GFLOPs)."""
    x = jnp.zeros((batch, img_size, img_size, 3), jnp.float32)

    def fwd(p, s, xx):
        return model.apply(p, s, xx)

    try:
        lowered = jax.jit(fwd).lower(params, stats, x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / 1e9
    except Exception:
        return None


def model_info(model, params, stats, img_size: int = 640, verbose: bool = False) -> str:
    n_p = param_count(params)
    g = flops(model, params, stats, img_size)
    lines = []
    if verbose:
        for spec in model.specs:
            lines.append(repr(spec))
    gstr = f", {g:.1f} GFLOPs @ {img_size}px" if g else ""
    lines.append(f"{len(model.layers)} layers, {n_p:,} parameters{gstr}")
    out = "\n".join(lines)
    print(out)
    return out


def profile_layers(model, params, stats, img_size: int = 256, iters: int = 10,
                   batch: int = 1, dtype=None, fused: bool = False):
    """Per-layer wall-time profile: runs the graph once per prefix and
    differences the timings (jit-per-prefix; coarse but backend-true).

    batch/dtype/fused let the profile match serving conditions (e.g.
    batch=128, dtype=bfloat16, fused=True with fuse_params weights)."""
    dtype = dtype or jnp.float32
    x = jnp.zeros((batch, img_size, img_size, 3), dtype)
    results = []
    from ..nn.module import make_vars

    def run_to(k):
        def f(p, s, xx):
            v = make_vars(p, s, fused=fused, dtype=dtype)
            y = {}
            out = xx
            for mod in model.layers[: k + 1]:
                fsrc = mod.f
                if fsrc != -1:
                    out = (
                        y[fsrc % mod.i]
                        if isinstance(fsrc, int)
                        else [out if j == -1 else y[j % mod.i] for j in fsrc]
                    )
                out = mod(v, out)
                if mod.i in model.save:
                    y[mod.i] = out
            return jax.tree_util.tree_leaves(out)[0].sum()

        return jax.jit(f)

    prev = 0.0
    for k, spec in enumerate(model.specs):
        fn = run_to(k)
        fn(params, stats, x).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(params, stats, x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters * 1000
        results.append((spec.i, spec.name, max(dt - prev, 0.0), dt))
        prev = dt
    print(f"{'idx':>4} {'module':<18} {'delta_ms':>9} {'cum_ms':>8}")
    for i, name, delta, cum in results:
        print(f"{i:>4} {name:<18} {delta:>9.2f} {cum:>8.2f}")
    return results


class Profile:
    """Context-manager stage timer with device sync.
    ref: utils/general.py:55-66 (Profile) + torch_utils.py:86-90 (time_sync)."""

    def __init__(self):
        self.t = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import jax

        # block on any outstanding device work so the interval is honest
        try:
            jax.block_until_ready(jax.device_put(0))
        except Exception:
            pass
        self.dt = time.perf_counter() - self.start
        self.t += self.dt


class Timeout:
    """Deadline guard for host-side sections (SIGALRM, unix only).
    ref: utils/general.py:69-82."""

    def __init__(self, seconds: float, timeout_msg: str = "", suppress: bool = True):
        self.seconds = seconds
        self.msg = timeout_msg
        self.suppress = suppress

    def _handler(self, signum, frame):
        raise TimeoutError(self.msg)

    def __enter__(self):
        import signal

        signal.signal(signal.SIGALRM, self._handler)
        signal.setitimer(signal.ITIMER_REAL, self.seconds)
        return self

    def __exit__(self, exc_type, exc, tb):
        import signal

        signal.setitimer(signal.ITIMER_REAL, 0)
        return self.suppress and exc_type is TimeoutError
