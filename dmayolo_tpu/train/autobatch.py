"""Automatic batch-size selection from device memory.

Reference surface: utils/autobatch.py:22-56 (`--batch-size -1`): profile a
few batch sizes, first-degree polyfit of memory vs batch, solve for the
batch that fills `fraction` of free memory.

TPU-native redesign: instead of running the model and reading allocator
counters, we AOT-lower the REAL jitted train step at a few batch sizes and
read XLA's static memory analysis (temp + argument + output buffers). This
is exact for XLA's execution model (all live buffers are known at compile
time — there is no allocator nondeterminism to sample), and it never OOMs
while probing. The HBM budget comes from `device.memory_stats()`.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax

V5E_HBM_BYTES = 16 * 1024**3  # v5e default when memory_stats is unavailable


def device_memory_budget(device=None) -> Optional[int]:
    """Usable accelerator memory in bytes, or None on hosts without a
    reportable budget (CPU)."""
    device = device or jax.devices()[0]
    if device.platform == "cpu":
        return None
    try:
        ms = device.memory_stats() or {}
        limit = ms.get("bytes_limit")
        if limit:
            return int(limit - ms.get("bytes_in_use", 0))
    except Exception:
        pass
    return V5E_HBM_BYTES


def step_memory_bytes(lowered) -> Optional[int]:
    """Total live bytes of a lowered+compiled step, from XLA's own analysis."""
    try:
        ma = lowered.compile().memory_analysis()
        if ma is None:
            return None
        return int(
            getattr(ma, "temp_size_in_bytes", 0)
            + getattr(ma, "argument_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
            - getattr(ma, "alias_size_in_bytes", 0)
        )
    except Exception:
        return None


def autobatch(lower_for_batch: Callable[[int], object],
              fraction: float = 0.9,
              batch_sizes: Sequence[int] = (1, 2, 4),
              hbm_bytes: Optional[int] = None,
              default: int = 16,
              max_batch: int = 1024,
              multiple_of: int = 1) -> int:
    """Pick the largest batch whose predicted memory fits fraction*budget.

    Args:
        lower_for_batch: bs -> `jax.jit(step).lower(...)` at that batch size.
        fraction: memory fill target (reference default 0.9).
        hbm_bytes: override the measured budget (useful off-device).
        default: returned when no budget or no analysis is available
                 (reference returns its default on CPU, autobatch.py:33-35).
        multiple_of: round down to this multiple (device count on a mesh).
    """
    budget = hbm_bytes if hbm_bytes is not None else device_memory_budget()
    if budget is None:
        print(f"autobatch: no device memory budget (CPU?) — using default "
              f"batch-size {default}")
        return default

    xs, ys = [], []
    for bs in batch_sizes:
        m = step_memory_bytes(lower_for_batch(bs))
        if m is None:
            print(f"autobatch: XLA memory analysis unavailable — using "
                  f"default batch-size {default}")
            return default
        xs.append(bs)
        ys.append(m)
    # memory = intercept (params/opt/ema, bs-independent) + slope * bs
    slope, intercept = np.polyfit(xs, ys, deg=1)
    if slope <= 0:  # degenerate fit (tiny model): any batch fits
        b = max_batch
    else:
        b = int((budget * fraction - intercept) / slope)
    b = max(multiple_of, min(b - b % multiple_of, max_batch))
    gib = 1024**3
    print(f"autobatch: {budget/gib:.2f}G budget, fit {intercept/gib:.2f}G + "
          f"{slope/gib:.3f}G/img -> batch-size {b} "
          f"({(intercept + slope*b)/gib:.2f}G predicted, {fraction*100:.0f}% target)")
    return b


def find_train_batch_size(model, loss_fn, hyp: dict, img_size: int = 640,
                          dtype=None, fraction: float = 0.9,
                          hbm_bytes: Optional[int] = None,
                          default: int = 16,
                          max_targets: int = 64,
                          multiple_of: int = 1,
                          remat: bool = False) -> int:
    """Autobatch over the full training step (fwd+loss+grad+opt+EMA) of
    `model` at `img_size` — the reference's check_train_batch_size analog."""
    import jax.numpy as jnp

    from .optim import Schedule, param_groups
    from .step import init_train_state, make_train_step
    from .loss import Targets

    dtype = dtype or jnp.bfloat16
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    sched = Schedule(hyp, epochs=100, steps_per_epoch=100)
    step = make_train_step(model, loss_fn, sched, param_groups(model),
                           weight_decay=hyp.get("weight_decay", 5e-4),
                           dtype=dtype, remat=remat)
    state = init_train_state(params, stats)
    state_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), state
    )
    jstep = jax.jit(step)

    def lower_for_batch(bs: int):
        imgs = jax.ShapeDtypeStruct((bs, img_size, img_size, 3), jnp.float32)
        tgt = Targets(
            jax.ShapeDtypeStruct((bs, max_targets), jnp.float32),
            jax.ShapeDtypeStruct((bs, max_targets, 4), jnp.float32),
            jax.ShapeDtypeStruct((bs, max_targets), jnp.bool_),
        )
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        return jstep.lower(state_shapes, imgs, tgt, key)

    return autobatch(lower_for_batch, fraction=fraction, hbm_bytes=hbm_bytes,
                     default=default, multiple_of=multiple_of)
