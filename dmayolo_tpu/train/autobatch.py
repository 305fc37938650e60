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
    """Pick the largest batch whose MEASURED memory fits fraction*budget.

    Probes a doubling ladder of batch sizes and reads XLA's memory analysis
    at each — no extrapolation.  Measured v5e behavior that rules out a
    small-probe linear fit (exp_autobatch_calib.py):

    - the analysis is nearly exact at the OOM boundary (flagship 640px:
      bs32 = 13.6G runs, bs48 = 15.6G OOMs on a 16G chip), but the
      per-image slope at bs 1-4 is ~2.5x the slope near the boundary, so a
      (1,2,4) fit lands at bs 13 where bs 32 actually fits;
    - memory is NOT monotonic in batch (1536px: bs8 schedules to 14.25G,
      bs4 to 15.25G) — so the ladder keeps probing past a just-over-limit
      measurement (up to 1.25x the limit) before concluding;
    - compilation itself can fail for oversized programs (remote compile
      500 at 1536px bs12) — a compile failure above a working size means
      "doesn't fit", not "analysis unavailable".

    Args:
        lower_for_batch: bs -> `jax.jit(step).lower(...)` at that batch size.
        fraction: memory fill target (reference default 0.9).
        batch_sizes: initial probe sizes; the ladder continues doubling
            from the largest.
        hbm_bytes: override the measured budget (useful off-device).
        default: returned when no budget or no analysis is available
            (reference returns its default on CPU, autobatch.py:33-35).
        multiple_of: probe only multiples of this (device count on a mesh) —
            every candidate the search returns was actually measured.
    """
    mult = max(int(multiple_of), 1)
    budget = hbm_bytes if hbm_bytes is not None else device_memory_budget()
    if budget is None:
        d = max(default - default % mult, mult) if mult > 1 else default
        print(f"autobatch: no device memory budget (CPU?) — using default "
              f"batch-size {d}")
        return d

    limit = budget * fraction
    gib = 1024**3
    measured = {}

    def probe(bs):
        """-> ('ok', bytes) | ('fail', None) | ('noinfo', None), memoised."""
        if bs in measured:
            return measured[bs]
        try:
            m = step_memory_bytes(lower_for_batch(bs))
        except Exception as e:  # lowering/compile refused the program
            print(f"autobatch: bs={bs} failed to compile ({type(e).__name__})")
            measured[bs] = ("fail", None)
            return measured[bs]
        if m is None:
            measured[bs] = ("noinfo", None)
            return measured[bs]
        fits = "fits" if m <= limit else "over"
        print(f"autobatch: bs={bs} -> {m/gib:.2f}G ({fits} {limit/gib:.2f}G "
              f"= {fraction*100:.0f}% of {budget/gib:.2f}G)")
        measured[bs] = ("ok", m)
        return measured[bs]

    # doubling ladder of valid (multiple-of-m) sizes: every rung the search
    # can return has been measured
    ladder = [b * mult for b in batch_sizes if b * mult <= max_batch] or [mult]
    while ladder[-1] * 2 <= max_batch:
        ladder.append(ladder[-1] * 2)

    best = None          # largest bs measured under the limit
    any_ok = False
    stopped_early = False
    for bs in ladder:
        status, m = probe(bs)
        if status == "noinfo":
            print(f"autobatch: XLA memory analysis unavailable — using "
                  f"default batch-size {default}")
            return default
        if status == "fail":
            if not any_ok:
                # can't even compile the smallest probe — something else is
                # wrong; don't guess
                d = max(default - default % mult, mult) if mult > 1 else default
                print(f"autobatch: smallest probe failed — using default "
                      f"batch-size {d}")
                return d
            stopped_early = True
            break
        any_ok = True
        if m <= limit:
            best = bs
        elif m > limit * 1.25:
            # clearly over (not schedule noise) — stop the ladder
            stopped_early = True
            break

    if best is None:
        # nothing under the fraction*budget limit. If the smallest valid
        # size still fits the PHYSICAL budget, run it (with a warning);
        # if it exceeds the device entirely, refuse — returning it would
        # OOM the exact program we just measured.
        b = next(bs for bs in ladder if measured.get(bs, ("", 0))[0] == "ok")
        mem = measured[b][1]
        if mem > budget:
            raise RuntimeError(
                f"autobatch: smallest valid batch-size {b} needs "
                f"{mem/gib:.2f}G but the device budget is {budget/gib:.2f}G "
                f"— reduce --imgsz, enable --remat, or use fewer devices "
                f"(multiple_of={mult})")
        print(f"autobatch: no probe under the {fraction*100:.0f}% limit — "
              f"using smallest compiling batch-size {b} "
              f"({mem/gib:.2f}G of {budget/gib:.2f}G, tight)")
        return b

    # one midpoint refinement between the best fit and the next rung
    if stopped_early or measured.get(best * 2, ("", 0))[0] in ("fail", "ok"):
        cand = (best + best // 2) - (best // 2) % mult
        if cand > best and cand <= max_batch and cand not in measured:
            status, mm = probe(cand)
            if status == "ok" and mm <= limit:
                best = cand

    mem = measured[best][1]
    print(f"autobatch: batch-size {best} ({mem/gib:.2f}G measured, "
          f"{fraction*100:.0f}% target of {budget/gib:.2f}G)")
    return best


def find_train_batch_size(model, loss_fn, hyp: dict, img_size: int = 640,
                          dtype=None, fraction: float = 0.9,
                          hbm_bytes: Optional[int] = None,
                          default: int = 16,
                          max_targets: int = 64,
                          multiple_of: int = 1,
                          max_batch: int = 1024,
                          remat: bool = False,
                          device_aug: Optional[dict] = None,
                          accumulate: Optional[int] = None,
                          nbs: int = 64) -> int:
    """Autobatch over the full training step (fwd+loss+grad+opt+EMA) of
    `model` at `img_size` — the reference's check_train_batch_size analog.

    Probes the program the Trainer will actually jit for each candidate
    bs: same accumulate cadence (round(nbs/bs) unless given) so the
    argument batch is accumulate*bs, and uint8 image inputs when
    device_aug is on — a probe of a different program would mis-size
    decisions made within ~150 MB of the limit (1536px calibration)."""
    import jax.numpy as jnp

    from .optim import Schedule, param_groups
    from .step import init_train_state, make_train_step
    from .loss import Targets

    dtype = dtype or jnp.bfloat16
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    state = init_train_state(params, stats)
    state_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), state
    )
    img_dtype = jnp.uint8 if device_aug is not None else jnp.float32
    labels = param_groups(model)

    def lower_for_batch(bs: int):
        acc = accumulate if accumulate else max(round(nbs / bs), 1)
        sched = Schedule(hyp, epochs=100, steps_per_epoch=100,
                         batch_size=bs, step_scale=acc)
        step = make_train_step(model, loss_fn, sched, labels,
                               weight_decay=hyp.get("weight_decay", 5e-4),
                               dtype=dtype, accumulate=acc,
                               device_aug=device_aug, remat=remat)
        n = acc * bs
        imgs = jax.ShapeDtypeStruct((n, img_size, img_size, 3), img_dtype)
        tgt = Targets(
            jax.ShapeDtypeStruct((n, max_targets), jnp.float32),
            jax.ShapeDtypeStruct((n, max_targets, 4), jnp.float32),
            jax.ShapeDtypeStruct((n, max_targets), jnp.bool_),
        )
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        return jax.jit(step).lower(state_shapes, imgs, tgt, key)

    return autobatch(lower_for_batch, fraction=fraction, hbm_bytes=hbm_bytes,
                     default=default, multiple_of=multiple_of,
                     max_batch=max_batch)
