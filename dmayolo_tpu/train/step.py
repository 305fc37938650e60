"""The jitted train step: forward + loss + grads + optimizer + EMA.

One XLA program replaces the reference's hot loop body
(train.py:400-463): amp forward, loss, backward with DDP all-reduce,
optimizer step with warmup interpolation, EMA update.  Under a mesh the
batch dim is sharded on 'data' and XLA emits the gradient psums over ICI —
no rank logic anywhere.

Gradient accumulation (reference `accumulate = nbs/bs`, train.py:189,
448-454) is a lax.scan over microbatches summing gradients.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..nn.module import FlatDict
from .loss import Targets
from .optim import (
    OptState,
    Schedule,
    adam_step,
    ema_decay,
    ema_update,
    init_opt_state,
    sgd_step,
)


class TrainState(NamedTuple):
    params: FlatDict
    stats: FlatDict
    opt: OptState
    ema_params: FlatDict
    ema_stats: FlatDict
    ema_updates: jax.Array


def init_train_state(params: FlatDict, stats: FlatDict) -> TrainState:
    return TrainState(
        params=params,
        stats=stats,
        opt=init_opt_state(params),
        ema_params={k: v for k, v in params.items()},
        ema_stats={k: v for k, v in stats.items()},
        ema_updates=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model,
    loss_fn: Callable,
    sched: Schedule,
    labels: Dict,
    weight_decay: float,
    adam: bool = False,
    dtype=jnp.bfloat16,
    accumulate: int = 1,
    device_aug: Optional[Dict] = None,
    freeze: int = 0,
    remat: bool = False,
):
    """Build the jittable step.

    Args:
        model: DetectionModel.
        loss_fn: (raw_preds, Targets) -> (total, items).
        sched: per-iteration Schedule.
        labels: param-group labels from param_groups().
        weight_decay: already scaled by bs*accumulate/nbs (ref train.py:191).
        accumulate: microbatches per optimizer step; the incoming batch's
            leading dim must be accumulate*micro_bs.
        device_aug: None, or {'hgain','sgain','vgain','fliplr'} — fuse HSV
            jitter + lr-flip (+target mirror) INTO the train step: the host
            ships raw uint8 and the VPU does the color math, fused with the
            /255 normalise (data/device_aug.py). The host pipeline must then
            run with hsv/fliplr zeroed to avoid double augmentation.

    Step signature: (state, images f32/uint8 NHWC, Targets, rng) ->
        (state, metrics dict).
    """
    opt_update = adam_step if adam else sgd_step

    def grad_one(params, stats, imgs, targets, rng):
        if device_aug is not None:
            from ..data.device_aug import augment_batch, flip_targets_lr

            rng, r_aug = jax.random.split(rng)

        def lossfn(p):
            if device_aug is not None:
                x, flipped = augment_batch(
                    imgs, r_aug,
                    hgain=device_aug.get("hgain", 0.015),
                    sgain=device_aug.get("sgain", 0.7),
                    vgain=device_aug.get("vgain", 0.4),
                    fliplr_p=device_aug.get("fliplr", 0.5),
                    dtype=dtype,
                )
                tgt = Targets(targets.cls,
                              flip_targets_lr(targets.box, flipped),
                              targets.mask)
            else:
                x = imgs.astype(dtype) / 255.0 if imgs.dtype == jnp.uint8 else imgs.astype(dtype)
                tgt = targets
            raw, new_stats = model.apply(p, stats, x, train=True, rng=rng,
                                         dtype=dtype, remat=remat)
            total, items = loss_fn(raw, tgt)
            return total, (items, new_stats)

        (total, (items, new_stats)), grads = jax.value_and_grad(lossfn, has_aux=True)(params)
        return total, items, new_stats, grads

    def step(state: TrainState, imgs, targets: Targets, rng, ni=None) -> tuple:
        if accumulate == 1:
            total, items, new_stats, grads = grad_one(
                state.params, state.stats, imgs, targets, rng
            )
        else:
            mb = imgs.shape[0] // accumulate

            def body(carry, inp):
                stats_c, grads_c, tot_c = carry
                im, tg_cls, tg_box, tg_mask, r = inp
                t = Targets(tg_cls, tg_box, tg_mask)
                tot, items_i, st, g = grad_one(state.params, stats_c, im, t, r)
                grads_c = {k: grads_c[k] + g[k] for k in grads_c}
                return (st, grads_c, tot_c + tot), items_i

            im_s = imgs.reshape((accumulate, mb) + imgs.shape[1:])
            tg_c = targets.cls.reshape((accumulate, mb) + targets.cls.shape[1:])
            tg_b = targets.box.reshape((accumulate, mb) + targets.box.shape[1:])
            tg_m = targets.mask.reshape((accumulate, mb) + targets.mask.shape[1:])
            rngs = jax.random.split(rng, accumulate)
            zero_grads = {k: jnp.zeros_like(v) for k, v in state.params.items()}
            (new_stats, grads, total), items_seq = jax.lax.scan(
                body, (state.stats, zero_grads, 0.0), (im_s, tg_c, tg_b, tg_m, rngs)
            )
            # mean over microbatches so box/obj/cls stay consistent with the
            # group-mean `loss` below (last-microbatch-only items were 4x
            # noisier than the loss curve at accumulate=4)
            items = {k: jnp.mean(items_seq[k], axis=0) for k in items_seq}

        new_params, new_opt = opt_update(
            state.params, grads, state.opt, sched, labels, weight_decay,
            ni=ni,
        )
        if freeze:
            # frozen layers (ref train.py:205-212 --freeze N: model.0..N-1)
            # stay EXACTLY as loaded — no grad, no decay, no momentum drift
            def _is_frozen(k):
                return k[0] == "model" and k[1].isdigit() and int(k[1]) < freeze

            new_params = {
                k: (state.params[k] if _is_frozen(k) else v)
                for k, v in new_params.items()
            }
            new_opt = new_opt._replace(
                mom={k: (state.opt.mom[k] if _is_frozen(k) else v)
                     for k, v in new_opt.mom.items()},
                vel={k: (state.opt.vel[k] if _is_frozen(k) else v)
                     for k, v in new_opt.vel.items()},
            )

        updates = state.ema_updates + 1
        d = ema_decay(updates)
        new_state = TrainState(
            params=new_params,
            stats=new_stats,
            opt=new_opt,
            ema_params=ema_update(state.ema_params, new_params, d),
            ema_stats=ema_update(state.ema_stats, new_stats, d),
            ema_updates=updates,
        )
        # grads are the SUM over microbatches (reference backward semantics);
        # report the per-batch mean so logs are cadence-independent
        metrics = {"loss": total / accumulate, **{k: v for k, v in items.items()}}
        return new_state, metrics

    return step


def jit_train_step(step, mesh=None, spatial: bool = False, donate: bool = False,
                   with_ni: bool = False):
    """jit with mesh shardings: state replicated, batch data-sharded.

    `donate=True` aliases the state buffers (halves HBM churn on TPU) but
    must stay off on the virtual-CPU test backend: XLA CPU deadlocks when
    donated buffers feed collectives (rendezvous misses 1 of N threads).

    `with_ni=True` declares the optional 5th `ni` argument (replicated
    scalar batch counter for the warmup accumulate ramp).
    """
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P("data", "spatial") if spatial else P("data"))
    data_s = NamedSharding(mesh, P("data"))
    shardings = [None, img_s, Targets(data_s, data_s, data_s), repl]
    if with_ni:
        shardings.append(repl)
    # state/rng replicated (None = follow input placement), batch data-sharded
    return jax.jit(
        step,
        in_shardings=tuple(shardings),
        out_shardings=(None, None),
        donate_argnums=(0,) if donate else (),
    )
