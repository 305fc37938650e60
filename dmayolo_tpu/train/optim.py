"""Optimizer policy, LR schedules, EMA — matching reference semantics.

ref: train.py:185-235 (3 param groups, SGD/Adam, one_cycle/linear LambdaLR),
train.py:405-425 (per-iteration warmup of lr+momentum with a separate bias
warmup lr), utils/torch_utils.py:309-343 (ModelEMA with ramped decay).

The torch param grouping (train.py:198-212) collects only `.weight`/`.bias`
attributes plus the BiFPN `.w` of AdConcat2/3 and Adapt_Add2/3.  Any other
Parameter — Swin relative-position tables, MHA in_proj, HorNet gammas,
Sum.w — is silently never optimized by the reference.  `param_groups`
reproduces that faithfully ("frozen" label); pass
`train_ungrouped=True` to train them instead (recommended for best mAP,
off for strict parity).

Implemented as explicit update rules (torch-SGD/Adam semantics: L2 decay
added to the gradient, nesterov momentum) rather than optax chains so that
the reference's dynamic per-group warmup lr/momentum stay traceable.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.blocks import AdConcat2, AdaptAdd2, AdaptAdd3, ConvBN
from ..nn.module import FlatDict, Module
from ..nn.primitives import BatchNorm2d, LayerNorm


def param_groups(model: Module, train_ungrouped: bool = False) -> Dict:
    """Label every param path g0 (BN scale, no decay) / g1 (weights, decay)
    / g2 (biases, no decay) / frozen.  ref: train.py:198-212."""
    bn_paths = set()
    bifpn_w_paths = set()
    for m in model.iter_modules():
        if isinstance(m, BatchNorm2d):
            bn_paths.add(m.path)
        if isinstance(m, (AdConcat2, AdaptAdd2, AdaptAdd3)):  # AdConcat3 subclasses AdConcat2
            bifpn_w_paths.add(m.path + ("w",))

    import jax.random as jr

    params, _ = model.init(jr.PRNGKey(0))
    labels = {}
    for path in params:
        leaf = path[-1]
        parent = path[:-1]
        if leaf == "bias":
            labels[path] = "g2"
        elif leaf == "scale" and parent in bn_paths:
            labels[path] = "g0"
        elif leaf in ("scale", "kernel"):
            labels[path] = "g1"
        elif path in bifpn_w_paths:
            labels[path] = "g1"
        else:
            labels[path] = "g1" if train_ungrouped else "frozen"
    return labels


def one_cycle(y1: float, y2: float, steps: int):
    """Cosine 1 -> lrf.  ref: utils/general.py:460-463."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def linear_lr(lrf: float, epochs: int):
    """ref: train.py:232."""
    return lambda x: (1 - x / (epochs - 1)) * (1.0 - lrf) + lrf


class Schedule:
    """Per-iteration lr/momentum schedule with warmup, as a pure function of
    the global step (so it jits).  ref: train.py:405-422."""

    def __init__(self, hyp: Dict, epochs: int, steps_per_epoch: int,
                 adam: bool = False, linear: bool = False, nbs: int = 64,
                 batch_size: int = 16, warmup_min_iters: int = 1000,
                 step_scale: int = 1):
        self.lr0 = 3e-4 if adam else hyp["lr0"]
        self.lrf = hyp["lrf"]
        self.momentum = hyp["momentum"]
        self.warmup_momentum = hyp.get("warmup_momentum", 0.8)
        self.warmup_bias_lr = hyp.get("warmup_bias_lr", 0.1)
        self.epochs = epochs
        self.spe = max(steps_per_epoch, 1)
        # reference floors warmup at 1000 iters (train.py:407); configurable
        # so short smoke runs are not stuck at near-zero lr
        self.nw = max(round(hyp.get("warmup_epochs", 3.0) * self.spe), warmup_min_iters)
        self.linear = linear
        self.accumulate = max(round(nbs / batch_size), 1)
        # with gradient accumulation the optimizer steps once per
        # `accumulate` loader batches; the reference's warmup/epoch curves
        # are functions of the BATCH index ni (train.py:405), so scale the
        # opt-step counter back into batch units
        self.step_scale = float(step_scale)

    def _lf(self, epoch):
        """Epoch multiplier (traced-compatible)."""
        if self.linear:
            return (1 - epoch / (self.epochs - 1)) * (1.0 - self.lrf) + self.lrf
        return ((1 - jnp.cos(epoch * jnp.pi / self.epochs)) / 2) * (self.lrf - 1) + 1

    def __call__(self, step, batch_units=False):
        """Returns dict of per-group lr (g0/g1/g2) and momentum at `step`.

        `step` is the optimizer-step counter (scaled back to batch units
        by step_scale), or — with batch_units=True — the batch counter ni
        itself (the reference's warmup domain, train.py:405; used by the
        trainer's warmup accumulate ramp where the opt-step -> ni mapping
        is nonlinear)."""
        step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        if not batch_units:
            step = step * self.step_scale
        epoch = jnp.floor(step / self.spe)
        base = self.lr0 * self._lf(epoch)
        frac = jnp.clip(step / self.nw, 0.0, 1.0)
        in_warmup = step <= self.nw
        lr_main = jnp.where(in_warmup, frac * base, base)
        lr_bias = jnp.where(in_warmup, self.warmup_bias_lr + frac * (base - self.warmup_bias_lr), base)
        mom = jnp.where(
            in_warmup,
            self.warmup_momentum + frac * (self.momentum - self.warmup_momentum),
            self.momentum,
        )
        return {"g0": lr_main, "g1": lr_main, "g2": lr_bias, "frozen": 0.0 * lr_main,
                "momentum": mom}


class OptState(NamedTuple):
    step: jax.Array
    mom: FlatDict  # SGD momentum buffer / Adam m
    vel: FlatDict  # Adam v (unused for SGD)


def init_opt_state(params: FlatDict) -> OptState:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return OptState(jnp.zeros((), jnp.int32), zeros, {k: jnp.zeros_like(v) for k, v in params.items()})


def sgd_step(params, grads, state: OptState, sched: Schedule, labels,
             weight_decay: float, ni=None):
    """torch SGD(momentum, nesterov=True) with L2 decay on g1 only.
    Matches torch._single_tensor_sgd semantics.  `ni`: optional batch
    counter for schedules driven in batch units (warmup accumulate ramp)."""
    lrs = sched(state.step) if ni is None else sched(ni, batch_units=True)
    mom = lrs["momentum"]
    new_p, new_buf = {}, {}
    for k, p in params.items():
        g = grads[k]
        label = labels[k]
        if label == "frozen":
            new_p[k] = p
            new_buf[k] = state.mom[k]
            continue
        if label == "g1" and weight_decay:
            g = g + weight_decay * p
        buf = mom * state.mom[k] + g
        # nesterov: d_p = g + momentum * buf; torch applies on first step too
        d = g + mom * buf
        new_p[k] = p - lrs[label] * d
        new_buf[k] = buf
    return new_p, OptState(state.step + 1, new_buf, state.vel)


def adam_step(params, grads, state: OptState, sched: Schedule, labels,
              weight_decay: float, ni=None, beta2: float = 0.999,
              eps: float = 1e-8):
    """torch Adam (L2-style decay) with beta1 = hyp momentum.
    ref: train.py:217 (Adam(lr=3e-4, betas=(momentum, 0.999))).

    beta1 is the FIXED hyp momentum: the reference's warmup ramp touches
    only optimizer groups with a 'momentum' key, i.e. SGD — Adam betas are
    set at construction and never ramped (ref train.py:415-422). A fixed
    beta1 also keeps the 1-beta1**t bias correction exact."""
    lrs = sched(state.step) if ni is None else sched(ni, batch_units=True)
    beta1 = sched.momentum
    t = state.step.astype(jnp.float32) + 1.0
    new_p, new_m, new_v = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        label = labels[k]
        if label == "frozen":
            new_p[k], new_m[k], new_v[k] = p, state.mom[k], state.vel[k]
            continue
        if label == "g1" and weight_decay:
            g = g + weight_decay * p
        m = beta1 * state.mom[k] + (1 - beta1) * g
        v = beta2 * state.vel[k] + (1 - beta2) * g * g
        mhat = m / (1 - beta1**t)
        vhat = v / (1 - beta2**t)
        new_p[k] = p - lrs[label] * mhat / (jnp.sqrt(vhat) + eps)
        new_m[k], new_v[k] = m, v
    return new_p, OptState(state.step + 1, new_m, new_v)


# ---------------------------------------------------------------------------
# EMA (ref: utils/torch_utils.py:309-343)
# ---------------------------------------------------------------------------

def ema_decay(updates, decay: float = 0.9999):
    """Ramped decay d = decay * (1 - e^{-t/2000})."""
    t = updates.astype(jnp.float32) if hasattr(updates, "astype") else float(updates)
    return decay * (1 - jnp.exp(-t / 2000.0))


def ema_update(ema_tree: FlatDict, new_tree: FlatDict, d) -> FlatDict:
    """EMA over params AND stats (the reference EMAs the full state_dict)."""
    return {k: d * ema_tree[k] + (1 - d) * new_tree[k] for k in ema_tree}


def labels_to_class_weights(labels, nc: int):
    """Inverse-frequency class weights.  ref: utils/general.py:162-180."""
    if len(labels) == 0:
        return np.ones(nc, np.float32)
    classes = np.concatenate([l[:, 0] for l in labels], 0).astype(int)
    weights = np.bincount(classes, minlength=nc).astype(np.float32)
    weights[weights == 0] = 1
    weights = 1 / weights
    return weights / weights.sum()


def labels_to_image_weights(labels, nc: int, class_weights) -> np.ndarray:
    """Per-image sampling weight from its class content.
    ref: utils/general.py:183-189."""
    counts = np.array(
        [np.bincount(l[:, 0].astype(int), minlength=nc) for l in labels],
        dtype=np.float64,
    ) if len(labels) else np.zeros((0, nc))
    return (np.asarray(class_weights).reshape(1, nc) * counts).sum(1) + 1e-6
