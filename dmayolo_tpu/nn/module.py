"""Minimal functional module framework for the zoo.

Design goals (why not stock Flax):
  * params live in ONE flat dict keyed by path tuples that mirror the
    reference's torch module paths 1:1 (e.g. ("model","3","cv1","conv")),
    so the torch-checkpoint importer is a mechanical key/layout transform;
  * BatchNorm running stats live in a parallel flat dict and are collected
    functionally through an apply context — no mutable-collection magic;
  * BN folding (reference fuse(), utils/torch_utils.py:198-218) is a pure
    dict-to-dict transform;
  * every array op is plain jnp/lax, NHWC, ready for jit/pjit/shard_map.

A module instance is a lightweight graph-of-submodules; `init(key)` builds
the flat param/stat dicts, `apply`-style calling is `module(v, x)` where
`v = Vars(params, stats, ctx)` is threaded down unchanged (children address
their own leaves by absolute path).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Path = Tuple[str, ...]
FlatDict = Dict[Path, jax.Array]


@dataclasses.dataclass
class ApplyCtx:
    """Per-apply context threaded to every module."""

    train: bool = False
    dtype: Any = jnp.float32  # compute dtype for conv/matmul inputs
    rng: Optional[jax.Array] = None
    stats_out: Optional[FlatDict] = None  # BN running-stat updates (train only)
    fused: bool = False  # params have BN folded into convs (inference)
    # int8 PTQ serving (nn/quant.py): {conv_path: input_scale} — eligible
    # convs run int8xint8->int32 on the MXU and dequantise in the epilogue
    quant: Optional[Dict[Path, float]] = None
    # calibration pass: eligible convs append (path, |x|max) here
    quant_observe: Optional[Dict[Path, Any]] = None

    _rng_counter: int = 0

    def next_rng(self) -> jax.Array:
        if self.rng is None:
            raise ValueError("apply ctx has no rng but a stochastic layer asked for one")
        self._rng_counter += 1
        return jax.random.fold_in(self.rng, self._rng_counter)


@dataclasses.dataclass
class Vars:
    params: FlatDict
    stats: FlatDict
    ctx: ApplyCtx


class Module:
    """Base class. Subclasses register children in __init__ via self.add()."""

    def __init__(self):
        self._children: Dict[str, "Module"] = {}
        self.path: Path = ()

    # -- tree construction -------------------------------------------------
    def add(self, name: str, mod: "Module"):
        """Register a child; renames its whole subtree under `name`."""
        mod._reroot((name,))
        self._children[name] = mod
        return mod

    def _reroot(self, prefix: Path):
        self.path = prefix + self.path
        for c in self._children.values():
            c._reroot(prefix)

    # -- parameter init ----------------------------------------------------
    def own_params(self, key: jax.Array) -> FlatDict:
        """Leaf modules override: return this module's own parameter leaves."""
        return {}

    def own_stats(self) -> FlatDict:
        return {}

    def init(self, key: jax.Array) -> Tuple[FlatDict, FlatDict]:
        params: FlatDict = {}
        stats: FlatDict = {}
        self._init_into(key, params, stats)
        return params, stats

    def _init_into(self, key: jax.Array, params: FlatDict, stats: FlatDict):
        params.update(self.own_params(key))
        stats.update(self.own_stats())
        for i, c in enumerate(self._children.values()):
            c._init_into(jax.random.fold_in(key, i + 1), params, stats)

    # -- forward -----------------------------------------------------------
    def __call__(self, v: Vars, x):
        raise NotImplementedError

    # -- utilities ---------------------------------------------------------
    def param_count(self) -> int:
        params, _ = self.init(jax.random.PRNGKey(0))
        return sum(int(p.size) for p in params.values())

    def iter_modules(self):
        yield self
        for c in self._children.values():
            yield from c.iter_modules()


class Sequential(Module):
    """torch nn.Sequential equivalent: children named "0", "1", ..."""

    def __init__(self, mods):
        super().__init__()
        self.mods = [self.add(str(j), m) for j, m in enumerate(mods)]

    def __call__(self, v: Vars, x):
        for m in self.mods:
            x = m(v, x)
        return x


class Identity(Module):
    def __call__(self, v: Vars, x):
        return x


class Lambda(Module):
    """Stateless function as a module."""

    def __init__(self, fn: Callable):
        super().__init__()
        self.fn = fn

    def __call__(self, v: Vars, x):
        return self.fn(x)


def make_vars(params: FlatDict, stats: FlatDict, train: bool = False, rng=None,
              dtype=jnp.float32, fused: bool = False, quant=None,
              quant_observe=None) -> Vars:
    ctx = ApplyCtx(
        train=train,
        dtype=dtype,
        rng=rng,
        stats_out={} if train else None,
        fused=fused,
        quant=quant,
        quant_observe=quant_observe,
    )
    return Vars(params=params, stats=stats, ctx=ctx)
