"""Checkpointing: flat dicts <-> npz, full train-state save/resume.

Equivalent surface to the reference's torch.save checkpoint dict
{epoch, best_fitness, model, ema, updates, optimizer, date}
(ref: train.py:515-529) and strip_optimizer (utils/general.py:826+).
npz keeps us dependency-light; orbax can slot in for sharded async saves
on pods later.
"""
from __future__ import annotations

import datetime
import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ..nn.module import FlatDict

SEP = "|"  # path-component separator inside npz keys


def _flatten(prefix: str, tree: FlatDict) -> Dict[str, np.ndarray]:
    return {prefix + SEP + SEP.join(k): np.asarray(v) for k, v in tree.items()}


def _unflatten(prefix: str, z) -> FlatDict:
    import jax.numpy as jnp

    out = {}
    pre = prefix + SEP
    for k in z.files:
        if k.startswith(pre):
            out[tuple(k[len(pre):].split(SEP))] = jnp.asarray(z[k])
    return out


def save_checkpoint(path, *, params, stats, ema_params=None, ema_stats=None,
                    opt_mom=None, opt_vel=None, meta: Optional[Dict] = None):
    """meta: json-serialisable (epoch, best_fitness, step, updates, ...)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    arrays.update(_flatten("params", params))
    arrays.update(_flatten("stats", stats))
    if ema_params is not None:
        arrays.update(_flatten("ema_params", ema_params))
        arrays.update(_flatten("ema_stats", ema_stats))
    if opt_mom is not None:
        arrays.update(_flatten("opt_mom", opt_mom))
        arrays.update(_flatten("opt_vel", opt_vel))
    meta = dict(meta or {})
    meta.setdefault("date", datetime.datetime.now().isoformat())
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(path.with_suffix(""), **arrays)


def load_checkpoint(path) -> Tuple[Dict, Dict]:
    """Returns ({'params':..., 'stats':..., 'ema_params':?, ...}, meta)."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_suffix(".npz")
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z.files else {}
    trees = {}
    for prefix in ("params", "stats", "ema_params", "ema_stats", "opt_mom", "opt_vel"):
        t = _unflatten(prefix, z)
        if t:
            trees[prefix] = t
    return trees, meta


def strip_checkpoint(src, dst=None):
    """Final inference checkpoint: prefer EMA weights, drop optimizer —
    the analogue of strip_optimizer + attempt_load's ema preference."""
    trees, meta = load_checkpoint(src)
    params = trees.get("ema_params") or trees["params"]
    stats = trees.get("ema_stats") or trees["stats"]
    dst = dst or src
    keep = ("epoch", "best_fitness", "nc", "cfg")  # keep self-description
    save_checkpoint(dst, params=params, stats=stats,
                    meta={k: meta[k] for k in keep if k in meta and meta[k] is not None})
    return dst
