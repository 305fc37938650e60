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


def _half_tree(tree):
    """f32 leaves -> f16 (the reference checkpoints model/EMA as .half(),
    train.py:515-529); other dtypes pass through."""
    out = {}
    for k, v in tree.items():
        a = np.asarray(v)
        out[k] = a.astype(np.float16) if a.dtype == np.float32 else a
    return out


def save_checkpoint(path, *, params, stats, ema_params=None, ema_stats=None,
                    opt_mom=None, opt_vel=None, meta: Optional[Dict] = None,
                    half: bool = False):
    """meta: json-serialisable (epoch, best_fitness, step, updates, ...).

    half=True stores model/EMA trees as f16 like the reference (optimizer
    state stays full precision) — halves checkpoint size AND the
    device->host pull; loaders upcast back to f32."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    cvt = _half_tree if half else (lambda t: t)
    arrays = {}
    arrays.update(_flatten("params", cvt(params)))
    arrays.update(_flatten("stats", cvt(stats)))
    if ema_params is not None:
        arrays.update(_flatten("ema_params", cvt(ema_params)))
        arrays.update(_flatten("ema_stats", cvt(ema_stats)))
    if opt_mom is not None:
        arrays.update(_flatten("opt_mom", opt_mom))
        arrays.update(_flatten("opt_vel", opt_vel))
    meta = dict(meta or {})
    meta.setdefault("date", datetime.datetime.now().isoformat())
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(path.with_suffix(""), **arrays)


def load_checkpoint(path) -> Tuple[Dict, Dict]:
    """Returns ({'params':..., 'stats':..., 'ema_params':?, ...}, meta).
    f16 leaves are upcast to f32 (reference attempt_load .float())."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_suffix(".npz")
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z.files else {}
    trees = {}
    for prefix in ("params", "stats", "ema_params", "ema_stats", "opt_mom", "opt_vel"):
        t = _unflatten(prefix, z)
        if t:
            trees[prefix] = {
                k: (v.astype(jnp.float32) if v.dtype == jnp.float16 else v)
                for k, v in t.items()
            }
    return trees, meta


def strip_checkpoint(src, dst=None):
    """Final inference checkpoint: prefer EMA weights, drop optimizer —
    the analogue of strip_optimizer + attempt_load's ema preference."""
    trees, meta = load_checkpoint(src)
    params = trees.get("ema_params") or trees["params"]
    stats = trees.get("ema_stats") or trees["stats"]
    dst = dst or src
    keep = ("epoch", "best_fitness", "nc", "cfg", "anchors")  # self-description
    save_checkpoint(dst, params=params, stats=stats, half=True,
                    meta={k: meta[k] for k in keep if k in meta and meta[k] is not None})
    return dst
