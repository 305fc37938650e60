"""Torch-checkpoint importer.

Because our param paths mirror the reference's torch module paths 1:1, the
import is a mechanical key + layout transform:

    our leaf            torch leaf            layout
    ------------------  --------------------  -----------------------------
    kernel (4D)         .weight               OIHW -> HWIO
    kernel (2D)         .weight               (O, I) -> (I, O)
    scale               .weight               as-is (BN/LN affine)
    bias                .bias                 as-is
    mean / var          .running_mean/_var    as-is
    in_proj_kernel      in_proj_weight        (3C, C) -> (C, 3C)
    w / gamma1 / ...    same name             as-is

Supports reference .pt training checkpoints ({'model': module, 'ema': ...},
ref train.py:515-529) when torch is available, or plain
{key: np.ndarray} dicts.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..nn.module import FlatDict, Path


_LEAF_RULES = {
    "scale": ("weight", None),
    "bias": ("bias", None),
    "mean": ("running_mean", None),
    "var": ("running_var", None),
    "in_proj_kernel": ("in_proj_weight", "linear_t"),
    "in_proj_bias": ("in_proj_bias", None),
}


def _torch_key_and_transform(path: Path, arr) -> Tuple[str, str]:
    parent = ".".join(path[:-1])
    leaf = path[-1]
    if leaf == "kernel":
        if arr.ndim == 4:
            return (f"{parent}.weight", "conv")
        return (f"{parent}.weight", "linear_t")
    if leaf in _LEAF_RULES:
        tleaf, tf = _LEAF_RULES[leaf]
        return (f"{parent}.{tleaf}" if parent else tleaf, tf)
    # direct params (w, gamma1, gamma2, relative_position_bias_table, ...)
    return (".".join(path), None)


def _apply_transform(value: np.ndarray, tf) -> np.ndarray:
    if tf == "conv":
        return np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
    if tf == "linear_t":
        return np.transpose(value)
    return value


def state_dict_to_numpy(obj) -> Dict[str, np.ndarray]:
    """Accept a torch nn.Module, a state_dict of tensors, or numpy dict."""
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, t in obj.items():
        if hasattr(t, "detach"):
            # .numpy() on a float32 CPU tensor is a VIEW of the live torch
            # storage (and jax's CPU backend zero-copies aligned numpy
            # arrays), so without the copy an in-place torch update —
            # optimizer.step() on a model that keeps training — would
            # silently mutate the imported params. Always snapshot.
            t = t.detach().cpu().float().numpy().copy()
        out[k] = np.asarray(t)
    return out


def import_torch_state(model, state_dict, prefix: str = "", strict: bool = True
                       ) -> Tuple[FlatDict, FlatDict, Dict]:
    """Map a torch state_dict onto `model`'s flat (params, stats).

    Args:
        model: a built Module (e.g. DetectionModel).
        state_dict: torch module / state_dict / numpy dict.
        prefix: optional torch-side key prefix to strip (e.g. "module.").
        strict: raise on missing keys or shape mismatches.

    Returns:
        (params, stats, report) where report lists matched/missing keys.
    """
    import jax

    sd = state_dict_to_numpy(state_dict)
    if prefix:
        sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}

    params, stats = model.init(jax.random.PRNGKey(0))
    report = {"matched": [], "missing": [], "mismatched": [], "unused": []}

    def fill(tree: FlatDict):
        for path, cur in tree.items():
            tkey, tf = _torch_key_and_transform(path, cur)
            if tkey not in sd:
                report["missing"].append(tkey)
                continue
            val = _apply_transform(sd[tkey], tf)
            if tuple(val.shape) != tuple(cur.shape):
                report["mismatched"].append((tkey, val.shape, tuple(cur.shape)))
                continue
            tree[path] = jnp.asarray(val, jnp.float32)
            report["matched"].append(tkey)

    fill(params)
    fill(stats)

    used = set(report["matched"])
    report["unused"] = [
        k for k in sd
        if k not in used and not k.endswith("num_batches_tracked")
        and not k.endswith(".anchors") and not k.endswith(".anchor_grid")
        and "relative_position_index" not in k and not k.endswith(".dfl.conv.weight")
    ]
    if strict and (report["missing"] or report["mismatched"]):
        raise ValueError(
            f"torch import mismatch: missing={report['missing'][:8]} "
            f"mismatched={report['mismatched'][:8]}"
        )
    return params, stats, report


def load_reference_checkpoint(path: str, model, ema: bool = True):
    """Load a reference .pt checkpoint (torch required), preferring the EMA
    weights like reference attempt_load (models/experimental.py:113-153)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net = ckpt.get("ema") or ckpt["model"] if isinstance(ckpt, dict) else ckpt
    net = net.float()
    return import_torch_state(model, net.state_dict())


def _stub_pickle_module():
    """A pickle module whose Unpickler substitutes a generic stub class for
    any class whose defining module is not importable here (the reference's
    `models.*` / `utils.*` packages are not installed alongside this
    framework). nn.Module pickling stores everything in the instance
    __dict__ (_parameters / _buffers / _modules), so the weights are fully
    recoverable from stubs without the original class definitions."""
    import pickle
    import types

    class _StubBase:
        pass

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_StubBase,), {"__module__": module})

    mod = types.ModuleType("dmayolo_pt_stub_pickle")
    mod.Unpickler = Unpickler
    mod.load = lambda f, **kw: Unpickler(f, **kw).load()
    return mod


def _walk_module_tree(obj, prefix: str, out: Dict) -> None:
    """Rebuild state_dict() from a (possibly stub-classed) module tree:
    persistent buffers + parameters, depth-first over _modules."""
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    nonpersist = d.get("_non_persistent_buffers_set") or set()
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = p
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None and name not in nonpersist:
            out[prefix + name] = b
    for name, m in (d.get("_modules") or {}).items():
        if m is not None:
            _walk_module_tree(m, prefix + name + ".", out)


def load_torch_pt(path, ema: bool = True):
    """Read a reference .pt checkpoint ({'model': module, 'ema': ...},
    ref train.py:515-529) WITHOUT requiring the reference's class
    definitions on sys.path — unimportable classes are stubbed and the
    weights recovered by walking the pickled module tree. Prefers EMA like
    reference attempt_load (models/experimental.py:113-153).

    Returns (state_dict {torch key: tensor}, cfg dict | None,
    info {'nc', 'names', 'anchors'}). `anchors` is the trained Detect
    buffer (stride units, possibly autoanchor-evolved — it must override
    the yaml's anchors to decode correctly)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_stub_pickle_module())
    net = ckpt
    if isinstance(ckpt, dict):
        net = (ckpt.get("ema") if ema else None) or ckpt.get("model") or ckpt
    sd: Dict = {}
    _walk_module_tree(net, "", sd)
    if not sd and isinstance(net, dict):  # a bare state_dict file
        sd = dict(net)
    d = getattr(net, "__dict__", {})
    cfg = d.get("yaml")
    anchors = None
    for k, v in sd.items():
        if k.endswith(".anchors"):
            a = v.detach().cpu().float().numpy() if hasattr(v, "detach") else v
            anchors = np.asarray(a, np.float32)
    info = {
        "nc": cfg.get("nc") if isinstance(cfg, dict) else None,
        "names": d.get("names"),
        "anchors": anchors,
    }
    return sd, cfg, info
