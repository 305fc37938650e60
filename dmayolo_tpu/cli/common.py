"""Shared CLI helpers: run dirs, config resolution, checkpointed model load."""
from __future__ import annotations

from pathlib import Path

import yaml

PKG_ROOT = Path(__file__).resolve().parents[1]
CONFIGS = PKG_ROOT / "configs"


def increment_path(path, exist_ok=False, sep=""):
    """runs/train/exp -> exp2, exp3...  ref: utils/general.py:931+."""
    path = Path(path)
    if path.exists() and not exist_ok:
        for n in range(2, 9999):
            p = Path(f"{path}{sep}{n}")
            if not p.exists():
                return p
    return path


def resolve_config(name, kind: str):
    """Resolve a model/hyp/data config by path or bundled name."""
    p = Path(name)
    if p.exists():
        return p
    cand = CONFIGS / kind / (p.name if p.suffix else p.name + ".yaml")
    if cand.exists():
        return cand
    raise FileNotFoundError(f"config {name!r} not found (looked in {cand.parent})")


def check_img_size(imgsz: int, s: int = 32, floor: int = 0) -> int:
    """Round imgsz up to a multiple of the model's max stride, warning on
    change — static-shape XLA REQUIRES this (odd sizes desync the pyramid
    concats).  ref: utils/general.py:290-296 (val.py:147, detect.py:92)."""
    import math

    new = max(math.ceil(imgsz / s) * s, floor)
    if new != imgsz:
        print(f"WARNING: --img-size {imgsz} must be a multiple of max "
              f"stride {s}, updating to {new}")
    return new


def load_hyp(name) -> dict:
    with open(resolve_config(name, "hyp"), errors="ignore") as f:
        return yaml.safe_load(f)


def load_model_from_checkpoint(weights, cfg=None, nc=None):
    """Build a DetectionModel + weights from an npz checkpoint (preferring
    EMA like reference attempt_load) or fresh from a cfg."""
    import jax

    from ..graph import DetectionModel
    from ..utils.checkpoint import load_checkpoint

    if weights and str(weights).endswith(".pt"):
        return _load_torch_pt_checkpoint(weights, cfg, nc)
    if weights:
        trees, meta = load_checkpoint(weights)
        cfg = cfg or meta.get("cfg")
        nc = nc or meta.get("nc")
        if cfg is None:
            raise ValueError(
                f"checkpoint {weights} has no cfg in its meta — pass --cfg"
            )
        if isinstance(cfg, dict):
            model = DetectionModel(cfg, nc=nc)
        else:
            model = DetectionModel(resolve_config(cfg, "models"), nc=nc)
        params = trees.get("ema_params") or trees["params"]
        # a fully-fused checkpoint may have no BN stats left at all
        stats = trees.get("ema_stats") or trees.get("stats") or {}
        a = meta.get("anchors")
        cur = getattr(model.head, "anchors", None)  # TDetect is anchor-free
        if a is not None and cur is not None:
            import numpy as _np

            a = _np.asarray(a, _np.float32)
            if tuple(a.shape) == tuple(_np.shape(cur)):
                # live (possibly autoanchor-evolved) anchors, stride units —
                # override the cfg-built values (incl. `anchors: <int>`
                # placeholders) exactly like the .pt interop path below
                model.head.anchors = a
        return model, params, stats
    assert cfg, "need --weights or --cfg"
    model = DetectionModel(resolve_config(cfg, "models"), nc=nc)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    return model, params, stats


def _load_torch_pt_checkpoint(weights, cfg=None, nc=None):
    """Reference interop: every CLI accepts the torch reference's own .pt
    checkpoints directly (ref format train.py:515-529) — the model yaml,
    nc and trained (possibly autoanchor-evolved) anchors travel inside the
    pickle, so `val.py/detect.py --weights best.pt` is a drop-in migration
    path. Works without the reference's class definitions installed."""
    import numpy as np

    from ..graph import DetectionModel
    from ..utils.torch_import import import_torch_state, load_torch_pt

    sd, pt_cfg, info = load_torch_pt(weights)
    cfg = cfg or pt_cfg
    if cfg is None:
        raise ValueError(f"{weights} carries no model yaml — pass --cfg")
    if not isinstance(cfg, dict):
        cfg = resolve_config(cfg, "models")
    model = DetectionModel(cfg, nc=nc or info.get("nc"))
    params, stats, _ = import_torch_state(model, sd)
    a = info.get("anchors")
    cur = getattr(model.head, "anchors", None)  # TDetect is anchor-free
    if a is not None and cur is not None and tuple(a.shape) == tuple(np.shape(cur)):
        model.head.anchors = np.asarray(a, np.float32)
    return model, params, stats


def setup_device(device: str | None):
    """Select the JAX platform. NB the JAX_PLATFORMS env var is ignored when
    the axon TPU plugin is installed — config.update is authoritative."""
    import jax

    enable_compilation_cache()
    if device:
        jax.config.update("jax_platforms", device)


def enable_compilation_cache(path: str = "~/.cache/dmayolo_jax"):
    """Persistent XLA compilation cache — first compiles of big models over
    the TPU tunnel take minutes; cached reruns are instant.

    The cache dir is fingerprinted by the host CPU's identity: XLA:CPU
    AOT executables bake in the compile machine's ISA extensions, and
    loading one on a host missing those features risks SIGILL (the loader
    only warns). The fingerprint covers family/model/stepping/name as well
    as the flags list, because LLVM derives tuning features (e.g.
    prefer-no-scatter) from the CPU *model* — two hosts with identical
    cpuinfo flags can still produce mismatched AOT entries. A different
    host gets a cold cache instead of a crash."""
    import hashlib
    import os

    import jax

    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model", "model name",
                           "stepping"):
                    ident.append(line.strip())
                elif key == "flags":
                    ident.append(" ".join(sorted(line.split(":", 1)[1].split())))
                elif key == "processor" and ident:
                    break  # one core's records are enough
    except OSError:
        pass
    tag = hashlib.sha1("\n".join(ident).encode()).hexdigest()[:10]
    d = os.path.join(os.path.expanduser(path), f"host-{tag}")
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
