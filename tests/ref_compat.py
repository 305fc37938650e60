"""Import shim for the PyTorch reference at /root/reference (read-only).

Used ONLY to generate golden outputs for parity tests — never vendored.
The reference imports `torchvision` but only uses `torchvision.ops.nms`
(ref: utils/general.py:708); torchvision isn't installed here, so we inject
a minimal stub implementing greedy NMS in pure torch before importing.
"""
from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


def _make_torchvision_stub():
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (area_i + area_r - inter + 1e-7)
            order = rest[iou <= iou_threshold]
        return torch.tensor(keep, dtype=torch.long)

    ops.nms = nms
    tv.ops = ops
    tv.__version__ = "0.0.0-stub"
    return tv, ops


def setup_reference_imports():
    """Make `models.*` / `utils.*` of the reference importable. Returns True on success."""
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    if "torchvision" not in sys.modules:
        tv, ops = _make_torchvision_stub()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            # reference only uses pkg.parse_version in check_version
            pkg = types.ModuleType("pkg_resources")

            def parse_version(v):
                return tuple(int(p) for p in str(v).split("+")[0].split(".")[:3] if p.isdigit())

            pkg.parse_version = parse_version
            sys.modules["pkg_resources"] = pkg
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _seed_reference_font()
    return True


def _seed_reference_font():
    """The reference downloads Arial.ttf at import (utils/plots.py:51-66);
    this environment has no egress, so pre-seed its config dir with a ttf
    from matplotlib."""
    import os
    import shutil
    from pathlib import Path

    cfg_dir = Path(os.getenv("YOLOV5_CONFIG_DIR") or Path.home() / ".config" / "Ultralytics")
    target = cfg_dir / "Arial.ttf"
    if target.exists():
        return
    try:
        import matplotlib

        src = Path(matplotlib.get_data_path()) / "fonts" / "ttf" / "DejaVuSans.ttf"
        if src.exists():
            cfg_dir.mkdir(parents=True, exist_ok=True)
            shutil.copy(src, target)
    except Exception:
        pass


def patch_ca_alias():
    """13 reference configs use module `CA`, which the reference never
    defines (parse_model's eval raises NameError — SURVEY.md §2.2).  Register
    the obvious alias CA = CoorAttention in the reference namespaces so those
    architectures can be built for golden comparison."""
    import models.yolo as ryolo
    import models.common as rcommon

    if not hasattr(ryolo, "CA"):
        ryolo.CA = rcommon.CoorAttention
    if not hasattr(rcommon, "CA"):
        rcommon.CA = rcommon.CoorAttention
