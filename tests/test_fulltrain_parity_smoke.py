"""Keeps tools/fulltrain_parity.py (parity link 5, docs/PARITY.md)
executable: gen -> ref (the torch reference's own train.py, 2 epochs,
in-process) -> tpu (our train CLI, 2 epochs) -> report (cross-eval of the
reference-trained best.pt under OUR val CLI). Numbers are meaningless at
2 epochs — this locks the harness, not the convergence claim.
"""
import importlib
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def ftp(tmp_path, monkeypatch):
    sys.path.insert(0, str(REPO / "tools"))
    mod = importlib.import_module("fulltrain_parity")
    root = str(tmp_path / "parity")
    monkeypatch.setattr(mod, "ROOT", root)
    monkeypatch.setattr(mod, "DATA", f"{root}/data")
    monkeypatch.setattr(mod, "YAML", f"{root}/data/shapes.yaml")
    monkeypatch.setattr(mod, "IMG", 160)
    monkeypatch.setattr(mod, "BS", 8)
    # ref() patches torch.load / sys.argv for the reference's benefit;
    # restore both so later tests see pristine state
    orig_load, orig_argv = torch.load, list(sys.argv)
    yield mod
    torch.load = orig_load
    sys.argv = orig_argv


def test_fulltrain_parity_harness(ftp):
    ftp.gen(n_train=16, n_val=8, img_size=192)
    ftp.ref(epochs=2)
    ftp.tpu(epochs=2)
    out = ftp.report()
    # both trainers produced parseable curves and the cross-eval ran
    assert 0.0 <= out["ref_best_map50"] <= 1.0
    assert 0.0 <= out["tpu_best_map50"] <= 1.0
    assert "cross_val_line" in out, out
    assert (Path(ftp.ROOT) / "ref_runs/exp/weights/best.pt").exists()
