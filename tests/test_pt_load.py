"""Direct .pt checkpoint loading: the CLIs accept the torch reference's own
training checkpoints ({'model': module, 'ema': ...}, ref train.py:515-529).

Two paths are covered:
  (a) the reference's class definitions are importable (the usual
      side-by-side setup) — the pickled tree is walked directly;
  (b) they are NOT importable (a user migrating with only a best.pt file) —
      unimportable classes are stubbed during unpickling and the weights
      recovered from the raw module tree (utils/torch_import.load_torch_pt).

Both must produce params identical to the golden import_torch_state path,
and autoanchor-evolved anchors stored in the checkpoint must override the
yaml's anchors (ref attempt_load decodes with the trained buffer).
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from dmayolo_tpu.cli.common import load_model_from_checkpoint
from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.utils.torch_import import import_torch_state

torch = pytest.importorskip("torch")
from tests.ref_compat import REF_ROOT, setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from models.yolo import Model as RefModel  # noqa: E402

CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.25,
    "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326]],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 3, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "SPPF", [256, 5]],
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]],
}


@pytest.fixture(scope="module")
def saved_pt(tmp_path_factory):
    torch.manual_seed(0)
    ref = RefModel(dict(CFG))
    ref.eval()
    # mimic autoanchor: the trained buffer differs from the yaml anchors
    with torch.no_grad():
        det = ref.model[-1]
        det.anchors *= 1.3
    path = tmp_path_factory.mktemp("pt") / "best.pt"
    # the reference checkpoints fp16 models (train.py:515-529)
    torch.save({"model": ref.half(), "ema": None, "epoch": 7}, path)
    ref.float()
    return path, ref


def _golden(ref):
    ours = DetectionModel(dict(CFG))
    params, stats, _ = import_torch_state(ours, ref.state_dict())
    return ours, params, stats


def _assert_same(model, params, stats, ref):
    gold_model, gold_params, gold_stats = _golden(ref)
    assert set(params) == set(gold_params)
    for k in gold_params:
        np.testing.assert_allclose(np.asarray(params[k]),
                                   np.asarray(gold_params[k]), atol=1e-3)
    for k in gold_stats:
        np.testing.assert_allclose(np.asarray(stats[k]),
                                   np.asarray(gold_stats[k]), atol=1e-3)
    # the evolved anchors came from the pickle, not the yaml
    np.testing.assert_allclose(
        np.asarray(model.head.anchors),
        np.asarray(ref.model[-1].anchors.float().numpy()), rtol=1e-3)
    # and the end-to-end decode agrees with the torch model
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        t_dec, _ = ref(torch.tensor(x))
    j_dec = model.decode(model.apply(params, stats,
                                     jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(j_dec), t_dec.numpy(),
                               atol=5e-2, rtol=1e-2)


def test_pt_load_with_reference_importable(saved_pt):
    path, ref = saved_pt
    model, params, stats = load_model_from_checkpoint(str(path))
    _assert_same(model, params, stats, ref)


def test_pt_load_without_reference_classes(saved_pt):
    """Simulate a migration environment: the reference's models/utils
    packages are NOT importable — stub-unpickling must recover everything."""
    path, ref = saved_pt
    saved_modules = {k: sys.modules.pop(k) for k in list(sys.modules)
                     if k == "models" or k.startswith("models.")
                     or k == "utils" or k.startswith("utils.")}
    saved_path = list(sys.path)
    try:
        sys.path = [p for p in sys.path if p != REF_ROOT]
        model, params, stats = load_model_from_checkpoint(str(path))
    finally:
        sys.path = saved_path
        sys.modules.update(saved_modules)
    _assert_same(model, params, stats, ref)
