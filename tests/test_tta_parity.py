"""TTA (multi-scale+flip) forward parity vs reference _forward_augment
(models/yolo.py:194-275)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from models.yolo import Model as RefModel  # noqa: E402

from dmayolo_tpu.eval.tta import forward_augment  # noqa: E402
from dmayolo_tpu.graph import DetectionModel  # noqa: E402
from dmayolo_tpu.utils.torch_import import import_torch_state  # noqa: E402


def test_tta_matches_reference():
    torch.manual_seed(0)
    ref = RefModel("/root/reference/models/yolov5n.yaml")
    ref.eval()
    ours = DetectionModel("/root/reference/models/yolov5n.yaml")
    params, stats, _ = import_torch_state(ours, ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(1, 3, 320, 320)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = ref(torch.tensor(x), augment=True)
    j_out = np.asarray(
        forward_augment(ours, params, stats, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    t_out = t_out.numpy()
    assert j_out.shape == t_out.shape, (j_out.shape, t_out.shape)
    np.testing.assert_allclose(j_out, t_out, atol=5e-2, rtol=2e-3)
