"""eval/metrics parity vs the reference ap_per_class / process_batch /
ConfusionMatrix on synthetic detections."""
import numpy as np
import pytest

from dmayolo_tpu.eval.metrics import (
    ConfusionMatrix,
    ap_per_class,
    fitness,
    process_batch,
)

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from utils.metrics import ap_per_class as ref_ap_per_class  # noqa: E402
from utils.metrics import ConfusionMatrix as RefConfusionMatrix  # noqa: E402
from val import process_batch as ref_process_batch  # noqa: E402

rng = np.random.default_rng(3)


def synth_stats(n=400, nc=5):
    tp = rng.random((n, 10)) < np.linspace(0.7, 0.2, 10)[None, :]
    tp = np.sort(tp, axis=1)[:, ::-1]  # monotone over IoU like real matching
    conf = rng.random(n)
    pred_cls = rng.integers(0, nc, n)
    target_cls = rng.integers(0, nc, 3 * n // 2)
    return tp.astype(np.float64), conf, pred_cls.astype(np.float64), target_cls.astype(np.float64)


def test_ap_per_class_matches_reference():
    tp, conf, pred_cls, target_cls = synth_stats()
    p, r, ap, f1, cls = ap_per_class(tp, conf, pred_cls, target_cls)
    rp, rr, rap, rf1, rcls = ref_ap_per_class(tp, conf, pred_cls, target_cls,
                                              plot=False, names={})
    np.testing.assert_allclose(ap, rap, atol=1e-10)
    np.testing.assert_allclose(p, rp, atol=1e-10)
    np.testing.assert_allclose(r, rr, atol=1e-10)
    np.testing.assert_allclose(f1, rf1, atol=1e-10)
    np.testing.assert_array_equal(cls, rcls)


def test_process_batch_matches_reference():
    iouv = np.linspace(0.5, 0.95, 10)
    for _ in range(5):
        nd, nl = rng.integers(1, 40), rng.integers(1, 20)
        xy = rng.uniform(0, 500, (nd, 2))
        det = np.concatenate(
            [xy, xy + rng.uniform(5, 100, (nd, 2)), rng.random((nd, 1)),
             rng.integers(0, 4, (nd, 1))], 1
        )
        lxy = rng.uniform(0, 500, (nl, 2))
        lab = np.concatenate([rng.integers(0, 4, (nl, 1)), lxy, lxy + rng.uniform(5, 100, (nl, 2))], 1)
        ours = process_batch(det, lab, iouv)
        ref = ref_process_batch(torch.tensor(det), torch.tensor(lab), torch.tensor(iouv)).numpy()
        np.testing.assert_array_equal(ours, ref)


def test_confusion_matrix_matches_reference():
    nc = 4
    ours = ConfusionMatrix(nc)
    ref = RefConfusionMatrix(nc)
    for _ in range(4):
        nd, nl = rng.integers(1, 30), rng.integers(0, 15)
        xy = rng.uniform(0, 400, (nd, 2))
        det = np.concatenate(
            [xy, xy + rng.uniform(10, 120, (nd, 2)), rng.uniform(0.3, 1.0, (nd, 1)),
             rng.integers(0, nc, (nd, 1))], 1
        )
        lxy = rng.uniform(0, 400, (nl, 2))
        lab = np.concatenate([rng.integers(0, nc, (nl, 1)), lxy, lxy + rng.uniform(10, 120, (nl, 2))], 1)
        ours.process_batch(det, lab)
        ref.process_batch(torch.tensor(det), torch.tensor(lab))
    np.testing.assert_array_equal(ours.matrix, ref.matrix)


def test_fitness():
    x = np.array([[0.5, 0.6, 0.7, 0.4]])
    assert fitness(x)[0] == pytest.approx(0.1 * 0.7 + 0.9 * 0.4)
