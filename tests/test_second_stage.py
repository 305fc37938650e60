"""Golden parity: save_one_box crop math + apply_classifier second stage.

Reference surfaces: utils/general.py:916-929 (save_one_box) and
:881-914 (apply_classifier; dead-by-default upstream — detect.py:88
hardcodes classify=False and load_classifier needs a torchvision
download, so the golden uses a deterministic fake classifier).
"""
import numpy as np
import pytest

from dmayolo_tpu.eval.second_stage import apply_classifier, expand_boxes, save_one_box

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from utils.general import apply_classifier as ref_apply_classifier  # noqa: E402
from utils.general import save_one_box as ref_save_one_box  # noqa: E402


@pytest.mark.parametrize("square,BGR", [(False, False), (True, False),
                                        (False, True), (True, True)])
def test_save_one_box_parity(square, BGR):
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    for seed in range(5):
        r = np.random.default_rng(seed)
        x1, y1 = r.uniform(0, 100), r.uniform(0, 80)
        box = [x1, y1, x1 + r.uniform(5, 60), y1 + r.uniform(5, 40)]
        want = ref_save_one_box(box, im, square=square, BGR=BGR, save=False)
        got = save_one_box(box, im, square=square, BGR=BGR, save=False)
        np.testing.assert_array_equal(got, want.numpy() if hasattr(want, "numpy") else want)


class _FakeTorchClassifier(torch.nn.Module):
    """Deterministic logits from per-channel means (layout-independent)."""

    def __init__(self, w):
        super().__init__()
        self.w = torch.tensor(w, dtype=torch.float32)

    def forward(self, x):  # x: (N, 3, H, W) RGB in [0,1]
        return x.mean(dim=(2, 3)) @ self.w


def test_apply_classifier_parity():
    rng = np.random.default_rng(7)
    nc = 5
    w = rng.normal(size=(3, nc)).astype(np.float32)
    lb_h, lb_w = 256, 320
    im0 = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)

    n = 24
    xy = rng.uniform(0, 260, (n, 2))
    wh = rng.uniform(8, 70, (n, 2))
    dets = np.concatenate(
        [xy, np.minimum(xy + wh, [lb_w, lb_h]),
         rng.uniform(0.3, 1.0, (n, 1)),
         rng.integers(0, nc, (n, 1)).astype(np.float64)], axis=1
    ).astype(np.float32)

    img = torch.zeros((1, 3, lb_h, lb_w))  # only .shape[2:] is read
    ref_out = ref_apply_classifier(
        [torch.tensor(dets.copy())], _FakeTorchClassifier(w), img, [im0.copy()]
    )[0].numpy()

    def classifier_fn(x):  # (N, 224, 224, 3) RGB [0,1] NHWC
        return x.mean(axis=(1, 2)) @ w

    got = apply_classifier([dets.copy()], classifier_fn, (lb_h, lb_w), [im0])[0]
    np.testing.assert_allclose(got, ref_out, atol=1e-5)


def test_apply_classifier_empty_and_degenerate():
    # empty det list passes through; a zero-area box (degenerate after
    # trunc+clip) is dropped instead of crashing like the reference would
    def classifier_fn(x):
        return np.tile([[1.0, 0.0]], (x.shape[0], 1))

    im0 = np.zeros((100, 100, 3), np.uint8)
    empty = np.zeros((0, 6), np.float32)
    out = apply_classifier([empty], classifier_fn, (128, 128), [im0])
    assert out[0].shape == (0, 6)
    # box entirely outside the native image after letterbox-invert
    far = np.array([[125.0, 125.0, 127.0, 127.0, 0.9, 0.0]], np.float32)
    out = apply_classifier([far], classifier_fn, (128, 128), [im0])
    assert out[0].shape[0] <= 1  # no crash


def test_expand_boxes_trunc_matches_torch_long():
    # torch .long() truncates toward zero, including for negatives
    box = np.array([[-8.0, -6.0, 4.0, 9.0]])
    got = expand_boxes(box, gain=1.3, pad=30.0, square=True)[0]
    b = torch.tensor(box)
    from utils.general import xywh2xyxy, xyxy2xywh
    t = xyxy2xywh(b)
    t[:, 2:] = t[:, 2:].max(1)[0].unsqueeze(1)
    t[:, 2:] = t[:, 2:] * 1.3 + 30
    want = xywh2xyxy(t).long()[0].numpy()
    np.testing.assert_array_equal(got, want)


def test_detect_classify_cli(tmp_path):
    """Smoke: detect --classify end-to-end with a tiny Classify checkpoint."""
    import cv2
    import jax

    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.utils.checkpoint import save_checkpoint
    from tests.test_e2e_train import TINY_CFG

    det_model = DetectionModel(TINY_CFG)
    p, s = det_model.init_with_priors(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "det.npz", params=p, stats=s,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})

    cls_cfg = {
        "nc": TINY_CFG["nc"], "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Conv", [16, 3, 2]]],
        "head": [[-1, 1, "Classify", ["nc"]]],
    }
    cls_model = DetectionModel(cls_cfg)
    cp, cs = cls_model.init(jax.random.PRNGKey(1))
    save_checkpoint(tmp_path / "cls.npz", params=cp, stats=cs,
                    meta={"cfg": cls_cfg, "nc": cls_cfg["nc"]})

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(src / f"{i}.jpg"),
                    rng.integers(0, 255, (140, 180, 3), dtype=np.uint8))

    from dmayolo_tpu.cli.detect import main as detect_main
    out = detect_main([
        "--weights", str(tmp_path / "det.npz"), "--source", str(src),
        "--imgsz", "128", "--conf-thres", "0.0001", "--max-det", "10",
        "--classify", str(tmp_path / "cls.npz"),
        "--project", str(tmp_path / "runs"), "--name", "v", "--exist-ok",
        "--save-txt", "--save-crop", "--device", "cpu",
    ])
    assert (out / "labels").exists()
