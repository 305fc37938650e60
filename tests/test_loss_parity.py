"""Loss parity vs the reference on fixed synthetic predictions/targets
(SURVEY.md §4 test level (c))."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from models.yolo import Model as RefModel  # noqa: E402
from utils.loss import ComputeLoss as RefComputeLoss  # noqa: E402
from utils.tal import ComputeLoss_TAL as RefComputeLossTAL  # noqa: E402

from dmayolo_tpu.graph import DetectionModel  # noqa: E402
from dmayolo_tpu.train.loss import ComputeLoss, Targets  # noqa: E402
from dmayolo_tpu.train.tal import ComputeLossTAL  # noqa: E402

REF = "/root/reference/models"

HYP = {
    "box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "label_smoothing": 0.0, "fl_gamma": 0.0,
}

TINY_TDETECT_CFG = {
    "nc": 10,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23]] * 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],   # P3/8
        [-1, 1, "Conv", [48, 3, 2]],   # P4/16
        [-1, 1, "Conv", [64, 3, 2]],   # P5/32
    ],
    "head": [[[2, 3, 4], 1, "TDetect", ["nc"]]],
}


def random_targets(rng, bs, n, nc):
    """(n, 6) [img, cls, xywh normalised] with boxes comfortably inside."""
    img = rng.integers(0, bs, n)
    cls = rng.integers(0, nc, n)
    cx, cy = rng.uniform(0.2, 0.8, (2, n))
    w, h = rng.uniform(0.05, 0.3, (2, n))
    return np.stack([img, cls, cx, cy, w, h], 1).astype(np.float32)


def to_dense(flat, bs, m):
    cls = np.zeros((bs, m), np.float32)
    box = np.zeros((bs, m, 4), np.float32)
    mask = np.zeros((bs, m), bool)
    fill = np.zeros(bs, int)
    for row in flat:
        b = int(row[0])
        j = fill[b]
        cls[b, j] = row[1]
        box[b, j] = row[2:6]
        mask[b, j] = True
        fill[b] += 1
    return Targets(jnp.asarray(cls), jnp.asarray(box), jnp.asarray(mask))


def test_anchor_loss_parity():
    torch.manual_seed(0)
    ref_model = RefModel(f"{REF}/yolov5n.yaml")
    ref_model.hyp = dict(HYP)
    ref_loss = RefComputeLoss(ref_model)

    ours_model = DetectionModel(f"{REF}/yolov5n.yaml")
    our_loss = ComputeLoss(ours_model.head.anchors, HYP, nc=80)

    rng = np.random.default_rng(0)
    bs, img = 2, 160
    shapes = [(bs, 3, img // s, img // s, 85) for s in (8, 16, 32)]
    preds = [rng.normal(0, 1, s).astype(np.float32) for s in shapes]
    flat_t = random_targets(rng, bs, 17, 80)

    t_total, t_items = ref_loss(
        [torch.tensor(p) for p in preds], torch.tensor(flat_t)
    )
    # ours wants NHWC-native (B, ny, nx, na, no)
    j_preds = [jnp.asarray(p.transpose(0, 2, 3, 1, 4)) for p in preds]
    j_total, j_items = our_loss(j_preds, to_dense(flat_t, bs, 32))

    np.testing.assert_allclose(float(j_total), float(t_total), rtol=2e-4)
    np.testing.assert_allclose(float(j_items["box"]), float(t_items[0]), rtol=2e-4)
    np.testing.assert_allclose(float(j_items["obj"]), float(t_items[1]), rtol=2e-4)
    np.testing.assert_allclose(float(j_items["cls"]), float(t_items[2]), rtol=2e-4)


def test_anchor_loss_no_targets():
    ours_model = DetectionModel(f"{REF}/yolov5n.yaml")
    our_loss = ComputeLoss(ours_model.head.anchors, HYP, nc=80)
    rng = np.random.default_rng(1)
    preds = [
        jnp.asarray(rng.normal(0, 1, (1, s, s, 3, 85)).astype(np.float32))
        for s in (20, 10, 5)
    ]
    empty = Targets(jnp.zeros((1, 8)), jnp.zeros((1, 8, 4)), jnp.zeros((1, 8), bool))
    total, items = our_loss(preds, empty)
    assert np.isfinite(float(total))
    assert float(items["box"]) == 0.0


def test_tal_loss_parity():
    import copy
    torch.manual_seed(0)
    ref_model = RefModel(copy.deepcopy(TINY_TDETECT_CFG))
    ref_model.hyp = dict(HYP)
    ref_model.train()
    ref_loss = RefComputeLossTAL(ref_model)

    ours = DetectionModel(copy.deepcopy(TINY_TDETECT_CFG))
    our_loss = ComputeLossTAL(ours.stride, nc=10, hyp=HYP)

    rng = np.random.default_rng(2)
    bs, img, nc, reg_max = 2, 128, 10, 16
    no = nc + 4 * reg_max
    shapes = [(bs, no, img // s, img // s) for s in (8, 16, 32)]
    feats = [torch.tensor(rng.normal(0, 1, s).astype(np.float32)) for s in shapes]
    # reference train 'pred' is (x, box, cls) from TDetect.forward
    flat = torch.cat([f.view(bs, no, -1) for f in feats], 2)
    box, cls = flat.split((4 * reg_max, nc), 1)
    flat_t = random_targets(rng, bs, 11, nc)

    t_total, t_items = ref_loss((feats, box, cls), torch.tensor(flat_t))

    j_raw = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats]
    j_total, j_items = our_loss(j_raw, to_dense(flat_t, bs, 16))

    np.testing.assert_allclose(float(j_items["box"]), float(t_items[0]), rtol=1e-3)
    np.testing.assert_allclose(float(j_items["cls"]), float(t_items[1]), rtol=1e-3)
    np.testing.assert_allclose(float(j_items["dfl"]), float(t_items[2]), rtol=1e-3)
    np.testing.assert_allclose(float(j_total), float(t_total), rtol=1e-3)
