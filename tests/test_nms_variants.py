"""Golden parity: IoU-variant greedy NMS + merge-NMS.

Reference surfaces: the custom `NMS` with selectable IoU
(utils/general.py:727-761) and the `merge=True` branch of
non_max_suppression (general.py:712-718, weighted-mean box fusion with
the `redundant` support filter). Neither is enabled by default upstream,
but both are one-flag unlocks YOLOv5 users know.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dmayolo_tpu.core.nms import NEG_INF, batched_nms, nms_variant_single

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from utils.general import NMS as ref_NMS  # noqa: E402
from utils.general import bbox_iou as ref_bbox_iou  # noqa: E402


def _boxes_scores(n=60, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("class_nms", ["GIoU", "DIoU", "CIoU"])
def test_variant_nms_matches_reference(class_nms):
    boxes, scores = _boxes_scores(seed=1)
    want = ref_NMS(torch.tensor(boxes), torch.tensor(scores), 0.45,
                   class_nms=class_nms).numpy()
    keep_idx, keep_valid = nms_variant_single(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, max_det=boxes.shape[0],
        class_nms=class_nms)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, want)


def test_variant_nms_honors_siou():
    # the reference's NMS sets the SIoU flag but drops it when calling
    # bbox_iou (general.py:749-758), silently degrading to plain IoU —
    # golden here is an explicit greedy loop that DOES pass SIoU into
    # the reference's own bbox_iou (general.py:764 supports it)
    boxes, scores = _boxes_scores(seed=2)
    tb, ts = torch.tensor(boxes), torch.tensor(scores)
    order = torch.argsort(ts, descending=True)
    want = []
    while order.numel() > 0:
        i = order[0]
        want.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        iou = ref_bbox_iou(tb[i], tb[rest], x1y1x2y2=True, SIoU=True)
        order = rest[iou.reshape(-1) <= 0.45]
    keep_idx, keep_valid = nms_variant_single(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, max_det=boxes.shape[0],
        class_nms="SIoU")
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, np.asarray(want))


def test_variant_nms_eiou_greedy_consistency():
    # EIoU has NO reference implementation at all (general.py:744-745 sets
    # a flag that bbox_iou doesn't accept — dead upstream); golden is a
    # plain python greedy loop over OUR bbox_iou(EIoU=True), which checks
    # the scan formulation against the obvious sequential algorithm
    from dmayolo_tpu.core.iou import bbox_iou as our_iou

    boxes, scores = _boxes_scores(seed=5)
    order = np.argsort(-scores)
    want, alive = [], order.tolist()
    while alive:
        i = alive[0]
        want.append(i)
        rest = np.asarray(alive[1:], int)
        if rest.size == 0:
            break
        iou = np.asarray(our_iou(jnp.asarray(boxes[i][None]),
                                 jnp.asarray(boxes[rest]), EIoU=True))
        alive = rest[iou.reshape(-1) <= 0.45].tolist()
    keep_idx, keep_valid = nms_variant_single(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, max_det=boxes.shape[0],
        class_nms="EIoU")
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, np.asarray(want))


def _merge_reference(pred, conf_thres, iou_thres, max_det):
    """Numpy replica of non_max_suppression's single-label merge branch
    (general.py:633-718 with merge=True, redundant=True)."""
    nc = pred.shape[1] - 5
    obj = pred[:, 4:5]
    cls_scores = pred[:, 5:] * obj
    best_cls = cls_scores.argmax(1)
    best_score = cls_scores.max(1)
    m = best_score > conf_thres
    xywh = pred[m, :4]
    boxes = np.concatenate(
        [xywh[:, :2] - xywh[:, 2:4] / 2, xywh[:, :2] + xywh[:, 2:4] / 2], 1)
    scores = best_score[m]
    cls = best_cls[m]
    off = boxes + cls[:, None] * 4096.0

    def iou_mat(a, b):
        ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
        iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
        ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
        iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (aa[:, None] + ab[None, :] - inter + 1e-7)

    order = np.argsort(-scores)
    keep = []
    alive = order.tolist()
    while alive:
        i = alive[0]
        keep.append(i)
        rest = np.asarray(alive[1:], int)
        if rest.size == 0:
            break
        iou = iou_mat(off[i:i + 1], off[rest])[0]
        alive = rest[iou <= iou_thres].tolist()
    keep = np.asarray(keep[:max_det], int)
    # merge only inside the reference's 1 < n < 3000 gate (general.py:712)
    n = boxes.shape[0]
    if not (1 < n < 3000):
        return boxes[keep], scores[keep], cls[keep]
    # weighted mean over ALL candidates overlapping each kept box
    sup = iou_mat(off[keep], off) > iou_thres
    w = sup * scores[None, :]
    merged = (w @ boxes) / w.sum(1, keepdims=True)
    redundant = sup.sum(1) > 1
    return merged[redundant], scores[keep][redundant], cls[keep][redundant]


def test_merge_nms_matches_reference_math():
    rng = np.random.default_rng(3)
    n, nc = 400, 4
    xy = rng.uniform(50, 200, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    pred = np.zeros((1, n, 5 + nc), np.float32)
    pred[0, :, :2], pred[0, :, 2:4] = xy, wh
    pred[0, :, 4] = rng.uniform(0, 1, n)
    pred[0, :, 5:] = rng.dirichlet(np.ones(nc), n)
    want_boxes, want_scores, want_cls = _merge_reference(
        pred[0], 0.25, 0.45, 300)
    dets, valid = batched_nms(jnp.asarray(pred), conf_thres=0.25,
                              iou_thres=0.45, max_det=300, merge=True)
    got = np.asarray(dets)[0][np.asarray(valid)[0]]
    assert got.shape[0] == want_boxes.shape[0]
    np.testing.assert_allclose(got[:, :4], want_boxes, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(got[:, 4], want_scores, atol=1e-6)
    np.testing.assert_array_equal(got[:, 5].astype(int), want_cls)


def test_merge_false_unchanged():
    # merge must be a pure opt-in: default output identical to before
    rng = np.random.default_rng(4)
    pred = rng.uniform(0, 1, (2, 100, 9)).astype(np.float32)
    pred[..., :2] *= 100
    pred[..., 2:4] = pred[..., 2:4] * 30 + 5
    a = batched_nms(jnp.asarray(pred), conf_thres=0.1, max_det=50)
    b = batched_nms(jnp.asarray(pred), conf_thres=0.1, max_det=50, merge=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_merge_keeps_lone_detection():
    # reference gate: n == 1 means no merge and no redundant filter — the
    # single candidate must survive (unmerged)
    pred = np.zeros((1, 50, 9), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 0.9, 0.02, 0.02, 0.02]
    dets, valid = batched_nms(jnp.asarray(pred), conf_thres=0.25,
                              iou_thres=0.45, max_det=10, merge=True)
    got = np.asarray(dets)[0][np.asarray(valid)[0]]
    assert got.shape[0] == 1
    np.testing.assert_allclose(got[0, :4], [40, 40, 60, 60], atol=1e-3)


def test_merge_gate_off_above_max(monkeypatch):
    # above the gate the reference skips merging entirely: output must be
    # identical to merge=False. Lower the gate constant so a small batch
    # exercises the >= branch (different conf_thres forces a fresh trace).
    import dmayolo_tpu.core.nms as nms_mod

    monkeypatch.setattr(nms_mod, "_MERGE_GATE_MAX", 8)
    rng = np.random.default_rng(11)
    pred = rng.uniform(0, 1, (2, 120, 9)).astype(np.float32)
    pred[..., :2] *= 100
    pred[..., 2:4] = pred[..., 2:4] * 30 + 5
    a = batched_nms(jnp.asarray(pred), conf_thres=0.123, max_det=50, merge=True)
    b = batched_nms(jnp.asarray(pred), conf_thres=0.123, max_det=50, merge=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
