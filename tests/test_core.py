"""Unit tests for dmayolo_tpu.core — geometry, IoU family, batched NMS."""
import numpy as np
import pytest

import jax.numpy as jnp

from dmayolo_tpu.core import (
    batched_nms,
    bbox_iou,
    box_iou_matrix,
    clip_boxes,
    letterbox_params,
    nms_single,
    scale_boxes,
    wh_iou,
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyxy2xywhn,
)

rng = np.random.default_rng(0)


def random_boxes_xyxy(n, lo=0, hi=640):
    xy1 = rng.uniform(lo, hi - 2, size=(n, 2))
    wh = rng.uniform(1, (hi - lo) / 4, size=(n, 2))
    return np.concatenate([xy1, np.minimum(xy1 + wh, hi)], axis=1).astype(np.float32)


class TestBoxes:
    def test_xywh_roundtrip(self):
        b = random_boxes_xyxy(100)
        out = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(b))))
        np.testing.assert_allclose(out, b, atol=1e-4)

    def test_normalised_roundtrip(self):
        b = random_boxes_xyxy(50)
        n = xyxy2xywhn(jnp.asarray(b), w=640, h=640)
        back = np.asarray(xywh2xyxy(n) * 640)
        np.testing.assert_allclose(back, b, atol=1e-3)

    def test_xywhn2xyxy_with_pad(self):
        x = jnp.asarray([[0.5, 0.5, 0.25, 0.5]])
        out = np.asarray(xywhn2xyxy(x, w=100, h=200, padw=10, padh=20))
        np.testing.assert_allclose(out, [[37.5 + 10, 50 + 20, 62.5 + 10, 150 + 20]])

    def test_clip(self):
        b = jnp.asarray([[-5.0, -5.0, 700.0, 700.0]])
        out = np.asarray(clip_boxes(b, (480, 640)))
        np.testing.assert_allclose(out, [[0, 0, 640, 480]])

    def test_scale_boxes_inverts_letterbox(self):
        # a 480x640 image letterboxed into 640x640 (gain 1, pad (0, 80))
        det = jnp.asarray([[100.0, 120.0, 200.0, 220.0]])
        out = np.asarray(scale_boxes((640, 640), det, (480, 640)))
        np.testing.assert_allclose(out, [[100.0, 40.0, 200.0, 140.0]])

    def test_letterbox_params(self):
        new_unpad, ratio, (dw, dh) = letterbox_params((480, 640), 640, auto=False)
        assert new_unpad == (640, 480)
        assert ratio == (1.0, 1.0)
        assert (dw, dh) == (0.0, 80.0)
        # stride-multiple auto mode: 480 already divides 32 -> no pad
        new_unpad, ratio, (dw, dh) = letterbox_params((480, 640), 640, auto=True, stride=32)
        assert new_unpad == (640, 480)
        assert (dw, dh) == (0.0, 0.0)
        # 500 tall: pad 140 % 32 = 12 total -> 6 per side
        new_unpad, ratio, (dw, dh) = letterbox_params((500, 640), 640, auto=True, stride=32)
        assert new_unpad == (640, 500)
        assert (dw, dh) == (0.0, 6.0)


class TestIoU:
    def test_identity(self):
        b = jnp.asarray(random_boxes_xyxy(20))
        iou = np.asarray(bbox_iou(b, b))
        np.testing.assert_allclose(iou, 1.0, atol=1e-4)

    def test_disjoint(self):
        a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.asarray([[20.0, 20.0, 30.0, 30.0]])
        assert float(bbox_iou(a, b)[0]) == pytest.approx(0.0, abs=1e-6)
        # GIoU must be negative for disjoint boxes
        assert float(bbox_iou(a, b, GIoU=True)[0]) < 0

    def test_known_half_overlap(self):
        a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.asarray([[5.0, 0.0, 15.0, 10.0]])
        assert float(bbox_iou(a, b)[0]) == pytest.approx(1 / 3, rel=1e-3)

    def test_variant_ordering(self):
        # all penalised variants <= IoU; equal boxes give ~IoU
        a = jnp.asarray(random_boxes_xyxy(50))
        b = jnp.asarray(random_boxes_xyxy(50))
        iou = np.asarray(bbox_iou(a, b))
        for kw in ({"GIoU": True}, {"DIoU": True}, {"CIoU": True}, {"EIoU": True}):
            v = np.asarray(bbox_iou(a, b, **kw))
            assert (v <= iou + 1e-5).all()

    def test_matrix_matches_elementwise(self):
        a = jnp.asarray(random_boxes_xyxy(8))
        b = jnp.asarray(random_boxes_xyxy(5))
        m = np.asarray(box_iou_matrix(a, b))
        for i in range(8):
            for j in range(5):
                e = float(bbox_iou(a[i], b[j]))
                assert m[i, j] == pytest.approx(e, abs=2e-3)

    def test_wh_iou(self):
        wh = jnp.asarray([[10.0, 10.0], [20.0, 20.0]])
        m = np.asarray(wh_iou(wh, wh))
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)
        assert m[0, 1] == pytest.approx(100 / 400, rel=1e-3)

    def test_siou_against_reference_formula(self):
        """Golden check vs reference torch bbox_iou (utils/general.py:764-824)."""
        torch = pytest.importorskip("torch")
        from tests.ref_compat import setup_reference_imports

        if not setup_reference_imports():
            pytest.skip("reference unavailable")
        try:
            from utils.metrics import bbox_iou as ref_bbox_iou  # reference repo
        except Exception:
            pytest.skip("reference metrics import failed")

        a = random_boxes_xyxy(64)
        b = random_boxes_xyxy(64)
        for kw in ({}, {"GIoU": True}, {"DIoU": True}, {"CIoU": True}):
            ours = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b), **kw))
            ref = (
                ref_bbox_iou(torch.tensor(a).T, torch.tensor(b), x1y1x2y2=True, **kw)
                .numpy()
                .reshape(-1)
            )
            np.testing.assert_allclose(ours, ref, atol=1e-4)


def np_greedy_nms(boxes, scores, thres):
    """Independent numpy re-derivation of greedy NMS for verification."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter + 1e-7)
        order = rest[iou <= thres]
    return np.asarray(keep)


class TestNMS:
    def test_single_matches_numpy(self):
        boxes = random_boxes_xyxy(200)
        scores = rng.uniform(0.01, 1.0, 200).astype(np.float32)
        expected = np_greedy_nms(boxes, scores, 0.45)
        keep_idx, keep_valid = nms_single(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 300)
        got = np.asarray(keep_idx)[np.asarray(keep_valid)]
        np.testing.assert_array_equal(got, expected)

    def test_single_max_det_truncates(self):
        boxes = random_boxes_xyxy(100)
        scores = rng.uniform(0.01, 1.0, 100).astype(np.float32)
        keep_idx, keep_valid = nms_single(jnp.asarray(boxes), jnp.asarray(scores), 0.99, 10)
        assert int(np.asarray(keep_valid).sum()) == 10

    def _fake_prediction(self, b=2, n=400, nc=10):
        xy = rng.uniform(100, 500, size=(b, n, 2))
        wh = rng.uniform(8, 60, size=(b, n, 2))
        obj = rng.uniform(0, 1, size=(b, n, 1))
        cls = rng.dirichlet(np.ones(nc), size=(b, n))
        return np.concatenate([xy, wh, obj, cls], axis=2).astype(np.float32)

    def test_batched_shapes_and_validity(self):
        pred = self._fake_prediction()
        dets, valid = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45)
        assert dets.shape == (2, 300, 6)
        assert valid.shape == (2, 300)
        dets, valid = np.asarray(dets), np.asarray(valid)
        # valid dets have conf >= threshold and sane classes
        assert (dets[valid][:, 4] >= 0.25).all()
        assert (dets[valid][:, 5] >= 0).all() and (dets[valid][:, 5] <= 9).all()
        # invalid rows zeroed
        assert (dets[~valid] == 0).all()

    def test_batched_matches_reference_pipeline(self):
        """Same candidates+order as reference non_max_suppression on random preds."""
        torch = pytest.importorskip("torch")
        from tests.ref_compat import setup_reference_imports

        if not setup_reference_imports():
            pytest.skip("reference unavailable")
        try:
            from utils.general import non_max_suppression as ref_nms
        except Exception:
            pytest.skip("reference general import failed")

        pred = self._fake_prediction(b=2, n=300, nc=10)
        ref_out = ref_nms(torch.tensor(pred), conf_thres=0.25, iou_thres=0.45, multi_label=False)
        dets, valid = batched_nms(
            jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, multi_label=False
        )
        dets, valid = np.asarray(dets), np.asarray(valid)
        for i, r in enumerate(ref_out):
            ours = dets[i][valid[i]]
            r = r.numpy()
            assert ours.shape[0] == r.shape[0]
            np.testing.assert_allclose(ours[:, :5], r[:, :5], atol=1e-3)
            np.testing.assert_array_equal(ours[:, 5].astype(int), r[:, 5].astype(int))

    def test_multi_label_expansion(self):
        pred = self._fake_prediction(b=1, n=100, nc=5)
        pred[0, 0, 4] = 1.0
        pred[0, 0, 5:] = 0.9  # several classes above threshold on one box
        dets, valid = batched_nms(
            jnp.asarray(pred), conf_thres=0.5, iou_thres=0.45, multi_label=True
        )
        dets, valid = np.asarray(dets), np.asarray(valid)
        box0 = pred[0, 0, :2]
        got = dets[0][valid[0]]
        close = np.abs((got[:, 0] + got[:, 2]) / 2 - box0[0]) < 1.0
        assert len(np.unique(got[close][:, 5])) >= 2  # same box kept for multiple classes
