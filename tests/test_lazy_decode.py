"""Lazy serving decode (decode_scores/decode_at/decode_topk) parity.

The lazy path computes a fused best-class score pass, top-k's, then
decodes boxes ONLY for the K survivors (heads.decode_scores/decode_at).
It must be numerically identical to the eager decode_parts + nms_parts
front half — same candidate scores bit-for-bit (so top-k tie-breaking
matches) and the same final detections through the NMS tail.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.core.nms import nms_from_topk, nms_parts
from dmayolo_tpu.graph import DetectionModel

from test_serve_fastpath import _build


@pytest.mark.parametrize("head", ["Detect", "TDetect"])
def test_lazy_scores_bitwise_equal(head):
    model, raw = _build(head)
    _, s_eager, _ = model.decode_parts(raw)
    s_lazy = model.head.decode_scores(raw)
    np.testing.assert_array_equal(np.asarray(s_lazy), np.asarray(s_eager))


@pytest.mark.parametrize("head", ["Detect", "TDetect"])
@pytest.mark.parametrize("k", [64, 512])
def test_lazy_pipeline_matches_eager(head, k):
    model, raw = _build(head)
    b, s, c = model.decode_parts(raw)
    d0, v0 = nms_parts(b, s, c, conf_thres=0.1, iou_thres=0.45, max_det=50,
                       max_nms=k)
    tb, ts, tc = model.decode_topk(raw, k=k, conf_thres=0.1)
    d1, v1 = nms_from_topk(tb, ts, tc, iou_thres=0.45, max_det=50)
    d0, v0, d1, v1 = map(np.asarray, (d0, v0, d1, v1))
    assert (v0 == v1).all()
    np.testing.assert_allclose(d1, d0, rtol=1e-6, atol=1e-6)


def test_lazy_classmask_and_agnostic():
    model, raw = _build("Detect")
    mask = jnp.asarray(np.array([1, 0, 1, 0, 1, 1], bool))
    b, s, c = model.decode_parts(raw, class_mask=mask)
    d0, v0 = nms_parts(b, s, c, conf_thres=0.05, iou_thres=0.5, max_det=30,
                       agnostic=True, max_nms=512)
    tb, ts, tc = model.decode_topk(raw, k=512, conf_thres=0.05,
                                   class_mask=mask)
    d1, v1 = nms_from_topk(tb, ts, tc, iou_thres=0.5, max_det=30,
                           agnostic=True)
    d0, v0, d1, v1 = map(np.asarray, (d0, v0, d1, v1))
    assert (v0 == v1).all()
    np.testing.assert_allclose(d1, d0, rtol=1e-6, atol=1e-6)
    kept_cls = d1[v1][:, 5].astype(int)
    assert set(kept_cls) <= {0, 2, 4, 5}


@pytest.mark.parametrize("head", ["Detect", "TDetect"])
def test_serve_detections_matches_eager_tail(head):
    """The head-aware dispatcher == the eager fast path, both families."""
    model, raw = _build(head)
    b, s, c = model.decode_parts(raw)
    d0, v0 = nms_parts(b, s, c, conf_thres=0.1, iou_thres=0.45, max_det=40,
                       max_nms=256)
    d1, v1 = model.serve_detections(raw, conf_thres=0.1, iou_thres=0.45,
                                    max_det=40, max_nms=256)
    d0, v0, d1, v1 = map(np.asarray, (d0, v0, d1, v1))
    assert (v0 == v1).all()
    np.testing.assert_allclose(d1, d0, rtol=1e-6, atol=1e-6)


def test_decode_at_matches_gathered_eager():
    """decode_at on arbitrary indices == gathering the eager decode."""
    model, raw = _build("Detect")
    b_eager, s_eager, c_eager = model.decode_parts(raw)
    n = b_eager.shape[1]
    rng = np.random.default_rng(7)
    idx = jnp.asarray(
        rng.integers(0, n, (b_eager.shape[0], 97)), jnp.int32)
    boxes, cls = model.head.decode_at(raw, idx)
    want_b = jnp.take_along_axis(b_eager, idx[..., None], axis=1)
    want_c = jnp.take_along_axis(c_eager, idx, axis=1)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(want_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(want_c))
