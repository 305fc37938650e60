"""Edge-case regressions from the round-2 self-review of core/nms.py."""
import numpy as np
import pytest

import jax.numpy as jnp

from dmayolo_tpu.core.nms import batched_nms, nms_parts


def _pred(rows):
    # rows: [cx, cy, w, h, obj, c0..] -> (1, N, 5+nc)
    return jnp.asarray(np.asarray(rows, np.float32)[None])


def test_single_label_class_filter_drops_whole_detection():
    # reference picks the best class FIRST, then the classes filter drops
    # the whole detection (general.py:683-693): a box whose best class is
    # excluded must NOT be re-emitted with its best allowed class
    pred = _pred([[100, 100, 40, 40, 0.9, 0.9, 0.5]])
    mask = jnp.asarray([False, True])  # keep only class 1
    dets, valid = batched_nms(pred, conf_thres=0.25, iou_thres=0.45,
                              max_det=10, class_mask=mask)
    assert not bool(np.asarray(valid).any()), np.asarray(dets)[0][:1]

    # a box whose best class IS allowed passes through unchanged
    pred2 = _pred([[100, 100, 40, 40, 0.9, 0.5, 0.9]])
    dets2, valid2 = batched_nms(pred2, conf_thres=0.25, iou_thres=0.45,
                                max_det=10, class_mask=mask)
    d = np.asarray(dets2)[0][np.asarray(valid2)[0]]
    assert len(d) == 1 and int(d[0, 5]) == 1


def test_multi_label_class_filter_keeps_allowed_pairs():
    # multi-label: per-(box,class) rows — the allowed class of the same box
    # IS kept (that row survives the reference's filter)
    pred = _pred([[100, 100, 40, 40, 0.9, 0.9, 0.5]])
    mask = jnp.asarray([False, True])
    dets, valid = batched_nms(pred, conf_thres=0.25, iou_thres=0.45,
                              max_det=10, class_mask=mask, multi_label=True)
    d = np.asarray(dets)[0][np.asarray(valid)[0]]
    assert len(d) == 1 and int(d[0, 5]) == 1 and abs(d[0, 4] - 0.45) < 1e-3


@pytest.mark.parametrize("backend", ["scan", "matrix"])
def test_small_candidate_count_fixed_width(backend):
    # K < max_det (tiny decode or max_nms < max_det) must still produce the
    # fixed (B, max_det) output width on every backend
    rng = np.random.default_rng(0)
    n = 17
    boxes = jnp.asarray(rng.uniform(0, 600, (2, n, 4)).astype(np.float32))
    boxes = jnp.concatenate([boxes[..., :2], boxes[..., :2] + 30], -1)
    scores = jnp.asarray(rng.uniform(0.3, 0.9, (2, n)).astype(np.float32))
    cls = jnp.zeros((2, n), jnp.float32)
    dets, valid = nms_parts(boxes, scores, cls, conf_thres=0.25,
                            iou_thres=0.45, max_det=300, max_nms=512,
                            backend=backend)
    assert dets.shape == (2, 300, 6)
    assert valid.shape == (2, 300)
    assert 0 < int(np.asarray(valid).sum()) <= 2 * n


def test_small_candidate_count_fixed_width_pallas():
    # pallas core (interpret mode on CPU) pads to max_det as well
    from dmayolo_tpu.core.pallas_nms import pallas_batched_nms_core

    rng = np.random.default_rng(0)
    n = 17
    boxes = jnp.asarray(rng.uniform(0, 600, (2, n, 4)).astype(np.float32))
    boxes = jnp.concatenate([boxes[..., :2], boxes[..., :2] + 30], -1)
    scores = jnp.asarray(rng.uniform(0.3, 0.9, (2, n)).astype(np.float32))
    keep_idx, keep_valid = pallas_batched_nms_core(
        boxes, scores, iou_thres=0.45, max_det=300, interpret=True)
    assert keep_idx.shape == (2, 300) and keep_valid.shape == (2, 300)
    assert 0 < int(np.asarray(keep_valid).sum()) <= 2 * n


def test_candidate_topk_exact_and_sorted():
    # _top_k_candidates (approx_max_k at recall 1.0) feeds BOTH nms backends;
    # the scan backend's greedy suppression assumes candidates arrive sorted
    # by descending score, and the protocol requires exact top-k. Guard both
    # invariants against dense, sparse (NEG_INF-filled), and heavily tied
    # score fields.
    import jax

    from dmayolo_tpu.core.nms import NEG_INF, _top_k_candidates

    rng = np.random.default_rng(7)
    dense = rng.uniform(size=(4, 3000)).astype(np.float32)
    sparse = np.where(rng.uniform(size=(4, 3000)) < 0.03, dense, NEG_INF
                      ).astype(np.float32)
    tied = np.repeat(rng.uniform(size=(4, 300)).astype(np.float32), 10, axis=1)
    for field in (dense, sparse, tied):
        x = jnp.asarray(field)
        v, i = _top_k_candidates(x, 512)
        v_ref, _ = jax.lax.top_k(x, 512)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        v = np.asarray(v)
        assert (v[:, :-1] >= v[:, 1:]).all(), "candidates must be score-sorted"
        # indices must actually address the returned values
        np.testing.assert_array_equal(
            np.take_along_axis(field, np.asarray(i), axis=1), v)
