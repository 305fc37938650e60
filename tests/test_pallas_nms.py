"""Pallas NMS kernel parity vs the scan reference implementation
(interpret mode on CPU; the real-TPU path is exercised by bench/val)."""
import numpy as np

import jax.numpy as jnp

from dmayolo_tpu.core.nms import NEG_INF, nms_single
from dmayolo_tpu.core.pallas_nms import pallas_batched_nms_core


def test_pallas_nms_matches_scan():
    rng = np.random.default_rng(1)
    B, K = 4, 256
    xy1 = rng.uniform(0, 500, (B, K, 2))
    wh = rng.uniform(4, 150, (B, K, 2))
    boxes = np.concatenate([xy1, xy1 + wh], -1).astype(np.float32)
    scores = rng.uniform(0.001, 1.0, (B, K)).astype(np.float32)
    scores[scores < 0.4] = NEG_INF

    pi, pv = pallas_batched_nms_core(
        jnp.asarray(boxes), jnp.asarray(scores), iou_thres=0.5, max_det=64,
        interpret=True,
    )
    for b in range(B):
        ri, rv = nms_single(jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.5, 64)
        np.testing.assert_array_equal(
            np.asarray(ri)[np.asarray(rv)], np.asarray(pi[b])[np.asarray(pv[b])]
        )


def test_pallas_nms_all_masked():
    boxes = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (1, 128, 4)).astype(np.float32))
    scores = jnp.full((1, 128), NEG_INF, jnp.float32)
    pi, pv = pallas_batched_nms_core(boxes, scores, iou_thres=0.5, max_det=16, interpret=True)
    assert not bool(np.asarray(pv).any())


def test_matrix_nms_matches_scan():
    from dmayolo_tpu.core.nms import nms_matrix

    rng = np.random.default_rng(7)
    B, K = 3, 192
    xy1 = rng.uniform(0, 400, (B, K, 2))
    wh = rng.uniform(4, 160, (B, K, 2))
    boxes = np.concatenate([xy1, xy1 + wh], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1, (B, K)).astype(np.float32))[:, ::-1].copy()
    scores[scores < 0.3] = NEG_INF
    mi, mv = nms_matrix(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 80)
    for b in range(B):
        ri, rv = nms_single(jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.45, 80)
        a = np.sort(np.asarray(ri)[np.asarray(rv)])
        c = np.sort(np.asarray(mi[b])[np.asarray(mv[b])])
        np.testing.assert_array_equal(a, c)


def test_matrix_nms_blocked_matches_scan():
    """K > block triggers the block-sequential path (incl. a ragged tail);
    must stay exact greedy NMS."""
    from dmayolo_tpu.core.nms import nms_matrix_blocked

    rng = np.random.default_rng(11)
    B, K, block = 3, 700, 128  # 5 full blocks + 60-wide tail
    xy1 = rng.uniform(0, 600, (B, K, 2))
    wh = rng.uniform(4, 200, (B, K, 2))
    boxes = np.concatenate([xy1, xy1 + wh], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1, (B, K)).astype(np.float32))[:, ::-1].copy()
    scores[scores < 0.2] = NEG_INF
    mi, mv = nms_matrix_blocked(jnp.asarray(boxes), jnp.asarray(scores), 0.45,
                                300, block=block)
    for b in range(B):
        ri, rv = nms_single(jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.45, 300)
        a = np.sort(np.asarray(ri)[np.asarray(rv)])
        c = np.sort(np.asarray(mi[b])[np.asarray(mv[b])])
        np.testing.assert_array_equal(a, c)


def test_matrix_nms_blocked_cross_block_chain():
    """Suppression chains that span block boundaries must resolve exactly."""
    from dmayolo_tpu.core.nms import nms_matrix_blocked

    K, block = 96, 32
    boxes = np.zeros((1, K, 4), np.float32)
    for i in range(K):
        boxes[0, i] = [i * 5, 0, i * 5 + 10, 10]  # 50%-overlap chain across blocks
    scores = np.linspace(1, 0.5, K, dtype=np.float32)[None]
    mi, mv = nms_matrix_blocked(jnp.asarray(boxes), jnp.asarray(scores), 0.3, K,
                                block=block)
    ri, rv = nms_single(jnp.asarray(boxes[0]), jnp.asarray(scores[0]), 0.3, K)
    np.testing.assert_array_equal(
        np.sort(np.asarray(ri)[np.asarray(rv)]),
        np.sort(np.asarray(mi[0])[np.asarray(mv[0])]),
    )


def test_batched_nms_matrix_backend_large_k():
    """batched_nms(backend='matrix') at K past the block threshold returns
    the same detections as the scan backend."""
    from dmayolo_tpu.core.nms import batched_nms

    rng = np.random.default_rng(3)
    b, n, nc = 2, 1500, 10
    xy = rng.uniform(100, 500, size=(b, n, 2))
    wh = rng.uniform(8, 60, size=(b, n, 2))
    obj = rng.uniform(0, 1, size=(b, n, 1))
    cls = rng.dirichlet(np.ones(nc), size=(b, n))
    pred = jnp.asarray(np.concatenate([xy, wh, obj, cls], axis=2).astype(np.float32))
    ds, vs = batched_nms(pred, conf_thres=0.05, iou_thres=0.45, backend="scan")
    dm, vm = batched_nms(pred, conf_thres=0.05, iou_thres=0.45, backend="matrix")
    for i in range(b):
        a = np.asarray(ds[i])[np.asarray(vs[i])]
        c = np.asarray(dm[i])[np.asarray(vm[i])]
        np.testing.assert_allclose(
            a[np.lexsort(a.T)], c[np.lexsort(c.T)], rtol=1e-6, atol=1e-6
        )


def test_matrix_nms_deep_chain():
    from dmayolo_tpu.core.nms import nms_matrix

    K = 64
    boxes = np.zeros((1, K, 4), np.float32)
    for i in range(K):
        boxes[0, i] = [i * 5, 0, i * 5 + 10, 10]  # 50% overlap chain
    scores = np.linspace(1, 0.5, K, dtype=np.float32)[None]
    mi, mv = nms_matrix(jnp.asarray(boxes), jnp.asarray(scores), 0.3, K)
    ri, rv = nms_single(jnp.asarray(boxes[0]), jnp.asarray(scores[0]), 0.3, K)
    np.testing.assert_array_equal(
        np.sort(np.asarray(ri)[np.asarray(rv)]),
        np.sort(np.asarray(mi[0])[np.asarray(mv[0])]),
    )
