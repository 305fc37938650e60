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
