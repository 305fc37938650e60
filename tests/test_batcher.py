"""Micro-batching serving core (serve/batcher.py).

Correctness oracle: the batcher's coalesced-batch output must be
identical to running the same serve program one image at a time (batch
invariance of forward+decode+NMS), after the same letterbox-inverse
mapping. Also locks in coalescing, bucket padding, error propagation,
and clean shutdown.
"""
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.core.nms import nms_parts
from dmayolo_tpu.data.augment import letterbox
from dmayolo_tpu.eval.validator import _scale_to_native
from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.nn.fuse import fuse_params
from dmayolo_tpu.serve.batcher import MicroBatcher, _buckets

CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.25,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 2, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "Conv", [512, 3, 2]],
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]],
}
IMGSZ = 128


@pytest.fixture(scope="module")
def batcher():
    model = DetectionModel(CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    b = MicroBatcher(model, params, stats, imgsz=IMGSZ, max_batch=4,
                     max_wait_ms=200.0, conf_thres=0.01, max_nms=256,
                     dtype=jnp.float32)
    yield b
    b.close()


def _oracle(batcher, img):
    """Same program, batch 1, same host-side mapping."""
    lb = letterbox(img, (IMGSZ, IMGSZ), auto=False)[0]
    x = jnp.asarray(lb[None])
    xf = x.astype(jnp.float32) / 255.0
    raw = batcher.model.apply(batcher.params, batcher.stats, xf,
                              fused=True, dtype=jnp.float32)
    boxes, scores, cls = batcher.model.decode_parts(raw)
    dets, valid = nms_parts(boxes, scores, cls, conf_thres=0.01,
                            iou_thres=0.45, max_det=300,
                            max_nms=min(256, boxes.shape[1]), backend="matrix")
    d = np.asarray(dets)[0][np.asarray(valid)[0]].copy()
    d[:, :4] = _scale_to_native(d[:, :4], (IMGSZ, IMGSZ), img.shape[:2])
    return d


def _imgs(n, seed=0):
    rng = np.random.default_rng(seed)
    # mixed landscape/portrait native sizes to exercise the inverse mapping
    sizes = [(97, 160), (160, 97), (128, 128), (77, 203)]
    return [rng.integers(0, 255, sizes[i % 4] + (3,), dtype=np.uint8)
            for i in range(n)]


def test_coalesced_batch_matches_single(batcher):
    imgs = _imgs(4)
    reqs = [batcher.submit(im) for im in imgs]
    got = [r.result(timeout=120) for r in reqs]
    assert batcher.stats_counters["batch_hist"][4] >= 1, (
        "4 queued requests should ride one batch, got "
        f"{dict(batcher.stats_counters['batch_hist'])}")
    for im, g in zip(imgs, got):
        want = _oracle(batcher, im)
        assert g.shape == want.shape
        np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-4)


def test_padded_bucket(batcher):
    # 3 requests -> bucket 4: padded row must not leak into results
    before = batcher.stats_counters["padded_rows"]
    imgs = _imgs(3, seed=1)
    got = [r.result(timeout=120) for r in [batcher.submit(im) for im in imgs]]
    assert batcher.stats_counters["padded_rows"] > before
    for im, g in zip(imgs, got):
        np.testing.assert_allclose(g, _oracle(batcher, im), rtol=1e-5, atol=1e-4)


def test_concurrent_threads(batcher):
    imgs = _imgs(8, seed=2)
    out = [None] * len(imgs)

    def worker(i):
        out[i] = batcher(imgs[i], timeout=120)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for im, g in zip(imgs, out):
        np.testing.assert_allclose(g, _oracle(batcher, im), rtol=1e-5, atol=1e-4)


def test_bad_input_rejected_and_batcher_survives(batcher):
    with pytest.raises(ValueError):
        batcher.submit(np.zeros((10, 10), np.uint8))  # not HWC
    with pytest.raises(ValueError):
        batcher.submit(np.zeros((0, 10, 3), np.uint8))  # empty dim
    with pytest.raises(ValueError):
        batcher.submit(np.zeros((10, 10, 3), np.float32))  # not uint8
    # still serving after the rejections
    im = _imgs(1, seed=3)[0]
    np.testing.assert_allclose(batcher(im, timeout=120), _oracle(batcher, im),
                               rtol=1e-5, atol=1e-4)


def test_preprocess_error_isolated_to_its_request(batcher):
    # an image that passes submit() but fails inside letterbox (extreme
    # aspect ratio -> 0-height resize) must fail ONLY its own request,
    # not the co-riders sharing its batch
    good = _imgs(2, seed=4)
    bad = np.zeros((1, 40000, 3), np.uint8)
    reqs = [batcher.submit(good[0]), batcher.submit(bad),
            batcher.submit(good[1])]
    a = reqs[0].result(timeout=120)
    with pytest.raises(Exception):
        reqs[1].result(timeout=120)
    b = reqs[2].result(timeout=120)
    np.testing.assert_allclose(a, _oracle(batcher, good[0]), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(b, _oracle(batcher, good[1]), rtol=1e-5, atol=1e-4)


def test_buckets():
    assert _buckets(1) == [1]
    assert _buckets(4) == [1, 2, 4]
    assert _buckets(6) == [1, 2, 4, 6]
    assert _buckets(32) == [1, 2, 4, 8, 16, 32]


def test_close_then_submit_raises():
    model = DetectionModel(CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    b = MicroBatcher(model, params, stats, imgsz=IMGSZ, max_batch=2,
                     max_wait_ms=1.0, dtype=jnp.float32)
    b.close()
    assert not b._thread.is_alive()
    with pytest.raises(RuntimeError):
        b.submit(np.zeros((32, 32, 3), np.uint8))
    b.close()  # idempotent
