"""Serving fast path (decode_parts + nms_parts) == protocol path parity.

The fast path fuses per-scale decode and never materialises the
(B, N, 5+nc) prediction tensor; it must produce identical detections to
decode -> batched_nms(multi_label=False) for both head families.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.core.nms import batched_nms, nms_parts
from dmayolo_tpu.graph import DetectionModel

ANCHORS = [
    [10, 13, 16, 30, 33, 23],
    [30, 61, 62, 45, 59, 119],
    [116, 90, 156, 198, 373, 326],
]

BASE = {
    "nc": 6,
    "depth_multiple": 0.33,
    "width_multiple": 0.25,
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "SPPF", [512, 5]],
    ],
}


def _build(head):
    cfg = dict(BASE)
    cfg["anchors"] = ANCHORS
    if head == "Detect":
        cfg["head"] = [[[4, 6, 7], 1, "Detect", ["nc", "anchors"]]]
    else:
        cfg["head"] = [[[4, 6, 7], 1, "TDetect", ["nc"]]]
    model = DetectionModel(cfg)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (3, 128, 128, 3)).astype(np.float32))
    raw = model.apply(params, stats, x)
    return model, raw


def _protocol(model, raw, **kw):
    dec = model.decode(raw)
    if dec.shape[-1] == model.nc + 4:  # TDetect: obj=1 column
        dec = jnp.concatenate(
            [dec[..., :4], jnp.ones_like(dec[..., :1]), dec[..., 4:]], axis=-1
        )
    return batched_nms(dec, multi_label=False, max_nms=30000, **kw)


@pytest.mark.parametrize("head", ["Detect", "TDetect"])
def test_fastpath_matches_protocol(head):
    model, raw = _build(head)
    d0, v0 = _protocol(model, raw, conf_thres=0.1, iou_thres=0.45, max_det=50)
    b, s, c = model.decode_parts(raw)
    d1, v1 = nms_parts(b, s, c, conf_thres=0.1, iou_thres=0.45, max_det=50,
                       max_nms=30000)
    d0, v0, d1, v1 = map(np.asarray, (d0, v0, d1, v1))
    assert (v0 == v1).all()
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-4)


def test_fastpath_agnostic_and_classmask():
    model, raw = _build("Detect")
    mask = jnp.asarray(np.array([1, 0, 1, 0, 1, 1], bool))
    d0, v0 = _protocol(model, raw, conf_thres=0.05, iou_thres=0.5,
                       max_det=30, agnostic=True, class_mask=mask)
    b, s, c = model.decode_parts(raw, class_mask=mask)
    d1, v1 = nms_parts(b, s, c, conf_thres=0.05, iou_thres=0.5, max_det=30,
                       agnostic=True, max_nms=30000)
    d0, v0, d1, v1 = map(np.asarray, (d0, v0, d1, v1))
    assert (v0 == v1).all()
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-4)
    # masked classes never appear
    kept_cls = d1[np.asarray(v1)][:, 5].astype(int)
    assert set(kept_cls) <= {0, 2, 4, 5}


def test_fastpath_backends_agree():
    model, raw = _build("Detect")
    b, s, c = model.decode_parts(raw)
    outs = [
        np.asarray(nms_parts(b, s, c, conf_thres=0.1, max_det=20,
                             max_nms=512, backend=bk)[0])
        for bk in ("matrix", "scan")
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
