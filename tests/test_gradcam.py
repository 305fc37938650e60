"""GradCAM/GradCAM++ tests.

The reference's own tool is broken (main_gradcam.py:6-7 imports modules
absent from its tree), so there is no golden to compare against; these
tests assert the mathematical contract instead: CAM is non-negative,
normalised, localised at the detection, and the split/tail graph execution
is exactly the full forward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.core.nms import batched_nms
from dmayolo_tpu.eval.gradcam import (
    cam_for_detection,
    resolve_target_layer,
    split_forward,
    tail_forward,
    upsample_cam,
)
from dmayolo_tpu.graph import DetectionModel

# mini net WITH a skip (Concat) across the split point so tail_forward's
# saved-activation path is exercised
CFG = {
    "nc": 4,
    "depth_multiple": 0.33,
    "width_multiple": 0.25,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
    ],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],   # 0: P1
        [-1, 1, "Conv", [128, 3, 2]],     # 1: P2
        [-1, 1, "C3", [128]],             # 2
        [-1, 1, "Conv", [256, 3, 2]],     # 3: P3
        [-1, 1, "C3", [256]],             # 4
        [-1, 1, "SPPF", [256, 5]],        # 5
    ],
    "head": [
        [-1, 1, "Conv", [128, 1, 1]],         # 6
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],  # 7
        [[-1, 2], 1, "Concat", [1]],          # 8: skip from layer 2
        [-1, 1, "C3", [128, "False"]],        # 9
        [[9, 5], 1, "Detect", ["nc", "anchors"]],
    ],
}


@pytest.fixture(scope="module")
def setup():
    model = DetectionModel(CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    return model, params, stats, x


def test_split_tail_equals_full_forward(setup):
    model, params, stats, x = setup
    full = model.decode(model.apply(params, stats, x))
    for layer_i in (2, 5, 9):  # before skip-save, backbone end, head
        feat, saved = split_forward(model, params, stats, x, layer_i)
        out = tail_forward(model, params, stats, feat, saved, layer_i)
        recombined = model.decode(out)
        np.testing.assert_allclose(
            np.asarray(recombined), np.asarray(full), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("method", ["gradcam", "gradcampp"])
def test_cam_contract(setup, method):
    model, params, stats, x = setup
    dec = np.asarray(model.decode(model.apply(params, stats, x)))
    # layer 9 feeds ONLY Detect scale 0 (the first 3*32*32 candidates in
    # decode order) — a det sourced from scale 1 has identically-zero
    # gradient w.r.t. layer 9, so pick the best scale-0 candidate
    n_scale0 = 3 * 32 * 32
    conf = dec[0, :n_scale0, 4] * dec[0, :n_scale0, 5:].max(-1)
    cand = int(conf.argmax())
    cls = int(dec[0, cand, 5:].argmax())
    picks = [(cand, cls), (int(np.argsort(conf)[-2]), cls)]

    cache = {}
    cam = cam_for_detection(
        model, params, stats, x, layer_i=9, cand_idx=cand, cls_idx=cls,
        method=method, _cache=cache,
    )
    assert cam.shape == (32, 32)  # layer 9 is P2: 128/4
    assert np.all(cam >= 0.0) and np.all(cam <= 1.0)
    assert np.isfinite(cam).all()
    assert cam.max() > 0.0, "CAM must be non-trivial for an above-conf det"

    # cache reuse: second detection shares the compiled grad fn
    cand2, cls2 = picks[1]
    cam2 = cam_for_detection(
        model, params, stats, x, layer_i=9, cand_idx=cand2, cls_idx=cls2,
        method=method, _cache=cache,
    )
    assert cam2.shape == cam.shape


def test_cam_localises_responsive_cell(setup):
    """The CAM for a detection must peak where the gradient actually lives:
    zeroing the feature map except the argmax CAM cell must change the
    detection's score more than zeroing a far-away cell."""
    model, params, stats, x = setup
    dec = np.asarray(model.decode(model.apply(params, stats, x)))
    n_scale0 = 3 * 32 * 32
    conf = dec[0, :n_scale0, 4] * dec[0, :n_scale0, 5:].max(-1)
    cand = int(conf.argmax())
    cls = int(dec[0, cand, 5:].argmax())
    layer_i = 9
    cam = cam_for_detection(model, params, stats, x, layer_i, cand, cls)

    feat, saved = split_forward(model, params, stats, x, layer_i)

    def score(f):
        d = model.decode(tail_forward(model, params, stats, f, saved, layer_i))
        return float(d[0, cand, 4] * d[0, cand, 5 + cls])

    base = score(feat)
    iy, ix = np.unravel_index(cam.argmax(), cam.shape)
    # far corner = the cell diagonally opposite the peak
    fy, fx = cam.shape[0] - 1 - iy, cam.shape[1] - 1 - ix

    f_peak = np.asarray(feat).copy()
    f_peak[0, iy, ix, :] = 0.0
    f_far = np.asarray(feat).copy()
    f_far[0, fy, fx, :] = 0.0
    d_peak = abs(score(jnp.asarray(f_peak)) - base)
    d_far = abs(score(jnp.asarray(f_far)) - base)
    assert d_peak >= d_far, (d_peak, d_far)


def test_cam_tdetect_anchor_free():
    """TDetect decode is (4+nc) class-prob-only; the CAM score must use
    det[4+cls] (obj implicitly 1), not the Detect layout."""
    cfg = dict(CFG)
    cfg["head"] = [
        [-1, 1, "Conv", [128, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 2], 1, "Concat", [1]],
        [-1, 1, "C3", [128, "False"]],
        [[9, 5], 1, "TDetect", ["nc"]],
    ]
    model = DetectionModel(cfg)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))

    dec = model.decode(model.apply(params, stats, x))
    dec_n = np.asarray(dec)
    assert dec_n.shape[-1] == model.nc + 4
    n_scale0 = 32 * 32  # one anchor point per cell, scale 0 first
    conf = dec_n[0, :n_scale0, 4:].max(-1)
    cand = int(conf.argmax())
    cls = int(dec_n[0, cand, 4:].argmax())

    # the CAM target score must be the class prob itself — NOT the Detect
    # (5+nc) layout applied to a (4+nc) row
    from dmayolo_tpu.eval.gradcam import detection_score

    s = float(detection_score(model, dec, jnp.int32(cand), jnp.int32(cls)))
    assert s == pytest.approx(float(dec_n[0, cand, 4 + cls]), rel=1e-6)

    cam = cam_for_detection(model, params, stats, x, layer_i=9,
                            cand_idx=cand, cls_idx=cls)
    assert cam.shape == (32, 32)
    assert np.isfinite(cam).all()


def test_resolve_target_layer(setup):
    model = setup[0]
    assert resolve_target_layer(model, "model_9_cv3_act") == 9
    assert resolve_target_layer(model, "5") == 5
    with pytest.raises(ValueError):
        resolve_target_layer(model, str(len(model.layers) - 1))  # the head


def test_upsample_cam_bilinear():
    cam = np.array([[0.0, 1.0], [1.0, 0.0]], np.float32)
    up = upsample_cam(cam, (8, 8))
    assert up.shape == (8, 8)
    assert up.min() >= -1e-6 and up.max() <= 1.0 + 1e-6
    # corners keep their source values
    assert abs(up[0, 0] - 0.0) < 1e-6 and abs(up[0, 7] - 1.0) < 1e-6


def test_nms_return_src_consistency(setup):
    """src indices must point at candidates whose decoded box/score matches
    the returned detection."""
    model, params, stats, x = setup
    dec = np.asarray(model.decode(model.apply(params, stats, x)))
    dets, valid, srcs = batched_nms(
        jnp.asarray(dec), conf_thres=0.0, iou_thres=0.45, max_det=4,
        return_src=True,
    )
    dets, valid, srcs = map(np.asarray, (dets, valid, srcs))
    for j in range(int(valid[0].sum())):
        cand = srcs[0, j]
        cx, cy, w, h = dec[0, cand, :4]
        x1, y1 = cx - w / 2, cy - h / 2
        np.testing.assert_allclose(
            dets[0, j, :2], [x1, y1], rtol=1e-4, atol=1e-3
        )
        cls = int(dets[0, j, 5])
        conf = dec[0, cand, 4] * dec[0, cand, 5 + cls]
        np.testing.assert_allclose(dets[0, j, 4], conf, rtol=1e-4, atol=1e-5)
