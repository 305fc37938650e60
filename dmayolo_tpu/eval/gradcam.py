"""Grad-CAM / Grad-CAM++ for the detection models.

The reference ships `main_gradcam.py` (imports `models.gradcam` /
`models.yolov5_object_detector`, main_gradcam.py:6-7) but those modules do
not exist in its tree — the tool is broken upstream.  This is a working
TPU-native re-design: instead of torch forward/backward hooks, the graph is
split at the target layer and `jax.grad` differentiates the detection score
of each NMS-kept box w.r.t. that layer's activation.  Earlier-layer skip
activations are held constant, which matches hook semantics exactly (only
paths *through* the target activation contribute to d score / d activation).

CAM definitions follow the published formulations the reference tool wraps:
  gradcam   : w_c = GAP(dS/dA_c);            cam = relu(sum_c w_c A_c)
  gradcampp : alpha = g^2 / (2 g^2 + sum_HW A g^3), w_c = sum(alpha relu(g)),
              cam as above.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import make_vars


def split_forward(model, params, stats, x, layer_i: int, fused: bool = False):
    """Run layers 0..layer_i. Returns (feat_out_of_layer_i, saved_acts)."""
    v = make_vars(params, stats, dtype=jnp.float32, fused=fused)
    y: Dict[int, jax.Array] = {}
    out = x
    for mod in model.layers[: layer_i + 1]:
        f = mod.f
        if f != -1:
            out = (
                y[f % mod.i]
                if isinstance(f, int)
                else [out if j == -1 else y[j % mod.i] for j in f]
            )
        out = mod(v, out)
        if mod.i in model.save:
            y[mod.i] = out
    return out, y


def tail_forward(model, params, stats, feat, saved: Dict[int, jax.Array],
                 layer_i: int, fused: bool = False):
    """Run layers layer_i+1.. from `feat`, reading skip inputs from `saved`
    except the target layer's own entry (which must stay differentiable)."""
    v = make_vars(params, stats, dtype=jnp.float32, fused=fused)
    y = dict(saved)
    if layer_i in model.save:
        y[layer_i] = feat
    out = feat
    for mod in model.layers[layer_i + 1:]:
        f = mod.f
        if f != -1:
            out = (
                y[f % mod.i]
                if isinstance(f, int)
                else [out if j == -1 else y[j % mod.i] for j in f]
            )
        out = mod(v, out)
        if mod.i in model.save:
            y[mod.i] = out
    return out


def detection_score(model, dec, cand, cls):
    """NMS-confidence of one decoded candidate: obj*cls for Detect
    (5+nc decode rows); class prob alone for TDetect's (4+nc) rows —
    obj is implicitly 1 there (cf. detect.py's obj=1 column insert)."""
    det = dec[0, cand]
    if dec.shape[-1] == model.nc + 4:
        return jnp.take(det, 4 + cls)
    return det[4] * jnp.take(det, 5 + cls)


def cam_for_detection(model, params, stats, x, layer_i: int, cand_idx: int,
                      cls_idx: int, method: str = "gradcam",
                      fused: bool = False,
                      _cache: Optional[dict] = None) -> np.ndarray:
    """CAM heatmap (H_feat, W_feat) in [0, 1] for one kept detection.

    Args:
        x: (1, H, W, 3) float32 input in [0, 1].
        cand_idx: flat candidate index of the detection in decode order.
        cls_idx: its class id (score = obj * cls like the NMS confidence).
    """
    _cache = _cache if _cache is not None else {}
    # feat/saved are per-input; the compiled grad fn is shared across every
    # detection AND every same-shaped image (params/stats are jit ARGUMENTS,
    # not closure constants — constants bake MBs into the executable)
    # identity check holds a strong reference to x: a bare id() key can be
    # reused by CPython for the NEXT image once the previous array is
    # garbage-collected, silently serving stale activations
    if _cache.get("x_obj") is not x or _cache.get("layer_i") != layer_i:
        feat, saved = split_forward(model, params, stats, x, layer_i, fused)
        saved = {k: jax.lax.stop_gradient(v) for k, v in saved.items()}
        _cache["x_obj"], _cache["layer_i"] = x, layer_i
        _cache["feat"], _cache["saved"] = feat, saved
    feat, saved = _cache["feat"], _cache["saved"]

    if "grad_fn" not in _cache:

        def score_fn(p, s, f, sv, cand, cls):
            dec = model.decode(tail_forward(model, p, s, f, sv, layer_i, fused))
            return detection_score(model, dec, cand, cls)

        _cache["grad_fn"] = jax.jit(jax.grad(score_fn, argnums=2))
    grad_fn = _cache["grad_fn"]

    grads = grad_fn(params, stats, feat, saved,
                    jnp.int32(cand_idx), jnp.int32(cls_idx))
    a = np.asarray(feat[0], np.float32)
    g = np.asarray(grads[0], np.float32)

    if method == "gradcampp":
        g2, g3 = g * g, g * g * g
        denom = 2.0 * g2 + np.sum(a * g3, axis=(0, 1), keepdims=True)
        alpha = np.where(np.abs(denom) > 1e-12, g2 / (denom + 1e-12), 0.0)
        w = np.sum(alpha * np.maximum(g, 0.0), axis=(0, 1))
    else:
        w = g.mean(axis=(0, 1))

    cam = np.maximum((a * w).sum(axis=-1), 0.0)
    rng = cam.max() - cam.min()
    if rng > 1e-12:
        cam = (cam - cam.min()) / rng
    else:
        cam = np.zeros_like(cam)
    return cam


def resolve_target_layer(model, target: str) -> int:
    """Map a reference-style layer address ('model_17_cv3_act') or a plain
    index string to a layer index, validated against the graph."""
    t = target.strip()
    if t.startswith("model_"):
        t = t.split("_")[1]
    i = int(t)
    if not 0 <= i < len(model.layers) - 1:
        raise ValueError(
            f"target layer {i} out of range (0..{len(model.layers) - 2}; "
            "the head itself cannot be a CAM target)"
        )
    return i


def upsample_cam(cam: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear cam -> (H, W) without requiring cv2."""
    h, w = cam.shape
    th, tw = size
    yy = (np.arange(th) + 0.5) * h / th - 0.5
    xx = (np.arange(tw) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(yy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xx).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xx - x0, 0.0, 1.0)[None, :]
    top = cam[y0][:, x0] * (1 - fx) + cam[y0][:, x1] * fx
    bot = cam[y1][:, x0] * (1 - fx) + cam[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy
