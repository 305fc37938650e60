"""Exported-artifact inference backends for detect.py.

Reference surface: detect.py:96-141 — its DetectMultiBackend runs .pt,
ONNX, SavedModel, and TFLite weights through one CLI.  Ours runs the
artifacts export.py actually produces in this env: native .npz / imported
.pt (handled by load_model_from_checkpoint), plus the three exported
program formats:

  *.stablehlo      jax.export serialized program (runs via jax on any
                   jax backend — the TPU-native interchange format)
  *_saved_model/   jax2tf SavedModel (runs via tensorflow)
  *.tflite         TFLite flatbuffer with flex ops (runs via tf.lite)

Every exported program already contains preprocessing (uint8 -> /255) and
the decode, so a backend returns DECODED predictions (B, A, 5+nc) — NMS
stays in detect.py.  Metadata (nc, imgsz, batch size, stride, head type)
comes from the sidecar export.py writes next to each artifact.

ONNX is env-blocked here: neither `onnx` nor `tf2onnx` wheels are
installed and the env has no egress (see COVERAGE.md).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def detect_backend(weights: str) -> str:
    w = str(weights)
    if w.endswith(".stablehlo"):
        return "stablehlo"
    if w.endswith(".tflite"):
        return "tflite"
    p = Path(w)
    if p.is_dir() and (p / "saved_model.pb").exists():
        return "saved_model"
    return "native"


def _read_meta(weights: Path, backend: str) -> dict:
    import yaml

    path = (weights / "dmayolo_meta.yaml" if backend == "saved_model"
            else weights.parent / (weights.name + ".meta.yaml"))
    if not path.exists():
        raise FileNotFoundError(
            f"{path} not found — re-run export.py (it writes the metadata "
            f"sidecar detect needs to run {backend} artifacts standalone)")
    with open(path) as f:
        return yaml.safe_load(f)


def decode_raw_np(raws, meta):
    """Anchor-based decode of raw head tensors, numpy mirror of
    nn/heads.py Detect.decode (ref yolo.py:83-103): same math, same
    reference candidate order (scale-major, then (a, y, x))."""
    z = []
    for x, stride, anc in zip(raws, meta["strides"], meta["anchors_px"]):
        b, ny, nx, na, no = x.shape
        y = 1.0 / (1.0 + np.exp(-x.astype(np.float32)))
        gx, gy = np.meshgrid(np.arange(nx, dtype=np.float32),
                             np.arange(ny, dtype=np.float32), indexing="xy")
        grid = np.stack([gx, gy], axis=-1)  # (ny, nx, 2)
        anc = np.asarray(anc, np.float32)  # (na, 2) in px
        xy = (y[..., 0:2] * 2 - 0.5 + grid[None, :, :, None, :]) * stride
        wh = (y[..., 2:4] * 2) ** 2 * anc[None, None, None, :, :]
        dec = np.concatenate([xy, wh, y[..., 4:]], axis=-1)
        z.append(dec.transpose(0, 3, 1, 2, 4).reshape(b, na * ny * nx, no))
    return np.concatenate(z, axis=1)


def load_backend(weights: str, backend: str):
    """Returns (fn, meta): fn maps uint8 (B,H,W,3) with B == meta['batch_size']
    to decoded predictions as a numpy array."""
    w = Path(weights)
    meta = _read_meta(w, backend)

    if backend == "stablehlo":
        import jax
        from jax import export as jexport

        exported = jexport.deserialize(w.read_bytes())
        plats = tuple(p.lower() for p in exported.platforms)
        cur = jax.default_backend()
        if cur not in plats:
            raise SystemExit(
                f"{w.name} was lowered for platform(s) {plats} but the "
                f"current jax backend is {cur!r} — re-run export.py on this "
                f"platform, or select one of {plats} (e.g. "
                f"JAX_PLATFORMS={plats[0]})")

        def fn(x):
            return np.asarray(exported.call(x))

    elif backend == "saved_model":
        import tensorflow as tf

        mod = tf.saved_model.load(str(w))

        def fn(x):
            return mod.f(tf.constant(np.asarray(x))).numpy()

    elif backend == "tflite":
        import tensorflow as tf

        interp = tf.lite.Interpreter(model_path=str(w))
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        outs = interp.get_output_details()

        if meta.get("raw_heads"):
            # int8 artifact: the quantized graph ends at the raw per-scale
            # head tensors; decode runs here in float from the sidecar
            # constants (see export._export_tflite_int8). Scale order =
            # tuple position, carried in the ":k" output-name suffix
            # (shapes alone can tie: two heads may share a stride).
            try:
                ordered = sorted(outs,
                                 key=lambda o: int(o["name"].split(":")[-1]))
            except ValueError:
                shapes = [tuple(s) for s in meta["shapes"]]
                by_shape = {}
                for o in outs:
                    by_shape[tuple(int(v) for v in o["shape"][1:3])] = o
                if len(by_shape) != len(outs):
                    raise ValueError(
                        "int8 raw-head outputs have ambiguous shapes and "
                        "unindexed names — cannot order heads safely")
                ordered = [by_shape[s] for s in shapes]
            expect = [tuple(s) for s in meta["shapes"]]
            got = [tuple(int(v) for v in o["shape"][1:3]) for o in ordered]
            if got != expect:  # load-time integrity, must survive python -O
                raise ValueError(
                    f"int8 raw-head output order mismatch: got {got}, "
                    f"metadata expects {expect}")

            def fn(x):
                interp.set_tensor(inp["index"], np.asarray(x))
                interp.invoke()
                return decode_raw_np(
                    [interp.get_tensor(o["index"]) for o in ordered], meta)

        else:
            out = outs[0]

            def fn(x):
                interp.set_tensor(inp["index"], np.asarray(x))
                interp.invoke()
                return interp.get_tensor(out["index"])

    else:
        raise ValueError(f"not an exported-artifact backend: {backend}")

    return fn, meta
