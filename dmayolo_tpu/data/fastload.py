"""ctypes wrapper for the native fastload library (native/fastload.cpp).

Native JPEG decode + aspect resize + letterbox in one GIL-free C++ call —
the input-pipeline hot path (reference load_image datasets.py:659-677 and
letterbox augmentations.py:92-122) without cv2/numpy intermediate copies.
The loader's Python threads call into it concurrently (ctypes releases the
GIL), so decode throughput scales with cores while the TPU steps run.

Builds lazily via native/build.sh on first use; anything that fails (no
g++, non-JPEG input, corrupt file) falls back to the cv2 path silently.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE = Path(__file__).resolve().parents[2] / "native"
_LIB = _NATIVE / "libfastload.so"
_lib = None
_tried = False


def _get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = _NATIVE / "fastload.cpp"
        if not _LIB.exists() or _LIB.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(["sh", str(_NATIVE / "build.sh")], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.fl_load.restype = ctypes.c_int
        lib.fl_load_letterbox.restype = ctypes.c_int
        lib.fl_probe.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _read_jpeg_bytes(path) -> Optional[bytes]:
    p = str(path)
    if not p.lower().endswith((".jpg", ".jpeg")):
        return None
    with open(p, "rb") as f:
        return f.read()


def load(path, img_size: int, augment: bool = False
         ) -> Optional[Tuple[np.ndarray, Tuple[int, int], Tuple[int, int]]]:
    """Native equivalent of DetectionDataset.load_image for JPEGs:
    (BGR image resized so max side == img_size, (h0, w0), (h, w)).
    Returns None when the native path can't serve this file."""
    lib = _get_lib()
    if lib is None:
        return None
    buf = _read_jpeg_bytes(path)
    if buf is None:
        return None
    out = np.empty((img_size, img_size, 3), np.uint8)
    dims = (ctypes.c_int * 4)()
    rc = lib.fl_load(buf, len(buf), img_size, int(augment),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), dims)
    if rc != 0:
        return None
    h0, w0, h, w = dims
    # fl_load writes rows densely packed (stride w*3, see fastload.cpp
    # resize_* / memcpy paths) into the img_size^2 buffer — reshape the
    # dense prefix; slicing out[:h, :w] would scramble portrait images
    # (w < img_size), where row stride != img_size*3.
    img = out.reshape(-1)[: h * w * 3].reshape(h, w, 3).copy()
    return img, (h0, w0), (h, w)


def load_letterbox(path, shape: Tuple[int, int], scaleup: bool = False
                   ) -> Optional[Tuple[np.ndarray, float, Tuple[float, float],
                                       Tuple[int, int]]]:
    """Fused decode+resize+letterbox: (image (H,W,3) BGR, ratio,
    (pad_left, pad_top), (h0, w0)). None when unsupported."""
    lib = _get_lib()
    if lib is None:
        return None
    buf = _read_jpeg_bytes(path)
    if buf is None:
        return None
    th, tw = shape
    out = np.empty((th, tw, 3), np.uint8)
    meta = (ctypes.c_float * 5)()
    rc = lib.fl_load_letterbox(
        buf, len(buf), th, tw, int(scaleup),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), meta)
    if rc != 0:
        return None
    return out, float(meta[0]), (float(meta[1]), float(meta[2])), (int(meta[3]), int(meta[4]))
