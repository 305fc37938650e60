"""Micro-batching inference core: coalesce concurrent requests into one
TPU program call.

The reference's serving surface is one-image-per-request (Flask demo,
utils/flask_rest_api/restapi.py:16-36, and AutoShape batch-of-inputs,
models/common.py:701-793) — fine on a GPU handling a single caller, but
a TPU serving deployment lives or dies by batch: the flagship runs
~4.8 ms at batch 1 and ~160 ms at batch 128 (ROUND2_NOTES), i.e. one
queued batch is worth up to ~26x the throughput of sequential batch-1
calls on the same chip.

`MicroBatcher` holds ONE jitted serve program (normalise + fused forward
+ per-scale decode + NMS — the bench.py fast path) and a dispatcher
thread that drains the request queue into device batches:

- requests wait at most `max_wait_ms` for co-riders;
- every image is letterboxed to the same static (imgsz, imgsz) square,
  so the program never retraces on input size;
- the batch dim is padded up to a power-of-two bucket (1,2,4,...,
  max_batch), bounding XLA compiles to log2(max_batch)+1 programs;
- results are letterbox-inverted to each request's native pixel space
  on the host.

Thread-safe; pure stdlib + the existing serving fast path.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import Counter
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


from ..data.augment import letterbox
from ..eval.validator import _scale_to_native

_STOP = object()


class _Request:
    __slots__ = ("img", "shape0", "event", "dets", "error")

    def __init__(self, img: np.ndarray):
        self.img = img
        self.shape0 = img.shape[:2]
        self.event = threading.Event()
        self.dets: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        """Block until the batch containing this request has run.

        Returns (n, 6) [x1, y1, x2, y2, conf, cls] in the submitted
        image's native pixel space."""
        if not self.event.wait(timeout):
            raise TimeoutError("inference result not ready")
        if self.error is not None:
            raise self.error
        return self.dets


def _buckets(max_batch: int) -> List[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class MicroBatcher:
    """Request-coalescing wrapper around one jitted serve program.

    Args:
        model / params / stats: a DetectionModel and its UNFUSED weight
            trees (as loaded by `cli.common.load_model_from_checkpoint`);
            Conv+BN folding happens here.
        imgsz: static letterbox square; every request compiles to this.
        max_batch: device batch ceiling (autobatch's serving answer, or
            the bench sweet spot 128 on a v5e for the flagship).
        max_wait_ms: how long the first request of a batch waits for
            co-riders. 0 disables coalescing-by-time (still drains
            whatever is already queued).
    """

    def __init__(self, model, params, stats, *, imgsz: int = 640,
                 max_batch: int = 32, max_wait_ms: float = 5.0,
                 conf_thres: float = 0.25, iou_thres: float = 0.45,
                 max_det: int = 300, max_nms: int = 512,
                 dtype=jnp.bfloat16, nms_backend: str = "matrix",
                 names: Optional[Sequence[str]] = None):
        from ..nn.fuse import fuse_params

        self.model = model
        self.params, self.stats = fuse_params(model, params, stats)
        self.imgsz = int(imgsz)
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1000.0
        self.names = list(names) if names else [str(i) for i in range(model.nc)]
        self._bucket_sizes = _buckets(self.max_batch)

        def _serve(p, s, x):
            xf = x.astype(dtype) / 255.0
            raw = model.apply(p, s, xf, fused=True, dtype=dtype)
            # head-aware tail: lazy decode_topk for TDetect, eager
            # decode_parts for Detect (DetectionModel.serve_detections)
            return model.serve_detections(raw, conf_thres=conf_thres,
                                          iou_thres=iou_thres,
                                          max_det=max_det, max_nms=max_nms,
                                          backend=nms_backend)

        # params as jit args, not closure constants (see hub.AutoShape._infer)
        self._serve = jax.jit(_serve)

        self._q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        self.stats_counters = {"requests": 0, "batches": 0,
                               "batch_hist": Counter(), "padded_rows": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="dmayolo-microbatcher")
        self._thread.start()

    # ---------------------------------------------------------------- API

    def submit(self, img_rgb: np.ndarray) -> _Request:
        """Enqueue one HWC RGB uint8 image; returns a waitable handle."""
        img = np.asarray(img_rgb)
        if img.ndim != 3 or img.shape[2] != 3 or 0 in img.shape:
            raise ValueError(f"expected non-empty HWC RGB image, got shape {img.shape}")
        if img.dtype != np.uint8:
            raise ValueError(f"expected uint8 pixels, got {img.dtype}")
        req = _Request(img)
        # enqueue under the lock: close() sets _closed and puts _STOP under
        # the same lock, so a request can never land behind the sentinel
        # (where it would hang forever)
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._q.put(req)
        return req

    def __call__(self, img_rgb: np.ndarray,
                 timeout: Optional[float] = None) -> np.ndarray:
        return self.submit(img_rgb).result(timeout)

    def warmup(self) -> None:
        """Compile every batch bucket (one dummy run each) so first real
        requests never pay a trace+compile."""
        z = jnp.zeros((1, self.imgsz, self.imgsz, 3), jnp.uint8)
        for b in self._bucket_sizes:
            out = self._serve(self.params, self.stats,
                              jnp.broadcast_to(z, (b,) + z.shape[1:]))
            jax.block_until_ready(out)

    def close(self, timeout: float = 30.0) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(_STOP)
        self._thread.join(timeout)

    # --------------------------------------------------------------- loop

    def _loop(self):
        stop = False
        while not stop:
            item = self._q.get()
            if item is _STOP:
                break
            batch = [item]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                wait = deadline - time.monotonic()
                try:
                    nxt = self._q.get(timeout=wait) if wait > 0 else self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stop = True
                    break
                batch.append(nxt)
            self._run(batch)

    def _run(self, batch: List[_Request]):
        # per-request preprocessing: a degenerate image fails only its own
        # request, never the co-riders sharing the device batch
        sz = self.imgsz
        ok: List[_Request] = []
        tiles = []
        for req in batch:
            try:
                tiles.append(letterbox(req.img, (sz, sz), auto=False)[0])
                ok.append(req)
            except BaseException as e:
                req.error = e
                req.event.set()
        batch = ok
        if not batch:
            return
        try:
            imgs = np.stack(tiles).astype(np.uint8, copy=False)
            bucket = next(b for b in self._bucket_sizes if b >= len(batch))
            if bucket > len(batch):
                imgs = np.concatenate(
                    [imgs, np.zeros((bucket - len(batch), sz, sz, 3), np.uint8)]
                )
            dets, valid = self._serve(self.params, self.stats, jnp.asarray(imgs))
            dets = np.asarray(dets)
            valid = np.asarray(valid)
            for i, req in enumerate(batch):
                d = dets[i][valid[i]].copy()
                d[:, :4] = _scale_to_native(d[:, :4], (sz, sz), req.shape0)
                req.dets = d
                req.event.set()
            self.stats_counters["requests"] += len(batch)
            self.stats_counters["batches"] += 1
            self.stats_counters["batch_hist"][len(batch)] += 1
            self.stats_counters["padded_rows"] += bucket - len(batch)
        except BaseException as e:  # propagate to every waiter, keep serving
            for req in batch:
                if not req.event.is_set():
                    req.error = e
                    req.event.set()
