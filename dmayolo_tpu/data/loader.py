"""Batching + background prefetch.

Replaces the reference's InfiniteDataLoader/worker processes
(ref: utils/datasets.py:95-155) with a thread-pool prefetcher (cv2/numpy
release the GIL) producing fixed-shape device-ready batches:

    images:  uint8 NHWC (normalisation happens on device — 4x less
             host->TPU bandwidth than shipping f32)
    targets: dense Targets(cls (B,M), xywhn (B,M,4), mask (B,M))

Fixed M (max_targets) keeps every train step the same XLA program.
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

from ..train.loss import Targets
from .datasets import DetectionDataset


class Batch:
    __slots__ = ("images", "targets", "indices")

    def __init__(self, images, targets, indices=None):
        self.images = images
        self.targets = targets
        self.indices = indices  # dataset indices of each row


_truncation_warned = False


def collate(samples, max_targets: int, indices=None) -> Batch:
    """Stack (img, labels) pairs into dense arrays."""
    global _truncation_warned
    imgs = np.stack([s[0] for s in samples])
    b = len(samples)
    cls = np.zeros((b, max_targets), np.float32)
    box = np.zeros((b, max_targets, 4), np.float32)
    mask = np.zeros((b, max_targets), bool)
    for i, (_, lb) in enumerate(samples):
        n = min(len(lb), max_targets)
        if len(lb) > max_targets and not _truncation_warned:
            # the reference's variable-length collate keeps every label
            # (utils/datasets.py:627-631); our dense layout must be told
            # the budget. Dropping labels silently would diverge training
            # on crowded data (e.g. the VisDrone-analog: 40-110 objects
            # per image, 4x that after mosaic).
            _truncation_warned = True
            import logging

            logging.getLogger(__name__).warning(
                "collate: %d labels exceed max_targets=%d — excess dropped"
                " (raise --max-targets to keep them)", len(lb), max_targets)
        if n:
            cls[i, :n] = lb[:n, 0]
            box[i, :n] = lb[:n, 1:5]
            mask[i, :n] = True
    return Batch(imgs, Targets(cls, box, mask), indices)


class DataLoader:
    """Epoch iterator with prefetch threads."""

    def __init__(self, dataset: DetectionDataset, batch_size: int,
                 max_targets: int = 128, shuffle: bool = True,
                 workers: int = 4, seed: int = 0, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 quad: bool = False):
        """process_index/process_count: multi-host input sharding — this
        host reads only its rank::world stripe of the dataset and yields
        the LOCAL slice (global_batch/process_count rows) of every batch;
        combine with parallel.mesh.globalize_batch. The reference's analog
        is DistributedSampler + batch_size//WORLD_SIZE (datasets.py:112,
        train.py:279)."""
        self.ds = dataset
        self.bs = batch_size
        self.max_targets = max_targets
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.rng = np.random.default_rng(seed)
        self._seed = seed
        self.drop_last = drop_last
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.process_index = process_index
        self.process_count = process_count
        self.local_bs = batch_size // process_count
        self.quad = quad  # reference --quad: collate_fn4 (datasets.py:632-655)
        self._epoch = 0  # folded into worker rng so quad draws vary per epoch

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else -(-n // self.bs)

    sample_weights = None  # optional per-image sampling weights (image_weights mode)

    def _batches(self) -> Iterator[list]:
        n = len(self.ds)
        if self.sample_weights is not None:
            # ref train.py:376-384: resample indices by image weights
            w = np.asarray(self.sample_weights, np.float64)
            w = w / w.sum()
            order = self.rng.choice(n, size=n, replace=True, p=w)
        else:
            order = np.arange(n)
            if self.shuffle:
                self.rng.shuffle(order)
        nb = len(self)
        lo = self.process_index * self.local_bs
        for i in range(nb):
            g = order[i * self.bs : (i + 1) * self.bs]
            if self.process_count > 1 and len(g) < self.bs:
                g = np.resize(g, self.bs)  # wrap-pad (DistributedSampler-style)
            # identical seed => identical global order on every host; each
            # host materialises only its contiguous row block (the rows of
            # the shards its local devices own under a 'data' sharding)
            yield g[lo : lo + self.local_bs].tolist()

    def __iter__(self) -> Iterator[Batch]:
        work: "queue.Queue" = queue.Queue()
        out: "queue.Queue" = queue.Queue(maxsize=2 * self.workers)
        batches = list(self._batches())
        for j, b in enumerate(batches):
            work.put((j, b))
        done = threading.Event()
        self._epoch += 1
        epoch = self._epoch

        def put(item):
            # bounded-queue put that observes `done`: a consumer that stops
            # iterating early (exception/break) must not leave workers
            # blocked forever holding full image batches
            while not done.is_set():
                try:
                    out.put(item, timeout=0.2)
                    return
                except queue.Full:
                    continue

        def worker():
            while not done.is_set():
                try:
                    j, idxs = work.get_nowait()
                except queue.Empty:
                    return
                try:
                    if hasattr(self.ds, "get"):
                        # per-sample rng keyed by (seed, epoch, index): the
                        # augmentation stream must be a pure function of
                        # those three, never of which thread ran first — a
                        # shared dataset rng under >1 workers makes training
                        # irreproducible under host-load variance
                        samples = [
                            self.ds.get(
                                i, random.Random(hash((self._seed, epoch, int(i)))))
                            for i in idxs
                        ]
                    else:
                        samples = [self.ds[i] for i in idxs]
                    if self.quad:
                        # per-batch rng derived from (seed, epoch, j) — the
                        # shared self.rng must not be touched from workers,
                        # and without the epoch term every epoch would draw
                        # identical upscale-vs-tile choices per batch slot
                        rng = np.random.default_rng((self._seed, epoch, j))
                        put((j, collate_quad(samples, self.max_targets,
                                             rng=rng, indices=idxs)))
                    else:
                        put((j, collate(samples, self.max_targets, idxs)))
                except BaseException as e:  # surface in the consumer, never hang
                    put((j, e))
                    return

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.workers)]
        for t in threads:
            t.start()
        try:
            next_j = 0
            pending = {}
            for _ in range(len(batches)):
                while next_j not in pending:
                    j, batch = out.get()
                    if isinstance(batch, BaseException):
                        raise batch
                    pending[j] = batch
                yield pending.pop(next_j)
                next_j += 1
        finally:
            done.set()


def collate_quad(samples, max_targets: int, rng=None, indices=None) -> Batch:
    """Quad collate: each output item is either one image upscaled 2x or a
    2x2 tile of four, at double resolution (reference --quad,
    utils/datasets.py:631-655).  A non-multiple-of-4 tail (short final
    batch) is upscaled image-by-image instead of being dropped."""
    import cv2
    import random as _random

    rng = rng or _random
    out = []
    out_idx = [] if indices is not None else None
    n4 = len(samples) - len(samples) % 4
    for i in range(0, n4, 4):
        group = samples[i : i + 4]
        h, w = group[0][0].shape[:2]
        if rng.random() < 0.5:  # upscale one image
            im = cv2.resize(group[0][0], (2 * w, 2 * h), interpolation=cv2.INTER_LINEAR)
            lb = group[0][1]
        else:  # 2x2 tile; labels shift+halve into quadrants
            top = np.concatenate([group[0][0], group[1][0]], axis=1)
            bot = np.concatenate([group[2][0], group[3][0]], axis=1)
            im = np.concatenate([top, bot], axis=0)
            parts = []
            offs = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)]
            for (ox, oy), (_, l) in zip(offs, group):
                if len(l):
                    l = l.copy()
                    l[:, 1] = l[:, 1] * 0.5 + ox
                    l[:, 2] = l[:, 2] * 0.5 + oy
                    l[:, 3:5] *= 0.5
                    parts.append(l)
            lb = np.concatenate(parts, 0) if parts else np.zeros((0, 5), np.float32)
        out.append((im, lb))
        if out_idx is not None:
            out_idx.append(indices[i])  # group representative
    for i in range(n4, len(samples)):  # remainder: plain 2x upscale
        im, lb = samples[i][0], samples[i][1]
        h, w = im.shape[:2]
        im = cv2.resize(im, (2 * w, 2 * h), interpolation=cv2.INTER_LINEAR)
        out.append((im, lb))
        if out_idx is not None:
            out_idx.append(indices[i])
    return collate(out, max_targets, out_idx)


def pad_to_batch(imgs: np.ndarray, targets: Targets, bs: int):
    """Pad a short final batch up to bs (mask stays false on padding)."""
    n = imgs.shape[0]
    if n == bs:
        return imgs, targets, np.ones(bs, bool)
    pad = bs - n
    imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
    t = Targets(
        np.concatenate([np.asarray(targets.cls), np.zeros((pad,) + np.asarray(targets.cls).shape[1:], np.float32)]),
        np.concatenate([np.asarray(targets.box), np.zeros((pad,) + np.asarray(targets.box).shape[1:], np.float32)]),
        np.concatenate([np.asarray(targets.mask), np.zeros((pad,) + np.asarray(targets.mask).shape[1:], bool)]),
    )
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return imgs, t, valid
