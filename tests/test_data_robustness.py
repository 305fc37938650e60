"""Regression tests for data-layer review findings: label-cache alignment
after corrupt-file filtering, segment/label row alignment, object-array
cache round-trip, quad-collate tail handling, loader early-exit cleanup.
"""
import threading
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dmayolo_tpu.data.datasets import DetectionDataset
from dmayolo_tpu.data.loader import Batch, DataLoader, collate_quad


def _mk_dataset(root, n=6, size=40, label_rows=None, corrupt=()):
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        p = root / "images" / f"im{i}.jpg"
        if i in corrupt:
            p.write_bytes(b"not a jpeg")
        else:
            cv2.imwrite(str(p), rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
        rows = label_rows(i) if label_rows else [f"{i % 3} 0.5 0.5 0.4 0.4"]
        (root / "labels" / f"im{i}.txt").write_text("\n".join(rows) + "\n")
    return str(root / "images")


def test_cache_hit_restores_filtered_file_list(tmp_path):
    path = _mk_dataset(tmp_path, n=6, corrupt=(2,))
    ds1 = DetectionDataset(path, img_size=64, augment=False)  # scan + write cache
    assert len(ds1.im_files) == 5 == len(ds1.labels)
    ds2 = DetectionDataset(path, img_size=64, augment=False)  # cache hit
    assert ds2.im_files == ds1.im_files
    assert len(ds2.im_files) == len(ds2.labels) == len(ds2.shapes) == 5
    # every index pairs image and label correctly
    for i, f in enumerate(ds2.im_files):
        assert "im2" not in f


def test_cached_labels_stay_float32_when_same_shape(tmp_path):
    # same label count per image: np.array(..., dtype=object) would build a
    # 3-D object array whose reload yields boxed-object labels
    path = _mk_dataset(tmp_path, n=4)
    DetectionDataset(path, img_size=64, augment=False)
    ds = DetectionDataset(path, img_size=64, augment=False)  # cache hit
    assert all(np.asarray(lb).dtype == np.float32 for lb in ds.labels)


def test_duplicate_polygon_rows_keep_segment_alignment(tmp_path):
    seg = "0 0.2 0.2 0.8 0.2 0.8 0.8 0.2 0.8"
    path = _mk_dataset(tmp_path, n=2,
                       label_rows=lambda i: [seg, seg, "1 0.1 0.1 0.9 0.1 0.9 0.9 0.1 0.9"])
    ds = DetectionDataset(path, img_size=64, augment=False)
    for lb, segs in zip(ds.labels, ds.segments):
        assert len(lb) == 2  # duplicate dropped
        assert len(segs) == len(lb)  # rows stay aligned


def test_collate_quad_keeps_tail_and_indices():
    rng = np.random.default_rng(0)
    samples = [(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                np.array([[0, 0.5, 0.5, 0.2, 0.2]], np.float32))
               for _ in range(6)]
    batch = collate_quad(samples, max_targets=8,
                         rng=np.random.default_rng(1), indices=list(range(6)))
    assert batch.images.shape[0] == 3  # 1 quad group + 2 upscaled singles
    assert batch.images.shape[1:3] == (64, 64)
    assert batch.indices == [0, 4, 5]


def test_loader_early_exit_does_not_leak_threads(tmp_path):
    path = _mk_dataset(tmp_path, n=8)
    ds = DetectionDataset(path, img_size=64, augment=False)
    base = threading.active_count()
    loader = DataLoader(ds, batch_size=2, max_targets=8, shuffle=False, workers=4)
    for batch in loader:  # abandon after the first batch
        break
    deadline = time.time() + 5
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base, "loader workers leaked"


def test_quad_rng_varies_across_epochs(tmp_path):
    path = _mk_dataset(tmp_path, n=48, size=48)
    ds = DetectionDataset(path, img_size=64, augment=False)
    loader = DataLoader(ds, batch_size=4, max_targets=8, shuffle=False,
                        workers=1, quad=True)
    e1 = [b.images.copy() for b in loader]
    e2 = [b.images.copy() for b in loader]
    # 12 independent upscale-vs-tile coin flips per epoch: identical pairs
    # across epochs have probability 2^-12 if the rng varies as intended
    assert any(a.shape != b.shape or not np.array_equal(a, b)
               for a, b in zip(e1, e2)), "quad draws identical across epochs"


def test_disk_cache_keyed_by_img_size(tmp_path):
    path = _mk_dataset(tmp_path, n=2, size=100)
    ds320 = DetectionDataset(path, img_size=320, augment=False, cache_disk=True)
    im320 = ds320.load_image(0)[0]
    ds640 = DetectionDataset(path, img_size=640, augment=False, cache_disk=True)
    im640 = ds640.load_image(0)[0]
    assert max(im640.shape[:2]) > max(im320.shape[:2]), \
        "disk cache served a stale resolution"


def test_augment_stream_independent_of_worker_count(tmp_path):
    """Training reproducibility: augmented batches must be a pure function
    of (seed, epoch, index) — never of thread scheduling.  A shared dataset
    rng drawn from concurrent workers made identically-seeded runs diverge
    under host-load variance (caught as a flaky bf16-delta suite failure)."""
    path = _mk_dataset(tmp_path, n=16, size=48)
    hyp = {"mosaic": 1.0, "mixup": 0.5, "fliplr": 0.5, "flipud": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "scale": 0.5}

    def epochs(workers, n_epochs=2):
        ds = DetectionDataset(path, img_size=64, augment=True, hyp=hyp, seed=3)
        loader = DataLoader(ds, batch_size=4, max_targets=16, shuffle=True,
                            workers=workers, seed=3)
        return [[(b.images.copy(), np.asarray(b.targets.box).copy())
                 for b in loader] for _ in range(n_epochs)]

    a, b = epochs(1), epochs(4)
    for ea, eb in zip(a, b):
        for (ia, ta), (ib, tb) in zip(ea, eb):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ta, tb)
    # and the stream must still differ ACROSS epochs (epoch term in the key)
    assert any(not np.array_equal(x[0], y[0]) for x, y in zip(a[0], a[1]))


def test_check_dataset_missing_guidance_handles_list_val(tmp_path):
    """VOC-style list-valued `val:` must hit the same actionable missing-
    dataset error as a plain string (it used to bypass the check)."""
    from dmayolo_tpu.data.datasets import check_dataset

    y = tmp_path / "d.yaml"
    y.write_text(
        f"path: {tmp_path}\ntrain: [images/t1, images/t2]\n"
        "val: [images/v1, images/v2]\nnc: 1\nnames: [thing]\n"
        "download: echo get-it-elsewhere\n")
    with pytest.raises(FileNotFoundError, match="dataset paths missing"):
        check_dataset(y)
    # present list-valued val passes through resolved
    for sub in ("images/v1", "images/v2", "images/t1", "images/t2"):
        (tmp_path / sub).mkdir(parents=True)
    d = check_dataset(y)
    assert [str(tmp_path / "images/v1"), str(tmp_path / "images/v2")] == d["val"]
