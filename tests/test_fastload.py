"""Native C++ input path (native/fastload.cpp via ctypes).

Parity vs the cv2 reference pipeline (load_image resize rules, letterbox
padding math) and a decode-throughput sanity check. Skips cleanly when the
toolchain can't build the library.
"""
import time
from pathlib import Path

import cv2
import numpy as np
import pytest

from dmayolo_tpu.data import fastload
from dmayolo_tpu.data.augment import letterbox

if not fastload.available():
    pytest.skip("fastload native lib unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory):
    rng = np.random.default_rng(0)
    # smooth image: JPEG is lossy, so parity is checked against cv2 decoding
    # THE SAME file — decode itself must be bit-identical (same libjpeg)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (480, 640, 3), np.uint8), (15, 15), 5)
    p = tmp_path_factory.mktemp("fl") / "img.jpg"
    cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return str(p)


def test_decode_matches_cv2(jpeg):
    im, (h0, w0), (h, w) = fastload.load(jpeg, 640, augment=False)
    ref = cv2.imread(jpeg)
    assert (h0, w0) == ref.shape[:2] and (h, w) == ref.shape[:2]
    np.testing.assert_array_equal(im, ref)  # same libjpeg -> bit-identical


@pytest.mark.parametrize("size,augment", [(320, False), (960, False), (320, True)])
def test_resize_close_to_cv2(jpeg, size, augment):
    im, (h0, w0), (h, w) = fastload.load(jpeg, size, augment=augment)
    ref = cv2.imread(jpeg)
    r = size / max(h0, w0)
    interp = cv2.INTER_AREA if r < 1 and not augment else cv2.INTER_LINEAR
    ref_r = cv2.resize(ref, (int(w0 * r), int(h0 * r)), interpolation=interp)
    assert im.shape == ref_r.shape
    d = np.abs(im.astype(int) - ref_r.astype(int))
    # cv2 INTER_AREA/LINEAR use fixed-point arithmetic; ours is double —
    # off-by-rounding on a small fraction of pixels is expected
    assert d.max() <= 3 and d.mean() < 0.2, (d.max(), d.mean())


def test_letterbox_matches_reference_math(jpeg):
    out, ratio, (pl, pt), (h0, w0) = fastload.load_letterbox(jpeg, (512, 512))
    ref = cv2.imread(jpeg)
    ref_lb, ref_ratio, ref_pad = letterbox(ref, (512, 512), auto=False, scaleup=False)
    assert out.shape == ref_lb.shape
    assert ratio == pytest.approx(ref_ratio[0], abs=1e-6)
    # same top-left pad rounding (round(d - 0.1), augmentations.py:110)
    assert (pl, pt) == (round(ref_pad[0] - 0.1), round(ref_pad[1] - 0.1))
    d = np.abs(out.astype(int) - ref_lb.astype(int))
    assert d.max() <= 3 and d.mean() < 0.2


def test_dataset_fastload_path(tmp_path):
    from dmayolo_tpu.data.datasets import DetectionDataset, check_dataset
    from dmayolo_tpu.data.synthetic import generate

    yaml_path = generate(str(tmp_path / "shapes"), n_train=4, n_val=2, img_size=256)
    data = check_dataset(yaml_path)
    ds_fast = DetectionDataset(data["val"], img_size=256, augment=False, fastload=True)
    ds_cv2 = DetectionDataset(data["val"], img_size=256, augment=False)
    for i in range(len(ds_fast.im_files)):
        a, (h0a, w0a), hwa = ds_fast.load_image(i)
        b, (h0b, w0b), hwb = ds_cv2.load_image(i)
        assert (h0a, w0a) == (h0b, w0b) and hwa == hwb
        np.testing.assert_array_equal(a, b)  # r==1 -> pure decode, identical


def test_throughput_not_pathological(jpeg):
    """Native decode+resize should not be slower than 3x the cv2 chain
    (typically it is faster; this guards regressions, not a benchmark)."""
    def t(fn, n=20):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    t_fast = t(lambda: fastload.load(jpeg, 320))
    def cv2_chain():
        im = cv2.imread(jpeg)
        r = 320 / max(im.shape[:2])
        cv2.resize(im, (int(im.shape[1] * r), int(im.shape[0] * r)),
                   interpolation=cv2.INTER_AREA)
    t_cv = t(cv2_chain)
    print(f"fastload {t_fast*1e3:.2f}ms vs cv2 {t_cv*1e3:.2f}ms")
    assert t_fast < 3 * t_cv


@pytest.fixture(scope="module")
def portrait_jpeg(tmp_path_factory):
    rng = np.random.default_rng(1)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (640, 480, 3), np.uint8), (15, 15), 5)
    p = tmp_path_factory.mktemp("flp") / "portrait.jpg"
    cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return str(p)


@pytest.mark.parametrize("size", [320, 640, 960])
def test_portrait_not_scrambled(portrait_jpeg, size):
    # regression: fl_load packs rows densely (stride w*3); the wrapper used
    # to slice the square buffer at stride img_size*3, scrambling every
    # portrait image (w < img_size). Covers downscale, r==1 memcpy, upscale.
    im, (h0, w0), (h, w) = fastload.load(portrait_jpeg, size, augment=False)
    assert h0 > w0 and h > w and im.shape == (h, w, 3)
    ref = cv2.imread(portrait_jpeg)
    r = size / max(h0, w0)
    if r == 1.0:
        np.testing.assert_array_equal(im, ref)
    else:
        interp = cv2.INTER_AREA if r < 1 else cv2.INTER_LINEAR
        ref_r = cv2.resize(ref, (int(w0 * r), int(h0 * r)), interpolation=interp)
        d = np.abs(im.astype(int) - ref_r.astype(int))
        assert d.max() <= 3 and d.mean() < 0.2, (d.max(), d.mean())


def test_fastload_populates_disk_cache(tmp_path):
    # regression: --fastload + --cache disk returned before the np.save,
    # so the npy cache never materialised and every epoch re-decoded
    from dmayolo_tpu.data.datasets import DetectionDataset, check_dataset
    from dmayolo_tpu.data.synthetic import generate

    yaml_path = generate(str(tmp_path / "shapes"), n_train=2, n_val=2,
                         img_size=128)
    data = check_dataset(yaml_path)
    ds = DetectionDataset(data["val"], img_size=128, augment=False,
                          fastload=True, cache_disk=True)
    im, _, _ = ds.load_image(0)
    p = Path(ds.im_files[0])
    npy = p.parent / f"{p.name}.128.npy"  # keyed by source name + img_size
    assert npy.exists()
    np.testing.assert_array_equal(np.load(npy), im)
