"""On-device augmentation: HSV roundtrip vs cv2, flip correctness."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.data.device_aug import (
    augment_batch,
    flip_targets_lr,
    hsv_to_rgb_cv,
    rgb_to_hsv_cv,
)


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    h, s, v = rgb_to_hsv_cv(x)
    back = hsv_to_rgb_cv(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_hsv_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)  # H 0..180, S/V 0..255
    h, s, v = rgb_to_hsv_cv(jnp.asarray(img.astype(np.float32) / 255.0))
    np.testing.assert_allclose(np.asarray(s) * 255, ref[..., 1], atol=1.5)
    np.testing.assert_allclose(np.asarray(v) * 255, ref[..., 2], atol=1.0)
    # hue wraps at 180: compare circularly
    dh = np.abs(np.asarray(h) - ref[..., 0].astype(np.float32))
    dh = np.minimum(dh, 180 - dh)
    assert dh.mean() < 1.0, dh.mean()


def test_augment_batch_shapes_and_flip():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    out, flipped = jax.jit(augment_batch)(imgs, jax.random.PRNGKey(0))
    assert out.shape == imgs.shape and out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    box = jnp.asarray([[[0.2, 0.5, 0.1, 0.1]]] * 4)
    new = flip_targets_lr(box, jnp.asarray([True, False, True, False]))
    np.testing.assert_allclose(np.asarray(new[0, 0, 0]), 0.8, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new[1, 0, 0]), 0.2, atol=1e-6)


def test_zero_gains_identity():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8))
    out, _ = augment_batch(imgs, jax.random.PRNGKey(0), hgain=0, sgain=0, vgain=0,
                           fliplr_p=0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(imgs).astype(np.float32) / 255.0, atol=1e-5
    )
