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


def test_train_step_with_device_aug():
    """--device-aug: augmentation runs inside the jitted step (uint8 in),
    loss is finite, and zero-gain aug reproduces the un-augmented step."""
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.train.loss import ComputeLoss, Targets
    from dmayolo_tpu.train.optim import Schedule, param_groups
    from dmayolo_tpu.train.step import init_train_state, make_train_step

    cfg = {
        "nc": 3, "depth_multiple": 0.33, "width_multiple": 0.25,
        "anchors": [[10, 13, 16, 30, 33, 23]] * 3,
        "backbone": [
            [-1, 1, "Conv", [32, 6, 2, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]],
    }
    hyp = {"box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
           "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
           "lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 5e-4,
           "warmup_epochs": 0.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1}
    model = DetectionModel(cfg, nc=3)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    loss = ComputeLoss(model.head.anchors, hyp, nc=3)
    sched = Schedule(hyp, epochs=2, steps_per_epoch=4, warmup_min_iters=1)
    labels = param_groups(model)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8))
    tgt = Targets(
        jnp.asarray(rng.integers(0, 3, (2, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.7, (2, 4, 4)).astype(np.float32)),
        jnp.asarray(np.ones((2, 4), bool)),
    )
    key = jax.random.PRNGKey(3)

    def run(device_aug):
        step = jax.jit(make_train_step(
            model, loss, sched, labels, weight_decay=5e-4,
            dtype=jnp.float32, device_aug=device_aug))
        st, met = step(init_train_state(params, stats), imgs, tgt, key)
        return float(met["loss"])

    l_aug = run({"hgain": 0.015, "sgain": 0.7, "vgain": 0.4, "fliplr": 1.0})
    l_plain = run(None)
    l_zero = run({"hgain": 0.0, "sgain": 0.0, "vgain": 0.0, "fliplr": 0.0})
    assert np.isfinite(l_aug) and np.isfinite(l_plain)
    # zero gains + no flip == plain path (uint8/255 then identity aug)
    np.testing.assert_allclose(l_zero, l_plain, rtol=1e-5)
    # forced flip must change the loss
    assert abs(l_aug - l_plain) > 1e-6
