"""On-device batch augmentation: HSV jitter + horizontal flip + normalise.

The reference runs HSV/flip on the host per image (utils/augmentations.py:48-61);
here the whole uint8 batch is augmented on-device in one fused XLA program —
the host ships raw uint8 pixels and the TPU does the rest (color math is
pure elementwise VPU work that XLA fuses with the /255 normalise and the
first conv's input cast).

Semantics follow cv2's convention (H in [0,180), S/V in [0,255], hue wraps)
but compute continuously instead of via uint8 LUTs, so results match the
reference to quantisation error (~1/255).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv_cv(rgb):
    """RGB [0,1] -> (h in [0,180), s in [0,1], v in [0,1]), cv2 ranges."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r,
        (g - b) / safe_c % 6.0,
        jnp.where(v == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0),
    )
    h = jnp.where(c > 0, h * 30.0, 0.0)  # cv2: 0..180
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def hsv_to_rgb_cv(h, s, v):
    """Inverse of rgb_to_hsv_cv."""
    h6 = (h / 30.0) % 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def augment_batch(images, rng, hgain=0.015, sgain=0.7, vgain=0.4,
                  fliplr_p=0.5, dtype=jnp.float32):
    """uint8 NHWC batch -> augmented normalised batch + per-image flip mask.

    Per-image random HSV gains + lr-flip; returns (images in [0,1] dtype,
    flipped (B,) bool — the caller mirrors target x-coords for flipped rows).
    """
    b = images.shape[0]
    k_hsv, k_flip = jax.random.split(rng)
    gains = jax.random.uniform(k_hsv, (b, 3), minval=-1.0, maxval=1.0)
    gains = gains * jnp.asarray([hgain, sgain, vgain]) + 1.0

    x = images.astype(jnp.float32) / 255.0
    h, s, v = rgb_to_hsv_cv(x)
    h = (h * gains[:, 0, None, None]) % 180.0
    s = jnp.clip(s * gains[:, 1, None, None], 0.0, 1.0)
    v = jnp.clip(v * gains[:, 2, None, None], 0.0, 1.0)
    x = hsv_to_rgb_cv(h, s, v)

    flipped = jax.random.bernoulli(k_flip, fliplr_p, (b,))
    x = jnp.where(flipped[:, None, None, None], x[:, :, ::-1, :], x)
    return x.astype(dtype), flipped


def flip_targets_lr(targets_box, flipped):
    """Mirror normalised xywh target x for flipped rows: cx -> 1-cx."""
    cx = jnp.where(flipped[:, None], 1.0 - targets_box[..., 0], targets_box[..., 0])
    return jnp.concatenate([cx[..., None], targets_box[..., 1:]], axis=-1)
