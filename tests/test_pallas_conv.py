"""Golden parity for the Pallas 3x3 conv kernel vs lax.conv (interpret
mode on CPU; real-TPU timings live in experiments/exp_pallas_conv.py).

The kernel replaces the cuDNN library convs of the reference (SURVEY.md
L0, models/common.py Conv) for shapes where XLA's TPU conv emitter is
pathological; parity must be exact up to f32 accumulation order.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmayolo_tpu.nn.pallas_conv import conv3x3_s1, pick_tile


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@pytest.mark.parametrize("variant", ["im2col", "sum9"])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 32, 32, 16, 24),   # C2 != C1, single tile
        (1, 64, 32, 8, 8),     # rectangular, tiny channels
        (2, 96, 96, 32, 32),   # multi-tile grid (TH=TW=96 -> 48 fallback ok)
    ],
)
def test_conv3x3_matches_lax(variant, shape):
    B, H, W, C1, C2 = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C1)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, C1, C2)) * 0.1).astype(np.float32))
    got = conv3x3_s1(x, w, rh=8, variant=variant, interpret=True)
    want = _ref(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_conv3x3_bf16_inputs_f32_accum():
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 32, 32, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(3, 3, C, C)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    got = conv3x3_s1(x, w, rh=16, variant="im2col", interpret=True)
    want = _ref(x, w)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_pick_tile():
    assert pick_tile(768) == 128
    assert pick_tile(96) == 96
    assert pick_tile(7) is None
