"""Pallas TPU kernel for 3x3 stride-1 'same' convolutions in the
high-spatial / low-channel regime where XLA's conv emitter underperforms.

Motivation (measured on v5e, ROUND2_NOTES session 3): a plain 3x3 conv on
(4, 768, 768, 64) — the SCConv k3 shape of the 1536px VisDrone recipe
(reference train.sh:1, models/common.py:1279-1316) — runs at ~15 TF/s
through lax.conv, while the SAME total work in a batch-heavy layout
(256, 96, 96, 64) runs at ~67 TF/s.  Every XLA-level retiling attempt
(space-to-batch, H-splits, width-folding) lost the gap back to data
movement because the retile materialises through HBM.  This kernel does
the retile inside VMEM: each grid step DMAs one haloed spatial tile,
im2cols it in registers, and feeds the MXU a single (RH*TW, 9*C1) x
(9*C1, C2) matmul — K=9*C1 keeps the systolic rows full, so the only
shape loss is N=C2<128 columns, the same bound XLA's best layout has.

The reference's conv layers are cuDNN library calls (SURVEY.md L0); this
is the TPU-native equivalent for the shapes XLA mishandles.  Numerics:
identical contraction order per output pixel to lax.conv (f32
accumulation), golden-tested in tests/test_pallas_conv.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_tile(n: int, pref: int = 128):
    """Largest tile <= pref that divides n (None if nothing reasonable)."""
    for t in (128, 96, 64, 48, 32, 16):
        if t <= pref and n % t == 0:
            return t
    return None


def _kernel(x_hbm, w_ref, o_ref, xt, sem, *, TH, TW, C1, C2, RH, variant):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    # haloed input tile: x_hbm is the (B, H+2, W+8, C1P) padded image.  The
    # W halo is over-fetched to 8 and channels padded to C1P (multiple of
    # 128) because Mosaic requires DMA slice extents on the last two dims to
    # be tile-aligned (8 sublanes x 128 lanes); the pad garbage is never
    # touched by the im2col slices below.
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TH, TH + 2), pl.ds(j * TW, TW + 8), :],
        xt,
        sem,
    )
    cp.start()
    cp.wait()
    for r in range(TH // RH):
        if variant == "im2col":
            cols = [
                xt[r * RH + dy : r * RH + dy + RH, dx : dx + TW, :C1].reshape(RH * TW, C1)
                for dy in range(3)
                for dx in range(3)
            ]
            col = jnp.concatenate(cols, axis=1)  # (RH*TW, 9*C1)
            acc = jnp.dot(col, w_ref[:], preferred_element_type=jnp.float32)
        else:  # sum9: nine K=C1 matmuls, no lane repacking
            acc = jnp.zeros((RH * TW, C2), jnp.float32)
            for t, (dy, dx) in enumerate((dy, dx) for dy in range(3) for dx in range(3)):
                xs = xt[r * RH + dy : r * RH + dy + RH, dx : dx + TW, :C1].reshape(RH * TW, C1)
                acc = acc + jnp.dot(xs, w_ref[t], preferred_element_type=jnp.float32)
        o_ref[0, r * RH : (r + 1) * RH, :, :] = acc.reshape(RH, TW, C2).astype(
            o_ref.dtype
        )


def conv3x3_s1(x, w, *, th=None, tw=None, rh=16, variant="im2col",
               out_dtype=None, interpret=False):
    """3x3 / stride-1 / pad-1 NHWC conv, HWIO weights, f32 accumulation.

    Eligibility: H and W must each be divisible by a tile from
    `pick_tile` (or the explicit th/tw), and TH by rh — asserted below.
    Output dtype defaults to x.dtype.
    """
    B, H, W, C1 = x.shape
    kh, kw, wc1, C2 = w.shape
    assert (kh, kw) == (3, 3) and wc1 == C1, (w.shape, x.shape)
    TH = th or pick_tile(H)
    TW = tw or pick_tile(W)
    assert TH and TW and H % TH == 0 and W % TW == 0, (H, W, TH, TW)
    rh = min(rh, TH)
    assert TH % rh == 0, (TH, rh)
    c1p = -(-C1 // 128) * 128  # lane-aligned channel count for the DMA
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, c1p - C1)))
    if variant == "im2col":
        wk = jnp.asarray(w, x.dtype).reshape(9 * C1, C2)
        wspec = pl.BlockSpec((9 * C1, C2), lambda b, i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    else:
        wk = jnp.asarray(w, x.dtype).reshape(9, C1, C2)
        wspec = pl.BlockSpec((9, C1, C2), lambda b, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    itemsize = np.dtype(x.dtype).itemsize
    return pl.pallas_call(
        functools.partial(_kernel, TH=TH, TW=TW, C1=C1, C2=C2, RH=rh,
                          variant=variant),
        grid=(B, H // TH, W // TW),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), wspec],
        out_specs=pl.BlockSpec((1, TH, TW, C2), lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C2), out_dtype or x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, TW + 8, c1p), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C1 * C2,
            bytes_accessed=(B * H * W * (C1 + C2) + 9 * C1 * C2) * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wk)
