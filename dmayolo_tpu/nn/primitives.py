"""Leaf layers: conv, batchnorm, dense, layernorm, pooling, resize.

Everything is NHWC (TPU-native layout; conv kernels HWIO).  Initialisers
replicate torch defaults (kaiming-uniform a=sqrt(5) == U(±1/sqrt(fan_in)))
so scratch training matches the reference's statistics.

ref mapping: nn.Conv2d/nn.BatchNorm2d/nn.Linear usage throughout
/root/reference/models/common.py; BN eps/momentum overridden to 1e-3/0.03
for every BN by reference initialize_weights (utils/torch_utils.py:161-170).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, Vars

KernelSize = Union[int, Tuple[int, int]]


def _pair(x: KernelSize) -> Tuple[int, int]:
    return (x, x) if isinstance(x, int) else tuple(x)


def autopad(k: KernelSize, p=None):
    """'same' padding for odd kernels.  ref: models/common.py:33-48."""
    if p is None:
        p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
    return p


# ---------------------------------------------------------------------------
# activations (export-safe forms, ref: utils/activations.py)
# ---------------------------------------------------------------------------

def silu(x):
    return jax.nn.silu(x)


def hardswish(x):
    return jax.nn.hard_swish(x)


def leaky_relu(x, slope=0.1):
    return jax.nn.leaky_relu(x, slope)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATIONS = {
    "silu": silu,
    "hardswish": hardswish,
    "leaky0.1": lambda x: leaky_relu(x, 0.1),
    "relu": jax.nn.relu,
    "gelu": gelu,
    "mish": mish,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


# ---------------------------------------------------------------------------
# conv / dense / norms
# ---------------------------------------------------------------------------

class Conv2d(Module):
    """Raw conv (torch nn.Conv2d equivalent), NHWC/HWIO."""

    def __init__(self, c1, c2, k: KernelSize = 1, s: KernelSize = 1, p=None,
                 g: int = 1, d: int = 1, bias: bool = True):
        super().__init__()
        self.c1, self.c2 = c1, c2
        self.k = _pair(k)
        self.s = _pair(s)
        p = autopad(k, p)
        self.p = _pair(p)
        self.g = g
        self.d = _pair(d) if not isinstance(d, tuple) else d
        self.use_bias = bias

    def own_params(self, key):
        kh, kw = self.k
        fan_in = self.c1 // self.g * kh * kw
        bound = 1.0 / np.sqrt(fan_in)
        kkey, bkey = jax.random.split(key)
        params = {
            self.path + ("kernel",): jax.random.uniform(
                kkey, (kh, kw, self.c1 // self.g, self.c2), jnp.float32, -bound, bound
            )
        }
        if self.use_bias:
            params[self.path + ("bias",)] = jax.random.uniform(
                bkey, (self.c2,), jnp.float32, -bound, bound
            )
        return params

    def __call__(self, v: Vars, x):
        ctx = v.ctx
        if ctx.quant_observe is not None:
            # int8 calibration pass (nn/quant.py): record this conv's input
            # dynamic range; the conv itself runs in full precision
            ctx.quant_observe.setdefault(self.path, []).append(
                jnp.max(jnp.abs(x.astype(jnp.float32))))
        s_x = None if ctx.quant is None else ctx.quant.get(self.path)
        if s_x is not None:
            return self._int8_conv(v, x, float(s_x))
        kernel = v.params[self.path + ("kernel",)].astype(v.ctx.dtype)
        x = x.astype(v.ctx.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.s,
            padding=[(self.p[0], self.p[0]), (self.p[1], self.p[1])],
            rhs_dilation=self.d,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.g,
        )
        # (a space-to-depth rewrite of the 6x6/s2 stem was measured SLOWER
        # than XLA's native handling on v5e — don't re-add it)
        bias = v.params.get(self.path + ("bias",))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    def _int8_conv(self, v: Vars, x, s_x: float):
        """int8 PTQ path (nn/quant.py): per-tensor input scale (calibrated),
        per-output-channel symmetric weight scale, int8xint8->int32 on the
        MXU (chip-measured 1.8-3.1x bf16 at v5s shapes,
        experiments/exp_int8_conv.py), dequantised in the serving compute
        dtype.  The dequant epilogue runs in ctx.dtype (bf16 when serving):
        experiments/exp_int8_chain.py measured the f32 epilogue eating 25%
        of the chain (int32->f32 doubles the epilogue write traffic); the
        bf16 epilogue lands within 10% of the no-requant fusion ceiling.
        Quantisation rounding stays f32 (exact thresholds); --fp32 runs
        get the f32 epilogue unchanged."""
        w = v.params[self.path + ("kernel",)].astype(jnp.float32)
        s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
        s_w = jnp.maximum(s_w, 1e-12)
        w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -127, 127).astype(jnp.int8)
        y32 = jax.lax.conv_general_dilated(
            x_q,
            w_q,
            window_strides=self.s,
            padding=[(self.p[0], self.p[0]), (self.p[1], self.p[1])],
            rhs_dilation=self.d,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.g,
            preferred_element_type=jnp.int32,
        )
        dt = v.ctx.dtype
        y = y32.astype(dt) * (s_x * s_w.reshape(1, 1, 1, -1)).astype(dt)
        bias = v.params.get(self.path + ("bias",))
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class BatchNorm2d(Module):
    """BN over NHWC (channel-last).  eps=1e-3, momentum=0.03 — the values the
    reference forces on every BN (utils/torch_utils.py:167-168).

    Training mode computes moments over the (global) batch: under pjit this
    is automatically cross-replica (SyncBN semantics, cf train.py:272-275).
    """

    def __init__(self, c, eps: float = 1e-3, momentum: float = 0.03):
        super().__init__()
        self.c = c
        self.eps = eps
        self.momentum = momentum

    def own_params(self, key):
        return {
            self.path + ("scale",): jnp.ones((self.c,), jnp.float32),
            self.path + ("bias",): jnp.zeros((self.c,), jnp.float32),
        }

    def own_stats(self):
        return {
            self.path + ("mean",): jnp.zeros((self.c,), jnp.float32),
            self.path + ("var",): jnp.ones((self.c,), jnp.float32),
        }

    def __call__(self, v: Vars, x):
        in_dtype = x.dtype
        if self.path + ("scale",) not in v.params:
            # folded into the preceding conv by fuse_params (ctx.fused)
            return x
        scale = v.params[self.path + ("scale",)]
        bias = v.params[self.path + ("bias",)]
        if v.ctx.train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if v.ctx.stats_out is not None:
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                v.ctx.stats_out[self.path + ("mean",)] = (
                    (1 - m) * v.stats[self.path + ("mean",)] + m * mean
                )
                v.ctx.stats_out[self.path + ("var",)] = (
                    (1 - m) * v.stats[self.path + ("var",)] + m * unbiased
                )
        else:
            # inference: the affine is a per-channel (a, b) computed in f32
            # (O(C) work), applied in the ACTIVATION dtype — upcasting the
            # whole tensor to f32 would double the HBM traffic of every
            # unfused BN for a sub-bf16-rounding gain
            mean = v.stats[self.path + ("mean",)]
            var = v.stats[self.path + ("var",)]
            a = jax.lax.rsqrt(var + self.eps) * scale
            b = bias - mean * a
            return x * a.astype(in_dtype) + b.astype(in_dtype)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(in_dtype)


class Dense(Module):
    """torch nn.Linear equivalent; kernel stored (in, out)."""

    def __init__(self, c1, c2, bias: bool = True):
        super().__init__()
        self.c1, self.c2 = c1, c2
        self.use_bias = bias

    def own_params(self, key):
        bound = 1.0 / np.sqrt(self.c1)
        kkey, bkey = jax.random.split(key)
        params = {
            self.path + ("kernel",): jax.random.uniform(
                kkey, (self.c1, self.c2), jnp.float32, -bound, bound
            )
        }
        if self.use_bias:
            params[self.path + ("bias",)] = jax.random.uniform(
                bkey, (self.c2,), jnp.float32, -bound, bound
            )
        return params

    def __call__(self, v: Vars, x):
        kernel = v.params[self.path + ("kernel",)].astype(v.ctx.dtype)
        y = jnp.dot(x.astype(v.ctx.dtype), kernel, preferred_element_type=v.ctx.dtype)
        bias = v.params.get(self.path + ("bias",))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class LayerNorm(Module):
    """LayerNorm on the last axis (channels_last) or axis 3->channels_first
    emulation.  ref: models/common.py:1402-1427 (HorNet LN) and nn.LayerNorm
    uses in the transformer stacks (eps=1e-5 there, 1e-6 for HorNet).
    """

    def __init__(self, c, eps: float = 1e-5):
        super().__init__()
        self.c = c
        self.eps = eps

    def own_params(self, key):
        return {
            self.path + ("scale",): jnp.ones((self.c,), jnp.float32),
            self.path + ("bias",): jnp.zeros((self.c,), jnp.float32),
        }

    def __call__(self, v: Vars, x):
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * v.params[self.path + ("scale",)] + v.params[self.path + ("bias",)]
        return y.astype(in_dtype)


class Dropout(Module):
    def __init__(self, rate: float):
        super().__init__()
        self.rate = rate

    def __call__(self, v: Vars, x):
        if not v.ctx.train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(v.ctx.next_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class DropPath(Module):
    """Stochastic depth per sample.  ref: models/common.py:386-413."""

    def __init__(self, rate: float):
        super().__init__()
        self.rate = rate

    def __call__(self, v: Vars, x):
        if not v.ctx.train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(v.ctx.next_rng(), shape, x.dtype))
        return x / keep * mask


# ---------------------------------------------------------------------------
# pooling / resize (pure functions — shapes static under jit)
# ---------------------------------------------------------------------------

def max_pool(x, k: int, s: int = 1, p: Optional[int] = None):
    """torch MaxPool2d(k, s, p) on NHWC (implicit -inf padding).

    NB: init values must be concrete numpy scalars, not traced arrays —
    otherwise XLA takes the generic reduce_window path which has no
    transpose rule and jit(grad(...)) fails to linearize.
    """
    if p is None:
        p = k // 2 if s == 1 else 0
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = np.array(-np.inf, jax.dtypes.canonicalize_dtype(x.dtype))
    else:
        init = np.array(np.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


def avg_pool(x, k: int, s: Optional[int] = None, p: int = 0):
    """torch AvgPool2d(k, s) on NHWC, count_include_pad=True."""
    s = k if s is None else s
    summed = jax.lax.reduce_window(
        x,
        np.array(0, jax.dtypes.canonicalize_dtype(x.dtype)),
        jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )
    return summed / (k * k)


def adaptive_avg_pool_h(x):
    """AdaptiveAvgPool2d((None, 1)): mean over W -> (B, H, 1, C)."""
    return jnp.mean(x, axis=2, keepdims=True)


def adaptive_avg_pool_w(x):
    """AdaptiveAvgPool2d((1, None)): mean over H -> (B, 1, W, C)."""
    return jnp.mean(x, axis=1, keepdims=True)


def global_avg_pool(x):
    """AdaptiveAvgPool2d(1) -> (B, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def global_max_pool(x):
    return jnp.max(x, axis=(1, 2), keepdims=True)


def upsample_nearest(x, scale: int):
    """Nearest-neighbour integer upsample = repeat (zero-FLOP reshape on XLA)."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def resize_nearest(x, size: Tuple[int, int]):
    """Nearest resize to (H, W) matching torch F.interpolate(mode='nearest')."""
    b, h, w, c = x.shape
    th, tw = size
    if th % h == 0 and tw % w == 0 and th // h == tw // w:
        return upsample_nearest(x, th // h)
    rows = (jnp.arange(th) * h // th).astype(jnp.int32)
    cols = (jnp.arange(tw) * w // tw).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def space_to_depth_2x(x):
    """SPD-Conv slice-cat: (B,H,W,C) -> (B,H/2,W/2,4C).

    ref: models/common.py:1451-1458 — on TPU this is a pure
    reshape/transpose (zero cost).  Channel order matches the reference's
    cat([::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2]).
    """
    tl = x[:, ::2, ::2]
    bl = x[:, 1::2, ::2]
    tr = x[:, ::2, 1::2]
    br = x[:, 1::2, 1::2]
    return jnp.concatenate([tl, bl, tr, br], axis=-1)
