"""The module zoo — every block family of the reference, re-designed NHWC/JAX.

Each class documents the reference block it is feature-parity with
(file:line into /root/reference).  Param paths mirror the torch module
paths 1:1 ("cv1"/"conv"/"bn"/"m"/"0"...), which makes the torch-checkpoint
importer a mechanical transform (see utils/torch_import.py).

TPU notes:
  * space_to_depth / Focus slicing are pure reshapes — free under XLA;
  * BN folds into convs for inference (fuse_params), and even unfused the
    BN affine fuses into the conv epilogue;
  * Swin attention masks are computed host-side per static (H, W) and
    baked in as constants;
  * everything broadcasts over batch — no python loops over images.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .module import Identity, Module, Sequential, Vars
from .primitives import (
    ACTIVATIONS,
    BatchNorm2d,
    Conv2d,
    Dense,
    Dropout,
    DropPath,
    LayerNorm,
    adaptive_avg_pool_h,
    adaptive_avg_pool_w,
    autopad,
    avg_pool,
    gelu,
    global_avg_pool,
    global_max_pool,
    hardswish,
    leaky_relu,
    max_pool,
    resize_nearest,
    silu,
    space_to_depth_2x,
    upsample_nearest,
)


def _act_fn(act):
    """Resolve the reference's `act=True/False/module` convention."""
    if act is True:
        return silu
    if act is False or act is None:
        return lambda x: x
    if isinstance(act, str):
        return ACTIVATIONS[act]
    return act


class ConvBN(Module):
    """Conv2d + BN + SiLU — the reference's `Conv` (models/common.py:50-77).

    In fused mode (ctx.fused) BN has been folded into conv kernel+bias by
    `fuse_params` and is skipped, matching reference forward_fuse.
    """

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        self.conv = self.add("conv", Conv2d(c1, c2, k, s, p, g=g, bias=False))
        self.bn = self.add("bn", BatchNorm2d(c2))
        self.act = _act_fn(act)
        self.c1, self.c2 = c1, c2

    def __call__(self, v: Vars, x):
        y = self.conv(v, x)
        if not v.ctx.fused:
            y = self.bn(v, y)
        return self.act(y)


class DWConv(ConvBN):
    """Depthwise-ish conv with groups=gcd(c1,c2).  ref: common.py:79-82."""

    def __init__(self, c1, c2, k=1, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class Focus(Module):
    """2x2 pixel-unshuffle + conv.  ref: common.py:84-95."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        self.conv = self.add("conv", ConvBN(c1 * 4, c2, k, s, p, g, act))

    def __call__(self, v: Vars, x):
        return self.conv(v, space_to_depth_2x(x))


class Bottleneck(Module):
    """1x1 -> 3x3 (+residual).  ref: common.py:119-137."""

    def __init__(self, c1, c2, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c_, c2, 3, 1, g=g))
        self.residual = shortcut and c1 == c2

    def __call__(self, v: Vars, x):
        y = self.cv2(v, self.cv1(v, x))
        return x + y if self.residual else y


class BottleneckCSP(Module):
    """CSP stack.  ref: common.py:139-157."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", Conv2d(c1, c_, 1, 1, bias=False))
        self.cv3 = self.add("cv3", Conv2d(c_, c_, 1, 1, bias=False))
        self.cv4 = self.add("cv4", ConvBN(2 * c_, c2, 1, 1))
        self.bn = self.add("bn", BatchNorm2d(2 * c_))
        self.m = self.add("m", Sequential([Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)]))

    def __call__(self, v: Vars, x):
        y1 = self.cv3(v, self.m(v, self.cv1(v, x)))
        y2 = self.cv2(v, x)
        return self.cv4(v, silu(self.bn(v, jnp.concatenate([y1, y2], axis=-1))))


class C3(Module):
    """CSP bottleneck with 3 convs — the workhorse.  ref: common.py:159-182."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.c_ = c_
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c1, c_, 1, 1))
        self.cv3 = self.add("cv3", ConvBN(2 * c_, c2, 1))
        self.m = self.add("m", self.make_inner(c1, c2, n, shortcut, g, e))

    def make_inner(self, c1, c2, n, shortcut, g, e):
        c_ = int(c2 * e)
        return Sequential([Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)])

    def __call__(self, v: Vars, x):
        return self.cv3(v, jnp.concatenate([self.m(v, self.cv1(v, x)), self.cv2(v, x)], axis=-1))


class C3TR(C3):
    """C3 with a ViT TransformerBlock.  ref: common.py:184-189."""

    def make_inner(self, c1, c2, n, shortcut, g, e):
        c_ = int(c2 * e)
        return TransformerBlock(c_, c_, 4, n)


class C3STR(C3):
    """C3 with SwinTransformerBlock (DMA TPH head).  ref: common.py:191-196."""

    def make_inner(self, c1, c2, n, shortcut, g, e):
        c_ = int(c2 * e)
        if c_ < 32:  # ref uses c_//32 heads and crashes identically at 0
            raise ValueError(
                f"C3STR needs >= 32 hidden channels for c_//32 attention "
                f"heads, got c_={c_} (c2={c2}, e={e}) — width_multiple too "
                f"small for this config")
        return SwinTransformerBlock(c_, c_, c_ // 32, n)


class C3SPP(C3):
    """ref: common.py:198-203.  NOTE arg order (c1, c2, k, n, ...)"""

    def __init__(self, c1, c2, k=(5, 9, 13), n=1, shortcut=True, g=1, e=0.5):
        self._k = k
        super().__init__(c1, c2, n, shortcut, g, e)

    def make_inner(self, c1, c2, n, shortcut, g, e):
        c_ = int(c2 * e)
        return SPP(c_, c_, self._k)


class C3Ghost(C3):
    """ref: common.py:205-210."""

    def make_inner(self, c1, c2, n, shortcut, g, e):
        c_ = int(c2 * e)
        return Sequential([GhostBottleneck(c_, c_) for _ in range(n)])


class SPP(Module):
    """Spatial pyramid pooling.  ref: common.py:212-227."""

    def __init__(self, c1, c2, k=(5, 9, 13)):
        super().__init__()
        c_ = c1 // 2
        self.k = k
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c_ * (len(k) + 1), c2, 1, 1))

    def __call__(self, v: Vars, x):
        x = self.cv1(v, x)
        pools = [max_pool(x, k, 1, k // 2) for k in self.k]
        return self.cv2(v, jnp.concatenate([x] + pools, axis=-1))


class ASPP(Module):
    """Atrous SPP.  ref: common.py:229-241."""

    def __init__(self, c1, c2, k=(5, 9, 13)):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.m = self.add(
            "m",
            Sequential(
                [Conv2d(c_, c_, 3, 1, p=(x - 1) // 2, d=(x - 1) // 2, bias=False) for x in k]
            ),
        )
        self.cv2 = self.add("cv2", ConvBN(c_ * (len(k) + 2), c2, 1, 1))

    def __call__(self, v: Vars, x):
        x = self.cv1(v, x)
        branches = [x, max_pool(x, 3, 1, 1)] + [m(v, x) for m in self.m.mods]
        return self.cv2(v, jnp.concatenate(branches, axis=-1))


class SPPF(Module):
    """Serial-pool SPP (fast).  ref: common.py:243-258."""

    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.k = k
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c_ * 4, c2, 1, 1))

    def __call__(self, v: Vars, x):
        x = self.cv1(v, x)
        y1 = max_pool(x, self.k, 1, self.k // 2)
        y2 = max_pool(y1, self.k, 1, self.k // 2)
        y3 = max_pool(y2, self.k, 1, self.k // 2)
        return self.cv2(v, jnp.concatenate([x, y1, y2, y3], axis=-1))


# ---------------------------------------------------------------------------
# CBAM attention (ref: common.py:260-310)
# ---------------------------------------------------------------------------

class ChannelAttentionModule(Module):
    def __init__(self, c1, reduction=16):
        super().__init__()
        mid = c1 // reduction
        self.shared_mlp = self.add(
            "shared_MLP", Sequential([Dense(c1, mid), Identity(), Dense(mid, c1)])
        )
        # torch Sequential(Linear, ReLU, Linear): relu sits at index 1 (no params)

    def _mlp(self, v, x):
        mods = self.shared_mlp.mods
        return mods[2](v, jax.nn.relu(mods[0](v, x)))

    def __call__(self, v: Vars, x):
        avg = self._mlp(v, global_avg_pool(x)[:, 0, 0, :])[:, None, None, :]
        mx = self._mlp(v, global_max_pool(x)[:, 0, 0, :])[:, None, None, :]
        return jax.nn.sigmoid(avg + mx)


class SpatialAttentionModule(Module):
    def __init__(self):
        super().__init__()
        self.conv2d = self.add("conv2d", Conv2d(2, 1, 7, 1, p=3, bias=True))

    def __call__(self, v: Vars, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        return jax.nn.sigmoid(self.conv2d(v, jnp.concatenate([avg, mx], axis=-1)))


class CBAM(Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.channel_attention = self.add("channel_attention", ChannelAttentionModule(c1))
        self.spatial_attention = self.add("spatial_attention", SpatialAttentionModule())

    def __call__(self, v: Vars, x):
        out = self.channel_attention(v, x) * x
        return self.spatial_attention(v, out) * out


# ---------------------------------------------------------------------------
# ViT transformer (ref: common.py:312-355)
# ---------------------------------------------------------------------------

class MultiheadAttention(Module):
    """torch nn.MultiheadAttention equivalent (batch of sequences, NLC)."""

    def __init__(self, c, num_heads):
        super().__init__()
        self.c = c
        self.h = num_heads
        self.out_proj = self.add("out_proj", Dense(c, c))

    def own_params(self, key):
        bound = 1.0 / np.sqrt(self.c)
        k1, k2 = jax.random.split(key)
        return {
            # torch in_proj_weight is (3c, c); ours transposed (c, 3c)
            self.path + ("in_proj_kernel",): jax.random.uniform(
                k1, (self.c, 3 * self.c), jnp.float32, -bound, bound
            ),
            self.path + ("in_proj_bias",): jnp.zeros((3 * self.c,), jnp.float32),
        }

    def __call__(self, v: Vars, qkv):
        q, k, val = qkv  # each (B, L, C)
        w = v.params[self.path + ("in_proj_kernel",)].astype(v.ctx.dtype)
        b = v.params[self.path + ("in_proj_bias",)].astype(v.ctx.dtype)
        wq, wk, wv = jnp.split(w, 3, axis=1)
        bq, bk, bv = jnp.split(b, 3)
        q = jnp.dot(q.astype(v.ctx.dtype), wq) + bq
        k = jnp.dot(k.astype(v.ctx.dtype), wk) + bk
        val = jnp.dot(val.astype(v.ctx.dtype), wv) + bv

        B, L, C = q.shape
        hd = C // self.h

        def split_heads(t):
            return t.reshape(B, L, self.h, hd).transpose(0, 2, 1, 3)

        q, k, val = split_heads(q), split_heads(k), split_heads(val)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / np.sqrt(hd), axis=-1).astype(val.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, val)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return self.out_proj(v, out)


class TransformerLayer(Module):
    """Pre-LN ViT encoder layer (with the reference's extra q/k/v linears).
    ref: common.py:312-336."""

    def __init__(self, c, num_heads):
        super().__init__()
        self.ln1 = self.add("ln1", LayerNorm(c))
        self.q = self.add("q", Dense(c, c, bias=False))
        self.k = self.add("k", Dense(c, c, bias=False))
        self.v = self.add("v", Dense(c, c, bias=False))
        self.ma = self.add("ma", MultiheadAttention(c, num_heads))
        self.ln2 = self.add("ln2", LayerNorm(c))
        self.fc1 = self.add("fc1", Dense(c, 4 * c, bias=False))
        self.fc2 = self.add("fc2", Dense(4 * c, c, bias=False))
        self.dropout = self.add("dropout", Dropout(0.1))

    def __call__(self, v: Vars, x):
        x_ = self.ln1(v, x)
        x = self.dropout(v, self.ma(v, (self.q(v, x_), self.k(v, x_), self.v(v, x_)))) + x
        x_ = self.ln2(v, x)
        x_ = self.fc2(v, self.dropout(v, jax.nn.relu(self.fc1(v, x_))))
        return x + self.dropout(v, x_)


class TransformerBlock(Module):
    """ViT encoder over flattened HxW tokens.  ref: common.py:338-355."""

    def __init__(self, c1, c2, num_heads, num_layers):
        super().__init__()
        self.conv = self.add("conv", ConvBN(c1, c2)) if c1 != c2 else None
        self.linear = self.add("linear", Dense(c2, c2))  # learned positional embedding
        self.tr = self.add("tr", Sequential([TransformerLayer(c2, num_heads) for _ in range(num_layers)]))
        self.c2 = c2

    def __call__(self, v: Vars, x):
        if self.conv is not None:
            x = self.conv(v, x)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)  # tokens
        y = self.tr(v, p + self.linear(v, p))
        return y.reshape(b, h, w, self.c2)


class Contract(Module):
    """Space -> channel, torch channel ordering (s1, s2, c).  ref: common.py:357-369."""

    def __init__(self, gain=2):
        super().__init__()
        self.gain = gain

    def __call__(self, v: Vars, x):
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h // s, s, w // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // s, w // s, s * s * c)


class Expand(Module):
    """Channel -> space inverse of Contract.  ref: common.py:371-384."""

    def __init__(self, gain=2):
        super().__init__()
        self.gain = gain

    def __call__(self, v: Vars, x):
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h, w, s, s, c // s**2)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * s, w * s, c // s**2)


# ---------------------------------------------------------------------------
# Swin transformer stack (ref: common.py:415-654)
# ---------------------------------------------------------------------------

def _relative_position_index(m: int) -> np.ndarray:
    """Pairwise relative-position index inside an m x m window (host-side)."""
    coords = np.stack(np.meshgrid(np.arange(m), np.arange(m), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += m - 1
    rel[:, :, 1] += m - 1
    rel[:, :, 0] *= 2 * m - 1
    return rel.sum(-1)  # (m*m, m*m)


def _swin_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask for a padded (hp, wp) map — static, host-side.
    ref: common.py:569-593."""
    img = np.zeros((hp, wp))
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    nh, nw = hp // window, wp // window
    windows = img.reshape(nh, window, nw, window).transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)  # (nW, m*m, m*m)


def window_partition(x, window: int):
    """(B,H,W,C) -> (B*nW, window, window, C).  ref: common.py:415-430."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)


def window_reverse(windows, window: int, h: int, w: int):
    """Inverse of window_partition.  ref: common.py:432-450."""
    b = windows.shape[0] // (h * w // window // window)
    x = windows.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(Module):
    """W-MSA with relative position bias.  ref: common.py:452-545."""

    def __init__(self, dim, window: int, num_heads, qkv_bias=False):
        super().__init__()
        self.dim = dim
        self.window = window
        self.h = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = self.add("qkv", Dense(dim, dim * 3, bias=qkv_bias))
        self.proj = self.add("proj", Dense(dim, dim))
        self.rel_index = _relative_position_index(window)  # (m2, m2) numpy

    def own_params(self, key):
        n = (2 * self.window - 1) ** 2
        table = 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, (n, self.h), jnp.float32)
        return {self.path + ("relative_position_bias_table",): table}

    def __call__(self, v: Vars, x, mask: Optional[jax.Array] = None):
        bw, n, c = x.shape  # (B*nW, m*m, C)
        qkv = self.qkv(v, x).reshape(bw, n, 3, self.h, c // self.h)
        q, k, val = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (bw, h, n, d)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q * self.scale, k, preferred_element_type=jnp.float32)
        table = v.params[self.path + ("relative_position_bias_table",)]
        bias = table[self.rel_index.reshape(-1)].reshape(n, n, self.h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.h, n, n) + mask[None, :, None]
            attn = attn.reshape(bw, self.h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(val.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, val).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return self.proj(v, out)


class Mlp(Module):
    """ViT MLP.  ref: common.py:97-117."""

    def __init__(self, c, hidden=None, out=None, drop=0.0):
        super().__init__()
        self.fc1 = self.add("fc1", Dense(c, hidden or c))
        self.fc2 = self.add("fc2", Dense(hidden or c, out or c))
        self.drop = self.add("drop", Dropout(drop))

    def __call__(self, v: Vars, x):
        return self.drop(v, self.fc2(v, self.drop(v, gelu(self.fc1(v, x)))))


class SwinTransformerLayer(Module):
    """(S)W-MSA layer with pad/roll/mask.  ref: common.py:547-637."""

    def __init__(self, c, num_heads, window=7, shift=0):
        super().__init__()
        drop_path = 0.1 if num_heads > 10 else 0.0
        self.window = window
        self.shift = shift
        self.norm1 = self.add("norm1", LayerNorm(c))
        self.attn = self.add("attn", WindowAttention(c, window, num_heads))
        self.drop_path = self.add("drop_path", DropPath(drop_path))
        self.norm2 = self.add("norm2", LayerNorm(c))
        self.mlp = self.add("mlp", Mlp(c, hidden=int(c * 4)))

    def __call__(self, v: Vars, x):
        b, h, w, c = x.shape
        shortcut = x
        x = self.norm1(v, x)

        pad_b = (self.window - h % self.window) % self.window
        pad_r = (self.window - w % self.window) % self.window
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if self.shift > 0:
            shifted = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_swin_attn_mask(hp, wp, self.window, self.shift))
        else:
            shifted = x
            mask = None

        windows = window_partition(shifted, self.window).reshape(-1, self.window**2, c)
        attn_w = self.attn(v, windows, mask)
        attn_w = attn_w.reshape(-1, self.window, self.window, c)
        shifted = window_reverse(attn_w, self.window, hp, wp)

        if self.shift > 0:
            x = jnp.roll(shifted, (self.shift, self.shift), axis=(1, 2))
        else:
            x = shifted
        x = x[:, :h, :w]

        x = shortcut + self.drop_path(v, x)
        return x + self.drop_path(v, self.mlp(v, self.norm2(v, x)))


class SwinTransformerBlock(Module):
    """Alternating-shift Swin stack, window=8.  ref: common.py:639-654."""

    def __init__(self, c1, c2, num_heads, num_layers, window=8):
        super().__init__()
        self.conv = self.add("conv", ConvBN(c1, c2)) if c1 != c2 else None
        self.tr = self.add(
            "tr",
            Sequential(
                [
                    SwinTransformerLayer(
                        c2, num_heads, window, shift=0 if i % 2 == 0 else window // 2
                    )
                    for i in range(num_layers)
                ]
            ),
        )

    def __call__(self, v: Vars, x):
        if self.conv is not None:
            x = self.conv(v, x)
        return self.tr(v, x)


class Concat(Module):
    """Channel concat.  ref: common.py:656-664 (dim=1 NCHW == axis -1 NHWC)."""

    def __init__(self, dimension=1):
        super().__init__()

    def __call__(self, v: Vars, xs):
        return jnp.concatenate(xs, axis=-1)


# ---------------------------------------------------------------------------
# Ghost v1 (ref: common.py:666-699)
# ---------------------------------------------------------------------------

class GhostConv(Module):
    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = self.add("cv1", ConvBN(c1, c_, k, s, None, g, act))
        self.cv2 = self.add("cv2", ConvBN(c_, c_, 5, 1, None, c_, act))

    def __call__(self, v: Vars, x):
        y = self.cv1(v, x)
        return jnp.concatenate([y, self.cv2(v, y)], axis=-1)


class GhostBottleneck(Module):
    def __init__(self, c1, c2, k=3, s=1):
        super().__init__()
        c_ = c2 // 2
        self.conv = self.add(
            "conv",
            Sequential(
                [
                    GhostConv(c1, c_, 1, 1),
                    DWConv(c_, c_, k, s, act=False) if s == 2 else Identity(),
                    GhostConv(c_, c2, 1, 1, act=False),
                ]
            ),
        )
        self.shortcut = self.add(
            "shortcut",
            Sequential([DWConv(c1, c1, k, s, act=False), ConvBN(c1, c2, 1, 1, act=False)])
            if s == 2
            else Identity(),
        )

    def __call__(self, v: Vars, x):
        return self.conv(v, x) + self.shortcut(v, x)


# ---------------------------------------------------------------------------
# Adaptive / BiFPN fusion family (ref: common.py:913-1155)
# ---------------------------------------------------------------------------

class AddConvBlock(Module):
    """conv + BN + LeakyReLU(0.1) (`add_conv`).  ref: common.py:1063-1081.
    torch Sequential names: conv / batch_norm / leaky."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = self.add("conv", Conv2d(c1, c2, k, s, p=(k - 1) // 2, bias=False))
        self.bn = self.add("batch_norm", BatchNorm2d(c2))

    def __call__(self, v: Vars, x):
        return leaky_relu(self.bn(v, self.conv(v, x)), 0.1)


class AdaptADD(Module):
    """Softmax-weighted multi-level add (ASFF-style).  ref: common.py:913-951."""

    def __init__(self, level, out_ch, dimension, dim1, dim2, dim3=1, rfb=False):
        super().__init__()
        self.level = level
        compress_c = 8 if rfb else 16
        self.compress_level = self.add("compress_level", AddConvBlock(dim3, dim1, 1, 1))
        self.weight_map = self.add("weight_map", AddConvBlock(dim1, compress_c, 1, 1))
        self.weight_levels = self.add("weight_levels", Conv2d(compress_c * level, level, 1, bias=True))
        self.expand = self.add("expand", AddConvBlock(dim1, out_ch, 3, 1))

    def __call__(self, v: Vars, xs):
        weights = [self.weight_map(v, xs[0]), self.weight_map(v, xs[1])]
        mapped = None
        if self.level == 3:
            mapped = self.compress_level(v, xs[2])
            weights.append(self.weight_map(v, mapped))
        w = jax.nn.softmax(self.weight_levels(v, jnp.concatenate(weights, axis=-1)), axis=-1)
        if self.level == 2:
            fused = xs[0] * w[..., 0:1] + xs[1] * w[..., 1:]
        else:
            fused = xs[0] * w[..., 0:1] + xs[1] * w[..., 1:2] + mapped * w[..., 2:]
        return self.expand(v, fused)


class AdaptConcat(Module):
    """Softmax-weighted multi-level concat.  ref: common.py:953-992."""

    def __init__(self, level, dimension, dim1, dim2, dim3=1, rfb=False):
        super().__init__()
        self.level = level
        compress_c = 8 if rfb else 16
        self.weight_map0 = self.add("weight_map0", AddConvBlock(dim1, compress_c, 1, 1))
        self.weight_map1 = self.add("weight_map1", AddConvBlock(dim2, compress_c, 1, 1))
        self.weight_map2 = self.add("weight_map2", AddConvBlock(dim3, compress_c, 1, 1))
        self.weight_levels = self.add("weight_levels", Conv2d(compress_c * level, level, 1, bias=True))

    def __call__(self, v: Vars, xs):
        weights = [self.weight_map0(v, xs[0]), self.weight_map1(v, xs[1])]
        if self.level == 3:
            weights.append(self.weight_map2(v, xs[2]))
        w = jax.nn.softmax(self.weight_levels(v, jnp.concatenate(weights, axis=-1)), axis=-1)
        parts = [xs[0] * w[..., 0:1], xs[1] * w[..., 1:2]]
        if self.level == 3:
            parts.append(xs[2] * w[..., 2:])
        return jnp.concatenate(parts, axis=-1)


class AdConcat2(Module):
    """BiFPN fast-normalised weighted concat, 2 inputs.  ref: common.py:994-1008."""

    n_in = 2

    def __init__(self, dimension=1):
        super().__init__()

    def own_params(self, key):
        return {self.path + ("w",): jnp.ones((self.n_in,), jnp.float32)}

    def __call__(self, v: Vars, xs):
        w = v.params[self.path + ("w",)]
        w = w / (jnp.sum(w) + 1e-4)
        return jnp.concatenate([w[i] * xs[i] for i in range(self.n_in)], axis=-1)


class AdConcat3(AdConcat2):
    """3-input variant.  ref: common.py:1010-1026."""

    n_in = 3


class AdaptAdd2(Module):
    """BiFPN weighted add + SiLU, 2 inputs (`Adapt_Add2`).  ref: common.py:1028-1044."""

    def __init__(self):
        super().__init__()

    def own_params(self, key):
        return {self.path + ("w",): jnp.ones((2,), jnp.float32)}

    def __call__(self, v: Vars, xs):
        w = v.params[self.path + ("w",)]
        w = w / (jnp.sum(w) + 1e-4)
        return silu(w[0] * xs[0] + w[1] * xs[1])


class AdaptAdd3(Module):
    """3-input weighted add with a shared 1x1 projection on inputs 0/1
    (`Adapt_Add3`).  ref: common.py:1046-1061."""

    def __init__(self, d1, d2, d3):
        super().__init__()
        self.conv = self.add("conv", Conv2d(d1, d3, 1, bias=True))

    def own_params(self, key):
        own = {self.path + ("w",): jnp.ones((3,), jnp.float32)}
        return own

    def __call__(self, v: Vars, xs):
        w = v.params[self.path + ("w",)]
        w = w / (jnp.sum(w) + 1e-4)
        return silu(w[0] * self.conv(v, xs[0]) + w[1] * self.conv(v, xs[1]) + w[2] * xs[2])


class ASFF(Module):
    """Adaptive spatial feature fusion over 3 fixed-dim levels.
    ref: common.py:1083-1154 (dims hard-coded [512, 256, 256])."""

    def __init__(self, level, rfb=False, vis=False):
        super().__init__()
        self.level = level
        self.dim = [512, 256, 256]
        inter = self.dim[level]
        self.inter = inter
        if level == 0:
            self.stride_level_1 = self.add("stride_level_1", AddConvBlock(self.dim[1], inter, 3, 2))
            self.stride_level_2 = self.add("stride_level_2", AddConvBlock(self.dim[2], inter, 3, 2))
            self.expand = self.add("expand", AddConvBlock(inter, 1024, 3, 1))
        elif level == 1:
            self.compress_level_0 = self.add("compress_level_0", AddConvBlock(self.dim[0], inter, 1, 1))
            self.stride_level_2 = self.add("stride_level_2", AddConvBlock(self.dim[2], inter, 3, 2))
            self.expand = self.add("expand", AddConvBlock(inter, 512, 3, 1))
        else:
            self.compress_level_0 = self.add("compress_level_0", AddConvBlock(self.dim[0], inter, 1, 1))
            if self.dim[1] != self.dim[2]:
                self.compress_level_1 = self.add("compress_level_1", AddConvBlock(self.dim[1], inter, 1, 1))
            self.expand = self.add("expand", AddConvBlock(inter, 256, 3, 1))
        compress_c = 8 if rfb else 16
        self.weight_level_0 = self.add("weight_level_0", AddConvBlock(inter, compress_c, 1, 1))
        self.weight_level_1 = self.add("weight_level_1", AddConvBlock(inter, compress_c, 1, 1))
        self.weight_level_2 = self.add("weight_level_2", AddConvBlock(inter, compress_c, 1, 1))
        self.weight_levels = self.add("weight_levels", Conv2d(compress_c * 3, 3, 1, bias=True))

    def __call__(self, v: Vars, xs):
        x0, x1, x2 = xs  # level_0 smallest spatial, level_2 largest
        if self.level == 0:
            r0 = x0
            r1 = self.stride_level_1(v, x1)
            r2 = self.stride_level_2(v, max_pool(x2, 3, 2, 1))
        elif self.level == 1:
            r0 = upsample_nearest(self.compress_level_0(v, x0), 2)
            r1 = x1
            r2 = self.stride_level_2(v, x2)
        else:
            r0 = upsample_nearest(self.compress_level_0(v, x0), 4)
            if self.dim[1] != self.dim[2]:
                r1 = upsample_nearest(self.compress_level_1(v, x1), 2)
            else:
                r1 = upsample_nearest(x1, 2)
            r2 = x2
        wv = jnp.concatenate(
            [self.weight_level_0(v, r0), self.weight_level_1(v, r1), self.weight_level_2(v, r2)],
            axis=-1,
        )
        w = jax.nn.softmax(self.weight_levels(v, wv), axis=-1)
        fused = r0 * w[..., 0:1] + r1 * w[..., 1:2] + r2 * w[..., 2:]
        return self.expand(v, fused)


# ---------------------------------------------------------------------------
# Coordinate attention + C3CA (the DMA core contribution)
# ---------------------------------------------------------------------------

class CoorAttention(Module):
    """Coordinate Attention (CVPR21).  ref: common.py:1158-1207."""

    def __init__(self, c1, c2, reduction=32):
        super().__init__()
        c_ = max(8, c1 // reduction)
        self.conv1 = self.add("conv1", Conv2d(c1, c_, 1, bias=True))
        self.bn1 = self.add("bn1", BatchNorm2d(c_))
        self.conv_w = self.add("conv_w", Conv2d(c_, c2, 1, bias=True))
        self.conv_h = self.add("conv_h", Conv2d(c_, c2, 1, bias=True))

    def __call__(self, v: Vars, x):
        b, h, w, c = x.shape
        x_h = adaptive_avg_pool_h(x)  # (B, H, 1, C)
        x_w = adaptive_avg_pool_w(x).transpose(0, 2, 1, 3)  # (B, W, 1, C)
        y = jnp.concatenate([x_h, x_w], axis=1)  # (B, H+W, 1, C)
        y = hardswish(self.bn1(v, self.conv1(v, y)))
        y_h, y_w = y[:, :h], y[:, h:]
        a_h = jax.nn.sigmoid(self.conv_h(v, y_h))  # (B, H, 1, C2)
        a_w = jax.nn.sigmoid(self.conv_w(v, y_w.transpose(0, 2, 1, 3)))  # (B, 1, W, C2)
        return x * a_w * a_h


class CABottleneck(Module):
    """Bottleneck + CA.  ref: common.py:1209-1227."""

    def __init__(self, c1, c2, shortcut=True, g=1, e=0.5, reduction=32):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c_, c2, 3, 1, g=g))
        self.ca = self.add("ca", CoorAttention(c2, c2, reduction))
        self.residual = shortcut and c1 == c2

    def __call__(self, v: Vars, x):
        y = self.ca(v, self.cv2(v, self.cv1(v, x)))
        return x + y if self.residual else y


class C3CA(C3):
    """C3 with CABottleneck — DMA flagship block.  ref: common.py:1229-1235."""

    def make_inner(self, c1, c2, n, shortcut, g, e):
        c_ = int(c2 * e)
        return Sequential([CABottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)])


class BAM(C3CA):
    """Duplicate alias of C3CA in the reference.  ref: common.py:1581-1587."""


class SPPCSPC(Module):
    """CSP-SPP (yolov7-style), parallel pools.  ref: common.py:1237-1255."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5, k=(5, 9, 13)):
        super().__init__()
        c_ = int(2 * c2 * e)
        self.k = k
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c1, c_, 1, 1))
        self.cv3 = self.add("cv3", ConvBN(c_, c_, 3, 1))
        self.cv4 = self.add("cv4", ConvBN(c_, c_, 1, 1))
        self.cv5 = self.add("cv5", ConvBN(4 * c_, c_, 1, 1))
        self.cv6 = self.add("cv6", ConvBN(c_, c_, 3, 1))
        self.cv7 = self.add("cv7", ConvBN(2 * c_, c2, 1, 1))

    def __call__(self, v: Vars, x):
        x1 = self.cv4(v, self.cv3(v, self.cv1(v, x)))
        pools = [max_pool(x1, k, 1, k // 2) for k in self.k]
        y1 = self.cv6(v, self.cv5(v, jnp.concatenate([x1] + pools, axis=-1)))
        y2 = self.cv2(v, x)
        return self.cv7(v, jnp.concatenate([y1, y2], axis=-1))


class SPPFCSPC(Module):
    """Serial-pool CSP-SPP — DMA neck.  ref: common.py:1257-1276."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5, k=5):
        super().__init__()
        c_ = int(2 * c2 * e)
        self.k = k
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c1, c_, 1, 1))
        self.cv3 = self.add("cv3", ConvBN(c_, c_, 3, 1))
        self.cv4 = self.add("cv4", ConvBN(c_, c_, 1, 1))
        self.cv5 = self.add("cv5", ConvBN(4 * c_, c_, 1, 1))
        self.cv6 = self.add("cv6", ConvBN(c_, c_, 3, 1))
        self.cv7 = self.add("cv7", ConvBN(2 * c_, c2, 1, 1))

    def __call__(self, v: Vars, x):
        x1 = self.cv4(v, self.cv3(v, self.cv1(v, x)))
        x2 = max_pool(x1, self.k, 1, self.k // 2)
        x3 = max_pool(x2, self.k, 1, self.k // 2)
        x4 = max_pool(x3, self.k, 1, self.k // 2)
        y1 = self.cv6(v, self.cv5(v, jnp.concatenate([x1, x2, x3, x4], axis=-1)))
        y2 = self.cv2(v, x)
        return self.cv7(v, jnp.concatenate([y1, y2], axis=-1))


class SCConv(Module):
    """Self-calibrated conv.  ref: common.py:1279-1316.
    torch Sequential names inside k2/k3/k4 are positional ("0","1","2")."""

    def __init__(self, c1, c2, stride=1, groups=1, dilation=1, pooling_r=4):
        super().__init__()
        self.pooling_r = pooling_r
        # k2: AvgPool(r) -> conv3x3 -> BN   (pool is index 0, no params)
        self.k2 = self.add(
            "k2",
            Sequential([Identity(), Conv2d(c1, c1, 3, 1, d=dilation, g=groups, bias=False), BatchNorm2d(c1)]),
        )
        self.k3 = self.add(
            "k3", Sequential([Conv2d(c1, c1, 3, 1, d=dilation, g=groups, bias=False), BatchNorm2d(c1)])
        )
        self.k4 = self.add(
            "k4", Sequential([Conv2d(c1, c2, 3, stride, d=dilation, g=groups, bias=False), BatchNorm2d(c2)])
        )

    def __call__(self, v: Vars, x):
        b, h, w, c = x.shape
        r = self.pooling_r
        pooled = avg_pool(x, r)
        y = self.k2(v, pooled)
        if h % r == 0 and w % r == 0:
            # nearest-upsample as an in-register broadcast on a blocked view
            # of x: jnp.repeat materialises the full-res gate operand
            # (~840 MB at stem scale, a measured 3.4 ms broadcast on v5e);
            # the blocked form fuses into the gate elementwise.
            xb = x.reshape(b, h // r, r, w // r, r, c)
            gate = jax.nn.sigmoid(xb + y[:, :, None, :, None, :]).reshape(b, h, w, c)
        else:
            gate = jax.nn.sigmoid(x + resize_nearest(y, (h, w)))
        out = self.k3(v, x) * gate
        return self.k4(v, out)


# ---------------------------------------------------------------------------
# HorNet recursive gated conv (ref: common.py:1318-1439)
# ---------------------------------------------------------------------------

class GnConv(Module):
    """Recursive gated conv, order 5.  ref: common.py:1318-1359."""

    def __init__(self, c1, c2, ksize=1, stride=1, order=5, s=1.0):
        super().__init__()
        self.order = order
        self.dims = [c1 // 2**i for i in range(order)][::-1]
        self.scale = s
        self.proj_in = self.add("proj_in", Conv2d(c1, 2 * c1, 1, bias=True))
        d = sum(self.dims)
        self.dwconv = self.add("dwconv", Conv2d(d, d, 7, p=3, g=d, bias=True))
        self.proj_out = self.add("proj_out", ConvBN(c1, c2, ksize, stride))
        self.pws = self.add(
            "pws",
            Sequential([Conv2d(self.dims[i], self.dims[i + 1], 1, bias=True) for i in range(order - 1)]),
        )

    def __call__(self, v: Vars, x):
        fused = self.proj_in(v, x)
        pwa = fused[..., : self.dims[0]]
        abc = fused[..., self.dims[0] :]
        dw_abc = self.dwconv(v, abc) * self.scale
        splits = np.cumsum(self.dims)[:-1]
        dw_list = jnp.split(dw_abc, splits, axis=-1)
        y = pwa * dw_list[0]
        for i in range(self.order - 1):
            y = self.pws.mods[i](v, y) * dw_list[i + 1]
        return self.proj_out(v, y)


class HorBlock(Module):
    """HorNet block with LayerScale.  ref: common.py:1364-1400."""

    def __init__(self, dim, layer_scale_init=1e-6):
        super().__init__()
        self.dim = dim
        self.ls_init = layer_scale_init
        self.norm1 = self.add("norm1", LayerNorm(dim, eps=1e-6))
        self.gnconv = self.add("gnconv", GnConv(dim, dim))
        self.norm2 = self.add("norm2", LayerNorm(dim, eps=1e-6))
        self.pwconv1 = self.add("pwconv1", Dense(dim, 4 * dim))
        self.pwconv2 = self.add("pwconv2", Dense(4 * dim, dim))

    def own_params(self, key):
        return {
            self.path + ("gamma1",): self.ls_init * jnp.ones((self.dim,), jnp.float32),
            self.path + ("gamma2",): self.ls_init * jnp.ones((self.dim,), jnp.float32),
        }

    def __call__(self, v: Vars, x):
        g1 = v.params[self.path + ("gamma1",)]
        g2 = v.params[self.path + ("gamma2",)]
        x = x + g1 * self.gnconv(v, self.norm1(v, x))
        y = self.pwconv2(v, gelu(self.pwconv1(v, self.norm2(v, x))))
        return x + g2 * y


class C3HB(Module):
    """CSP HorBlock.  ref: common.py:1429-1439."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c1, c_, 1, 1))
        self.cv3 = self.add("cv3", ConvBN(2 * c_, c2, 1))
        self.m = self.add("m", Sequential([HorBlock(c_) for _ in range(n)]))

    def __call__(self, v: Vars, x):
        return self.cv3(v, jnp.concatenate([self.m(v, self.cv1(v, x)), self.cv2(v, x)], axis=-1))


# ---------------------------------------------------------------------------
# GhostNet v2 (ref: models/GhostV2.py)
# ---------------------------------------------------------------------------

def _make_divisible_ghost(x, divisor=4):
    return int(np.ceil(x * 1.0 / divisor) * divisor)


def _ghost_act(name):
    if name == "relu":
        return jax.nn.relu
    if name == "relu6":
        return lambda x: jnp.clip(x, 0, 6)
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name in ("hsigmoid", "hard_sigmoid"):
        return lambda x: jnp.clip(x + 3.0, 0, 6) * 0.16666667
    if name in ("hswish", "hard_swish"):
        return hardswish
    raise NotImplementedError(name)


class ConvUnit(Module):
    """conv+BN(+act).  ref: GhostV2.py:73-96."""

    def __init__(self, c1, c2, k=1, s=1, p=0, g=1, use_act=True, act_type="relu"):
        super().__init__()
        self.conv = self.add("conv", Conv2d(c1, c2, k, s, p=p, g=g, bias=False))
        self.bn = self.add("bn", BatchNorm2d(c2))
        self.act = _ghost_act(act_type) if use_act else None

    def __call__(self, v: Vars, x):
        y = self.bn(v, self.conv(v, x))
        return self.act(y) if self.act else y


class SE(Module):
    """Squeeze-excite.  ref: GhostV2.py:50-71."""

    def __init__(self, c, ratio=4):
        super().__init__()
        mid = _make_divisible_ghost(c // ratio)
        self.conv_reduce = self.add("conv_reduce", Conv2d(c, mid, 1, bias=True))
        self.conv_expand = self.add("conv_expand", Conv2d(mid, c, 1, bias=True))

    def __call__(self, v: Vars, x):
        s = global_avg_pool(x)
        s = jax.nn.relu(self.conv_reduce(v, s))
        s = _ghost_act("hsigmoid")(self.conv_expand(v, s))
        return x * s


class GhostModule(Module):
    """ref: GhostV2.py:98-136."""

    def __init__(self, c1, c2, k=1, s=1, ratio=2, dw_size=3, use_act=True, act_type="relu"):
        super().__init__()
        init_ch = math.ceil(c2 / ratio)
        new_ch = init_ch * (ratio - 1)
        self.primary_conv = self.add(
            "primary_conv", ConvUnit(c1, init_ch, k, s, p=k // 2, use_act=use_act, act_type=act_type)
        )
        self.cheap_operation = self.add(
            "cheap_operation",
            ConvUnit(init_ch, new_ch, dw_size, 1, p=dw_size // 2, g=init_ch, use_act=use_act, act_type=act_type),
        )

    def __call__(self, v: Vars, x):
        x1 = self.primary_conv(v, x)
        x2 = self.cheap_operation(v, x1)
        return jnp.concatenate([x1, x2], axis=-1)


def _bilinear_resize_align_corners(x, size):
    """torch F.interpolate(mode='bilinear', align_corners=True) on NHWC."""
    b, h, w, c = x.shape
    th, tw = size
    if h == 1 and w == 1:
        return jnp.broadcast_to(x, (b, th, tw, c))
    ys = jnp.linspace(0.0, h - 1.0, th)
    xs = jnp.linspace(0.0, w - 1.0, tw)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class GhostModuleMul(Module):
    """Ghost module with DFC attention gate.  ref: GhostV2.py:138-172."""

    def __init__(self, c1, c2, k=1, s=1, ratio=2, dw_size=3, use_act=True, act_type="relu"):
        super().__init__()
        init_ch = math.ceil(c2 / ratio)
        new_ch = init_ch * (ratio - 1)
        self.primary_conv = self.add(
            "primary_conv", ConvUnit(c1, init_ch, k, s, p=k // 2, use_act=use_act, act_type=act_type)
        )
        self.cheap_operation = self.add(
            "cheap_operation",
            ConvUnit(init_ch, new_ch, dw_size, 1, p=dw_size // 2, g=init_ch, use_act=use_act, act_type=act_type),
        )
        self.short_conv = self.add(
            "short_conv",
            Sequential(
                [
                    ConvUnit(c1, c2, k, s, p=k // 2, use_act=False),
                    ConvUnit(c2, c2, (1, 5), 1, p=(0, 2), g=c2, use_act=False),
                    ConvUnit(c2, c2, (5, 1), 1, p=(2, 0), g=c2, use_act=False),
                ]
            ),
        )

    def __call__(self, v: Vars, x):
        res = avg_pool(x, 2, 2)
        res = jax.nn.sigmoid(self.short_conv(v, res))
        x1 = self.primary_conv(v, x)
        x2 = self.cheap_operation(v, x1)
        out = jnp.concatenate([x1, x2], axis=-1)
        gate = _bilinear_resize_align_corners(res, (out.shape[1], out.shape[2]))
        return out * gate


class Ghostblockv2(Module):
    """ref: GhostV2.py:174-236 (uses GhostModuleMul as ghost1)."""

    def __init__(self, c1, c_mid, c2, k=3, s=1, act_type="relu", use_se=False):
        super().__init__()
        self.ghost1 = self.add("ghost1", GhostModuleMul(c1, c_mid, 1, 1, act_type=act_type))
        self.use_dw = s > 1
        if self.use_dw:
            self.dw = self.add("dw", ConvUnit(c_mid, c_mid, k, s, p=k // 2, g=c_mid, use_act=False))
        self.use_se = use_se
        if use_se:
            self.se = self.add("se", SE(c_mid))
        self.ghost2 = self.add("ghost2", GhostModule(c_mid, c2, 1, 1, act_type=act_type, use_act=False))
        self.down_sample = c1 != c2 or s != 1
        if self.down_sample:
            self.shortcut = self.add(
                "shortcut",
                Sequential(
                    [
                        ConvUnit(c1, c1, k, s, p=k // 2, g=c1, use_act=False),
                        ConvUnit(c1, c2, 1, 1, p=0, use_act=False),
                    ]
                ),
            )

    def __call__(self, v: Vars, x):
        shortcut = x
        out = self.ghost1(v, x)
        if self.use_dw:
            out = self.dw(v, out)
        if self.use_se:
            out = self.se(v, out)
        out = self.ghost2(v, out)
        if self.down_sample:
            shortcut = self.shortcut(v, shortcut)
        return shortcut + out


class C3GhostV2(C3):
    """C3 with Ghostblockv2.  ref: common.py:1441-1448."""

    def make_inner(self, c1, c2, n, shortcut, g, e):
        c_ = int(c2 * e)
        return Sequential([Ghostblockv2(c_, 16, c_) for _ in range(n)])


# ---------------------------------------------------------------------------
# DM/SM downsampling family (DMA contribution, ref: common.py:1451-1547)
# ---------------------------------------------------------------------------

class SpaceToDepth(Module):
    """SPD-Conv `space_to_depth` — a zero-cost reshape on TPU.
    ref: common.py:1451-1458."""

    def __init__(self, dimension=1):
        super().__init__()

    def __call__(self, v: Vars, x):
        return space_to_depth_2x(x)


class SM(SpaceToDepth):
    """Identical op, separate name.  ref: common.py:1460-1467."""


class MP(Module):
    """MaxPool k=s=2.  ref: common.py:1469-1475."""

    def __init__(self, k=2):
        super().__init__()
        self.k = k

    def __call__(self, v: Vars, x):
        return max_pool(x, self.k, self.k, 0)


class SMMConv(Module):
    """3x3 + 5x5 concat -> SM.  out = 4*c1.  ref: common.py:1494-1507."""

    def __init__(self, c1, c2):
        super().__init__()
        c_ = int(c1 / 2)
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 3, 1))
        self.cv2 = self.add("cv2", ConvBN(c1, c_, 5, 1))

    def __call__(self, v: Vars, x):
        y = jnp.concatenate([self.cv1(v, x), self.cv2(v, x)], axis=-1)
        return space_to_depth_2x(y)


class DMMConv2(Module):
    """SM(x) || 1x1(MP(x)) concat.  out = 4*c1 + c2.  ref: common.py:1508-1521."""

    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = self.add("cv1", ConvBN(c1, c2, 1, 1))

    def __call__(self, v: Vars, x):
        x1 = self.cv1(v, max_pool(x, 2, 2, 0))
        x2 = space_to_depth_2x(x)
        return jnp.concatenate([x2, x1], axis=-1)


class DMMConv(Module):
    """SM(3x3(x)) || 1x1(MP(x)) concat.  out = 5*c2.  ref: common.py:1523-1536."""

    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = self.add("cv1", ConvBN(c1, c2, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c1, c2, 3, 1))

    def __call__(self, v: Vars, x):
        x1 = self.cv1(v, max_pool(x, 2, 2, 0))
        x2 = space_to_depth_2x(self.cv2(v, x))
        return jnp.concatenate([x2, x1], axis=-1)


class DMConv(Module):
    """SM(3x3(x)).  out = 4*c2.  ref: common.py:1538-1547."""

    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = self.add("cv1", ConvBN(c1, c2, 3, 1))

    def __call__(self, v: Vars, x):
        return space_to_depth_2x(self.cv1(v, x))


class DMMixConv2d(Module):
    """Mixed-kernel depthwise conv.  ref: common.py:1549-1579."""

    def __init__(self, c1, c2, k=(1, 3), s=1, equal_ch=True):
        super().__init__()
        n = len(k)
        if equal_ch:
            idx = np.floor(np.linspace(0, n - 1e-6, c2))
            c_ = [int((idx == g).sum()) for g in range(n)]
        else:
            b = [c2] + [0] * n
            a = np.eye(n + 1, n, k=-1)
            a -= np.roll(a, 1, axis=1)
            a *= np.array(k) ** 2
            a[0] = 1
            c_ = np.linalg.lstsq(a, b, rcond=None)[0].round().astype(int)
        self.m = self.add(
            "m",
            Sequential(
                [Conv2d(c1, int(ci), ki, s, p=ki // 2, g=math.gcd(c1, int(ci)), bias=False) for ki, ci in zip(k, c_)]
            ),
        )
        self.bn = self.add("bn", BatchNorm2d(c2))

    def __call__(self, v: Vars, x):
        y = jnp.concatenate([m(v, x) for m in self.m.mods], axis=-1)
        return silu(self.bn(v, y))


# ---------------------------------------------------------------------------
# ConvMixer (ref: models/cspcm.py)
# ---------------------------------------------------------------------------

class ConvMix(Module):
    """9x9 depthwise residual + 1x1, GELU+BN.  ref: cspcm.py:25-41.
    torch names: Resnet.0/.2 (conv/bn), Conv_1x1.0/.2."""

    def __init__(self, dim, dim1, kernel_size=9):
        super().__init__()
        self.resnet = self.add(
            "Resnet",
            Sequential([Conv2d(dim, dim, kernel_size, 1, p=kernel_size // 2, g=dim, bias=True), Identity(), BatchNorm2d(dim)]),
        )
        self.conv1x1 = self.add(
            "Conv_1x1", Sequential([Conv2d(dim, dim, 1, bias=True), Identity(), BatchNorm2d(dim)])
        )

    def _branch(self, v, seq, x):
        return seq.mods[2](v, gelu(seq.mods[0](v, x)))

    def __call__(self, v: Vars, x):
        x = x + self._branch(v, self.resnet, x)
        return self._branch(v, self.conv1x1, x)


class CSPCM(Module):
    """CSP of ConvMix.  ref: cspcm.py:43-54."""

    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = self.add("cv1", ConvBN(c1, c_, 1, 1))
        self.cv2 = self.add("cv2", ConvBN(c1, c_, 1, 1))
        self.cv3 = self.add("cv3", ConvBN(2 * c_, c2, 1))
        self.m = self.add("m", Sequential([ConvMix(c_, c_) for _ in range(n)]))

    def __call__(self, v: Vars, x):
        return self.cv3(v, jnp.concatenate([self.m(v, self.cv1(v, x)), self.cv2(v, x)], axis=-1))


# ---------------------------------------------------------------------------
# experimental.py blocks
# ---------------------------------------------------------------------------

class CrossConv(Module):
    """1xk then kx1 cross conv.  ref: experimental.py:15-31."""

    def __init__(self, c1, c2, k=3, s=1, g=1, e=1.0, shortcut=False):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = self.add("cv1", ConvBN(c1, c_, (1, k), (1, s)))
        self.cv2 = self.add("cv2", ConvBN(c_, c2, (k, 1), (s, 1), g=g))
        self.residual = shortcut and c1 == c2

    def __call__(self, v: Vars, x):
        y = self.cv2(v, self.cv1(v, x))
        return x + y if self.residual else y


class Sum(Module):
    """(weighted) sum of n inputs.  ref: experimental.py:33-57."""

    def __init__(self, n, weight=False):
        super().__init__()
        self.n = n
        self.weighted = weight

    def own_params(self, key):
        if not self.weighted:
            return {}
        return {self.path + ("w",): -jnp.arange(1.0, self.n) / 2}

    def __call__(self, v: Vars, xs):
        y = xs[0]
        if self.weighted:
            w = jax.nn.sigmoid(v.params[self.path + ("w",)]) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class MixConv2d(DMMixConv2d):
    """ref: experimental.py:60-90 (same math as DMMixConv2d)."""


class Classify(Module):
    """Second-stage classification head.  ref: common.py:893-910."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1):
        super().__init__()
        self.conv = self.add("conv", Conv2d(c1, c2, k, s, p, g=g, bias=True))

    def __call__(self, v: Vars, x):
        xs = x if isinstance(x, list) else [x]
        pooled = [global_avg_pool(t) for t in xs]
        z = jnp.concatenate(pooled, axis=-1)
        return self.conv(v, z)[:, 0, 0, :]


class MaxPool2d(Module):
    """nn.MaxPool2d(k, s, p) rows in hub yamls (yolov3-tiny)."""

    def __init__(self, k, s=None, p=0):
        super().__init__()
        self.k, self.s, self.p = k, s if s is not None else k, p

    def __call__(self, v: Vars, x):
        return max_pool(x, self.k, self.s, self.p)


class ZeroPad2d(Module):
    """nn.ZeroPad2d(padding) rows (yolov3-tiny): (left, right, top, bottom)."""

    def __init__(self, padding):
        super().__init__()
        p = padding if isinstance(padding, (list, tuple)) else [padding] * 4
        self.p = tuple(p)

    def __call__(self, v: Vars, x):
        l, r, t, b = self.p
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class Upsample(Module):
    """nn.Upsample(None, scale, 'nearest') in the yamls."""

    def __init__(self, size=None, scale_factor=2, mode="nearest"):
        super().__init__()
        assert mode == "nearest", "only nearest upsampling is used by the configs"
        self.scale = int(scale_factor)

    def __call__(self, v: Vars, x):
        return upsample_nearest(x, self.scale)
