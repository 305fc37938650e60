"""Model assembly from the reference's YAML config format.

Replicates parse_model semantics (ref: models/yolo.py:353-478) — the same
`[from, number, module, args]` rows, depth_multiple / width_multiple gains,
per-family channel rules and save-list — but registry-driven (no eval) and
emitting a functional NHWC graph.

Stride inference uses `jax.eval_shape` on a dummy 256px input — the
shape-only analogue of the reference's dummy forward (yolo.py:164).
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..nn.module import ApplyCtx, Module, Sequential, Vars, make_vars
from ..nn.heads import Detect, TDetect
from .registry import INSERT_N, REGISTRY, WIDTH_GAIN


def make_divisible(x, divisor=8):
    """ref: utils/general.py (make_divisible)."""
    return math.ceil(x / divisor) * divisor


def _eval_arg(a, scope: Dict[str, Any]):
    """Safe stand-in for parse_model's eval of string args (yolo.py:379-383)."""
    if not isinstance(a, str):
        return a
    if a in scope:
        return scope[a]
    if a == "None":
        return None
    if a in ("True", "False"):
        return a == "True"
    try:
        return int(a)
    except ValueError:
        pass
    try:
        return float(a)
    except ValueError:
        pass
    return a  # plain string like 'nearest'


class _LayerList(Module):
    """Container named "model" so param paths read model.{i}.... like torch."""

    def __init__(self, mods: Sequence[Module]):
        super().__init__()
        self.mods = [self.add(str(i), m) for i, m in enumerate(mods)]


class LayerSpec:
    def __init__(self, i, f, name, n, args, c2):
        self.i = i  # layer index
        self.f = f  # from: int or list
        self.name = name  # registry name
        self.n = n  # displayed repeat count
        self.args = args  # final constructor args
        self.c2 = c2  # output channels

    def __repr__(self):
        return f"[{self.i:>3}] from={self.f!s:>12} n={self.n} {self.name:<16} args={self.args}"


def check_anchor_order(anchors: np.ndarray, strides: Sequence[float]) -> np.ndarray:
    """Flip anchors if their area order disagrees with stride order.
    ref: utils/autoanchor.py:13-23."""
    areas = anchors.prod(-1).mean(-1)  # (nl,)
    da = areas[-1] - areas[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        return anchors[::-1].copy()
    return anchors


class DetectionModel(Module):
    """YAML-driven detector: backbone + head + Detect/TDetect.

    Equivalent surface to reference `Model` (models/yolo.py:117-350):
    yaml parsing, stride probe, anchor rescale/order check, bias init,
    save-list graph execution, TTA forward (in eval/tta.py), fuse
    (nn/fuse.py).
    """

    def __init__(self, cfg: Union[str, Path, dict], ch: int = 3, nc: Optional[int] = None,
                 anchors=None, img_size: int = 256):
        super().__init__()
        if isinstance(cfg, (str, Path)):
            with open(cfg, errors="ignore") as f:
                self.yaml = yaml.safe_load(f)
            self.yaml_file = str(cfg)
        else:
            self.yaml = dict(cfg)
            self.yaml_file = "<dict>"

        self.ch = self.yaml.get("ch", ch)
        if nc and nc != self.yaml.get("nc"):
            self.yaml["nc"] = nc
        if anchors:
            # numeric override (e.g. hyp 'anchors: 3.2') selects round(n)
            # anchors/level for autoanchor re-clustering, ref yolo.py:142-144
            self.yaml["anchors"] = (
                round(anchors) if isinstance(anchors, (int, float)) else anchors
            )
        self.nc = self.yaml["nc"]

        mods, self.specs, self.save = self._parse(self.yaml, self.ch)
        self.net = self.add("model", _LayerList(mods))
        self.layers = self.net.mods
        self.head = self.layers[-1]
        self.names = [str(i) for i in range(self.nc)]

        # ---- stride probe (shape-only dummy forward, ref yolo.py:160-180)
        if isinstance(self.head, (Detect, TDetect)):
            s = img_size
            shapes = self._probe_shapes(s)
            self.stride = np.asarray([s / sh[1] for sh in shapes], np.float32)
            self.head.stride = self.stride
            if isinstance(self.head, Detect):
                anc = self.head.anchors / self.stride.reshape(-1, 1, 1)
                self.head.anchors = check_anchor_order(anc, self.stride)
        else:
            self.stride = np.asarray([32.0], np.float32)

    # -- config interpretation (mirrors yolo.py:353-478) --------------------
    @staticmethod
    def _parse(d: dict, ch_in: int):
        anchors, nc = d["anchors"], d["nc"]
        gd, gw = d["depth_multiple"], d["width_multiple"]
        na = (len(anchors[0]) // 2) if isinstance(anchors, list) else anchors
        no = na * (nc + 5)
        scope = {"nc": nc, "anchors": anchors, "None": None}

        layers: List[Module] = []
        specs: List[LayerSpec] = []
        save: List[int] = []
        ch = [ch_in]
        c2 = ch[-1]

        for i, (f, n, name, args) in enumerate(d["backbone"] + d["head"]):
            args = [_eval_arg(a, scope) for a in args]
            n_disp = n = max(round(n * gd), 1) if n > 1 else n

            if name in WIDTH_GAIN:
                c1, c2 = ch[f], args[0]
                if c2 != no:
                    c2 = make_divisible(c2 * gw, 8)
                args = [c1, c2, *args[1:]]
                if name in INSERT_N:
                    args.insert(2, n)
                    n = 1
            elif name == "nn.BatchNorm2d":
                args = [ch[f]]
                c2 = ch[f]
            elif name in ("Concat", "AdConcat2", "AdConcat3"):
                c2 = sum(ch[x] for x in f)
            elif name in ("ConvMix", "CSPCM"):
                c1, c2 = ch[f], args[0]
                if c2 != no:
                    c2 = make_divisible(c2 * gw, 8)
                args = [c1, c2, *args[1:]]
            elif name in ("AdaptConcat", "AdaptADD"):
                c2 = sum(ch[x] for x in f)
                args = [len(f), *args]
            elif name in ("Adapt_Add2", "Adapt_Add3"):
                c2 = max(ch[x] for x in f)
            elif name == "C3GhostV2":
                c1, c2 = ch[f], args[0]
                if c2 != no:
                    c2 = make_divisible(c2 * gw, 8)
                args = [c1, c2, *args[1:]]
                args.insert(2, n)
                n = 1
            elif name == "Detect":
                args.append([ch[x] for x in f])
                if isinstance(args[1], int):  # 'anchors: N' auto-anchor mode
                    args[1] = [list(range(args[1] * 2))] * len(f)
            elif name == "TDetect":
                args.append([ch[x] for x in f])
            elif name == "Contract":
                c2 = ch[f] * args[0] ** 2
            elif name == "Expand":
                c2 = ch[f] // args[0] ** 2
            elif name == "space_to_depth":
                c2 = 4 * ch[f]
            elif name == "SMMConv":
                c1, c2 = ch[f], 4 * args[0]
                args = [c1, args[0]]
            elif name == "DMMConv":
                c1, c2 = ch[f], 5 * args[0]
                args = [c1, args[0]]
            elif name == "DMMConv2":
                c1 = ch[f]
                c2 = args[0] + 4 * c1
                args = [c1, args[0]]
            elif name == "DMConv":
                c1, c2 = ch[f], 4 * args[0]
                args = [c1, args[0]]
            elif name == "Classify":
                # classifier head rows [f, 1, Classify, [nc]] (common.py:893)
                c1, c2 = ch[f], args[0]
                args = [c1, c2, *args[1:]]
            else:
                c2 = ch[f] if isinstance(f, int) else ch[f[0]]

            cls = REGISTRY.get(name)
            if cls is None:
                raise KeyError(f"unknown module '{name}' in config (layer {i})")
            mod = Sequential([cls(*args) for _ in range(n)]) if n > 1 else cls(*args)
            mod.f, mod.i, mod.type_name = f, i, name
            layers.append(mod)
            specs.append(LayerSpec(i, f, name, n_disp, args, c2))
            save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
            if i == 0:
                ch = []
            ch.append(c2)
        return layers, specs, sorted(set(save))

    # -- execution ----------------------------------------------------------
    def __call__(self, v: Vars, x, remat: bool = False):
        """Save-list graph execution (ref: yolo.py:211-239). Returns the raw
        head output (list of per-scale maps).

        remat=True wraps every graph layer in `jax.checkpoint`: activations
        inside a layer are recomputed during backward instead of kept live,
        trading ~1 extra forward of FLOPs for O(depth) less HBM — the TPU
        way to fit large-batch / high-resolution (1536px VisDrone) training.
        """
        y: Dict[int, jax.Array] = {}
        for mod in self.layers:
            f = mod.f
            if f != -1:
                x = y[f % mod.i] if isinstance(f, int) else [x if j == -1 else y[j % mod.i] for j in f]
            x = self._run_layer(mod, v, x) if remat else mod(v, x)
            if mod.i in self.save:
                y[mod.i] = x
        return x

    @staticmethod
    def _run_layer(mod, v: Vars, x):
        """One layer as a pure checkpointed function.

        The layer gets its own ApplyCtx (fresh stats_out, a per-layer rng
        stream folded by layer index) so the function is pure in
        (params, stats, rng, x) and safe to re-trace for the rematerialised
        backward pass; BN stat updates are merged back into the outer ctx.
        """
        ctx = v.ctx
        rng = None
        if ctx.rng is not None:
            rng = jax.random.fold_in(ctx.rng, 100000 + mod.i)

        def f(params, stats, r, xin):
            inner = ApplyCtx(train=ctx.train, dtype=ctx.dtype, rng=r,
                             stats_out={} if ctx.train else None,
                             fused=ctx.fused)
            out = mod(Vars(params, stats, inner), xin)
            return out, (inner.stats_out if ctx.train else {})

        out, stats_out = jax.checkpoint(f)(v.params, v.stats, rng, x)
        if ctx.train and stats_out:
            ctx.stats_out.update(stats_out)
        return out

    def _probe_shapes(self, s: int):
        """Shapes of raw head outputs for an s x s input, via eval_shape."""
        key = jax.random.PRNGKey(0)
        pshape = jax.eval_shape(lambda k: self.init(k), key)

        def fwd(params, stats, x):
            return self(make_vars(params, stats), x)

        out = jax.eval_shape(
            fwd, pshape[0], pshape[1],
            jax.ShapeDtypeStruct((1, s, s, self.ch), jnp.float32),
        )
        return [o.shape for o in out]

    # -- conveniences --------------------------------------------------------
    def init_with_priors(self, key, cf=None):
        """init() + detection-head bias priors (ref: yolo.py:170/180)."""
        params, stats = self.init(key)
        if isinstance(self.head, Detect):
            params = self.head.bias_init(params, cf)
        elif isinstance(self.head, TDetect):
            params = self.head.bias_init(params)
        return params, stats

    def apply(self, params, stats, x, train: bool = False, rng=None,
              dtype=jnp.float32, fused: bool = False, remat: bool = False,
              quant=None, quant_observe=None):
        """Forward. train=True returns (raw, new_stats); else raw list.

        quant: {conv_path: input_scale} from nn/quant.calibrate_act_scales
        — eligible convs run the int8 MXU path (serving only).
        quant_observe: calibration dict (see nn/quant.py)."""
        v = make_vars(params, stats, train=train, rng=rng, dtype=dtype,
                      fused=fused, quant=quant, quant_observe=quant_observe)
        out = self(v, x, remat=remat)
        if train:
            new_stats = dict(stats)
            new_stats.update(v.ctx.stats_out)
            return out, new_stats
        return out

    def decode(self, raw):
        return self.head.decode(raw)

    def decode_parts(self, raw, class_mask=None, ref_order: bool = True):
        """Serving fast-path decode (see heads.decode_parts); feed to
        core.nms.nms_parts."""
        from ..nn.heads import TDetect

        if isinstance(self.head, TDetect):  # already in native (y, x) order
            return self.head.decode_parts(raw, class_mask)
        return self.head.decode_parts(raw, class_mask, ref_order=ref_order)

    def decode_topk(self, raw, k: int = 512, conf_thres: float = 0.25,
                    class_mask=None):
        """Lazy serving decode: conf-gate + top-k on a fused score pass,
        then decode boxes for the K survivors only (heads.decode_scores /
        decode_at) — the (B, N, 4) all-anchor box tensor never exists.
        Numerically identical to decode_parts + nms_parts' candidate
        selection (tested); feed the result to core.nms.nms_from_topk.

        Returns (top_boxes (B, K, 4), top_scores (B, K), top_cls (B, K)).
        """
        from ..core.nms import NEG_INF, _top_k_candidates

        scores = self.head.decode_scores(raw, class_mask)
        cand = jnp.where(scores > conf_thres, scores, NEG_INF)
        top_scores, top_idx = _top_k_candidates(
            cand, min(k, cand.shape[1]))
        boxes, cls = self.head.decode_at(raw, top_idx)
        return boxes, top_scores, cls

    def serve_detections(self, raw, conf_thres: float = 0.25,
                         iou_thres: float = 0.45, max_det: int = 300,
                         max_nms: int = 512, backend: str = "matrix",
                         agnostic: bool = False, class_mask=None,
                         ref_order: bool = True):
        """Head-aware serving tail: raw head outputs -> (dets, valid).

        Picks the measured-faster single-label decode per head family
        (experiments/exp_lazy_decode.py, chip-timed): TDetect goes through
        the lazy decode_topk path (+3.5% end-to-end — the all-anchor DFL
        softmax-expectation is skipped for everything outside the top-k);
        Detect keeps the eager decode_parts path (the lazy gathers cost
        more than the all-anchor box math they avoid).  Both tails are
        numerically identical to decode + single-label batched_nms.

        ref_order=False flattens candidates in native (y, x, a) order —
        same detections/scores, only equal-score NMS tie-breaks differ.
        Chip-measured NEUTRAL (v5n 8,369 ref vs 8,308 native; v5s 4,706
        vs 4,677 img/s, round-5): XLA already fuses the reference-order
        transposes into the decode, so the default stays ref_order=True
        for bit-exact tie-break parity with the eval path.
        """
        from ..core.nms import nms_from_topk, nms_parts
        from ..nn.heads import TDetect

        # candidate count per head family: TDetect is one candidate per
        # cell (raw (B,ny,nx,no)); anchor-based Detect is na per cell
        # (raw (B,ny,nx,na,no)).
        if isinstance(self.head, TDetect):
            n_anchors = sum(x.shape[1] * x.shape[2] for x in raw)
        else:
            n_anchors = sum(x.shape[1] * x.shape[2] * x.shape[3] for x in raw)
        # The lazy path was only measured a win at serving-sized k
        # (K=512, exp_lazy_decode.py); a k ~ n_anchors lazy pass is a
        # full-width approx_max_k plus k-row gathers and would lose to
        # eager, so gate on k being small relative to the candidate set.
        if isinstance(self.head, TDetect) and max_nms * 4 <= n_anchors:
            tb, ts, tc = self.decode_topk(raw, k=max_nms,
                                          conf_thres=conf_thres,
                                          class_mask=class_mask)
            return nms_from_topk(tb, ts, tc, iou_thres=iou_thres,
                                 agnostic=agnostic, max_det=max_det,
                                 backend=backend)
        boxes, scores, cls = self.decode_parts(raw, class_mask=class_mask,
                                               ref_order=ref_order)
        return nms_parts(boxes, scores, cls, conf_thres=conf_thres,
                         iou_thres=iou_thres, agnostic=agnostic,
                         max_det=max_det,
                         max_nms=min(max_nms, boxes.shape[1]),
                         backend=backend)

    def apply_with_features(self, params, stats, x, dtype=jnp.float32,
                            fused: bool = False):
        """Forward that also returns every layer's output (host-side feature
        inspection — the reference's --visualize hook, yolo.py:237-238)."""
        v = make_vars(params, stats, dtype=dtype, fused=fused)
        feats = []
        y = {}
        out = x
        for mod in self.layers:
            f = mod.f
            if f != -1:
                out = (
                    y[f % mod.i]
                    if isinstance(f, int)
                    else [out if j == -1 else y[j % mod.i] for j in f]
                )
            out = mod(v, out)
            if mod.i in self.save:
                y[mod.i] = out
            feats.append((mod.i, mod.type_name, out))
        return feats

    def describe(self) -> str:
        lines = [f"{self.yaml_file}: {len(self.layers)} layers, nc={self.nc}, stride={self.stride.tolist()}"]
        lines += [repr(s) for s in self.specs]
        return "\n".join(lines)


def load_model(cfg, ch: int = 3, nc: Optional[int] = None, anchors=None) -> DetectionModel:
    return DetectionModel(cfg, ch=ch, nc=nc, anchors=anchors)
