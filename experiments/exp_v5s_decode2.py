"""Decode-slim experiment: kill the full-width f32 sigmoid materialisation.

decode_parts sigmoids the entire (B,ny,nx,na,5+nc) tensor in f32 (a
~190 MB materialisation at bs128/640px) and reduces max over class
*probabilities*.  sigmoid is strictly monotone, so
    max_i sigmoid(obj)*sigmoid(cls_i) = sigmoid(obj)*sigmoid(max_i cls_i)
and argmax over logits == argmax over probabilities — the class reduce
can run on the raw bf16 logits and sigmoid only ever touches 5 scalars
per candidate (xy, wh, obj, best-cls).  Exact same outputs.

    python experiments/exp_v5s_decode2.py [yolov5s]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_serve_decomp import BS, calibrate, scan_time  # noqa: E402


def decode_parts_slim(head, raw, class_mask=None):
    import jax
    import jax.numpy as jnp

    bxs, scs, cls_ = [], [], []
    for i, x in enumerate(raw):
        b, ny, nx, na, no = x.shape
        # class reduce on raw logits (monotone sigmoid): no (…, nc) f32 tensor
        cls_logit = x[..., 5:]
        best_logit = jnp.max(cls_logit, axis=-1)
        bc = jnp.argmax(cls_logit, axis=-1)
        best = (jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
                * jax.nn.sigmoid(best_logit.astype(jnp.float32)))
        if class_mask is not None:
            best = jnp.where(class_mask[bc], best, 0.0)

        y4 = jax.nn.sigmoid(x[..., 0:4].astype(jnp.float32))
        gx = jnp.arange(nx, dtype=jnp.float32)
        gy = jnp.arange(ny, dtype=jnp.float32)
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
        anchor_px = jnp.asarray(head.anchors[i] * head.stride[i])
        xy = (y4[..., 0:2] * 2 - 0.5 + grid[None, :, :, None, :]) * head.stride[i]
        wh = (y4[..., 2:4] * 2) ** 2 * anchor_px[None, None, None, :, :]
        half = wh * 0.5
        box = jnp.concatenate([xy - half, xy + half], axis=-1)

        bxs.append(box.transpose(0, 3, 1, 2, 4).reshape(b, na * ny * nx, 4))
        scs.append(best.transpose(0, 3, 1, 2).reshape(b, na * ny * nx))
        cls_.append(bc.astype(jnp.float32).transpose(0, 3, 1, 2)
                    .reshape(b, na * ny * nx))
    import jax.numpy as jnp
    return (jnp.concatenate(bxs, 1), jnp.concatenate(scs, 1),
            jnp.concatenate(cls_, 1))


def main():
    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.core.nms import nms_parts
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache("~/.cache/dmayolo_exp_serve")
    calibrate()
    rng = np.random.default_rng(0)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = sys.argv[1] if len(sys.argv) > 1 else "yolov5s"
    model = DetectionModel(
        os.path.join(repo, f"dmayolo_tpu/configs/models/{name}.yaml"), nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(model, params, stats)
    head = model.head

    x = jnp.asarray(rng.integers(0, 255, (BS, 640, 640, 3), dtype=np.uint8))

    def fwd(xx, p, s):
        xf = xx.astype(jnp.bfloat16) / 255.0
        return model.apply(p, s, xf, fused=True, dtype=jnp.bfloat16)

    # correctness gate
    raw = jax.jit(lambda xx: fwd(xx, fp, fs))(x[:4])
    b0, s0, c0 = jax.jit(lambda r: head.decode_parts(r))(raw)
    b1, s1, c1 = jax.jit(lambda r: decode_parts_slim(head, r))(raw)
    for a, bb, lbl in ((b0, b1, "boxes"), (s0, s1, "scores"), (c0, c1, "cls")):
        d = float(jnp.max(jnp.abs(a - bb)))
        print(f"  slim {lbl} max|diff| = {d:.3e}")
    assert float(jnp.max(jnp.abs(b0 - b1))) == 0.0
    assert float(jnp.max(jnp.abs(c0 - c1))) == 0.0
    sd = float(jnp.max(jnp.abs(s0 - s1)))
    assert sd < 2e-7, sd  # one fewer f32 rounding in the product path

    print(f"\n{name} bs{BS} cumulative:")
    scan_time(lambda xx, p, s: head.decode_parts(fwd(xx, p, s)),
              (x, fp, fs), "fwd + decode (current)")
    scan_time(lambda xx, p, s: decode_parts_slim(head, fwd(xx, p, s)),
              (x, fp, fs), "fwd + decode (slim)")

    def full(dec_fn):
        def f(xx, p, s):
            bb, ss, cc = dec_fn(fwd(xx, p, s))
            return nms_parts(bb, ss, cc, conf_thres=0.25, iou_thres=0.45,
                             max_det=300, max_nms=512, backend="matrix")
        return f

    scan_time(full(head.decode_parts), (x, fp, fs), "full serve (current)")
    scan_time(full(lambda r: decode_parts_slim(head, r)), (x, fp, fs),
              "full serve (slim decode)")


if __name__ == "__main__":
    main()
