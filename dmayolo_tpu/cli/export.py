"""Export CLI — serialise the model for deployment.

Reference surface: export.py (TorchScript/ONNX/CoreML/TF).  TPU-native
formats here:
  * stablehlo — jax.export portable artifact of the fused bf16 inference
    fn (the XLA-world equivalent of TorchScript/ONNX)
  * torch     — state_dict .pt with reference-compatible keys/layouts
    (inverse of utils/torch_import.py) so reference-tooling users can load
    our trained weights
  * npz       — stripped inference checkpoint (EMA, fused)
  * saved_model / tflite — jax2tf conversion of the same fused program
    (reference export.py's TF path re-implements the zoo in Keras via
    models/tf.py; ours converts the jax program itself, gated on
    tensorflow being importable)
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("dmayolo-export")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--imgsz", "--img", type=int, default=640, dest="imgsz")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--include", nargs="+", default=["stablehlo"],
                   choices=["stablehlo", "torch", "npz", "tf", "saved_model",
                            "tflite"])
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--device", type=str, default=None, help="cpu|tpu (default: auto)")
    p.add_argument("--int8", action="store_true",
                   help="also write a full-integer-quantized -int8.tflite "
                        "(ref export.py:197-205); needs --data for real "
                        "calibration images")
    p.add_argument("--data", type=str, default=None,
                   help="dataset yaml providing int8 calibration images")
    p.add_argument("--ncalib", type=int, default=100,
                   help="calibration images for --int8 (ref ncalib)")
    return p


def export_torch_state_dict(model, params, stats, path: Path):
    """Write a torch-loadable state_dict mirroring the reference naming."""
    import torch

    from ..utils.torch_import import _torch_key_and_transform

    sd = {}
    for tree in (params, stats):
        for k, v in tree.items():
            tkey, tf = _torch_key_and_transform(k, v)
            arr = np.asarray(v)
            if tf == "conv":
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            elif tf == "linear_t":
                arr = arr.T
            sd[tkey] = torch.tensor(arr)
    torch.save(sd, path)
    return path


def _calibration_batches(opt):
    """Representative uint8 batches for int8 calibration: letterboxed val
    images from --data (ref export.py:197-201 calibrates from a val
    dataloader); random noise (with a warning) only as a last resort."""
    batches = []
    if opt.data:
        import cv2

        from ..data.augment import letterbox
        from ..data.datasets import _scan_images, check_dataset

        files = _scan_images(check_dataset(opt.data)["val"])[: opt.ncalib]
        imgs = []
        for f in files:
            im = cv2.imread(str(f))
            if im is None:
                continue
            im = letterbox(im, opt.imgsz, auto=False)[0][..., ::-1]  # BGR->RGB
            imgs.append(im.astype(np.uint8))
            if len(imgs) == opt.batch_size:
                batches.append(np.stack(imgs))
                imgs = []
        if imgs:  # flush the trailing partial batch, padded by repetition
            while len(imgs) < opt.batch_size:
                imgs.append(imgs[-1])
            batches.append(np.stack(imgs))
        if not batches:
            raise SystemExit(
                f"--int8 calibration: no readable images found under the "
                f"val split of {opt.data} — refusing to calibrate on noise")
    if not batches:
        print("WARNING: --int8 without --data calibrates on random noise — "
              "activation ranges will be wrong; pass --data for real images")
        rng = np.random.default_rng(0)
        batches = [rng.integers(0, 255, (opt.batch_size, opt.imgsz,
                                         opt.imgsz, 3), np.uint8)
                   for _ in range(8)]

    def rep():
        for b in batches:
            yield [b]

    return rep


def _export_tflite_int8(model, fp, fs, opt, base, tf, jax2tf, write_meta):
    """Full-integer TFLite (ref export.py:197-205 --int8), redesigned:
    only the conv network is quantized.  The reference quantizes its whole
    Keras graph including the decode, where grid-add / (2sig)^2 terms and
    the heterogeneous-range output concat share per-tensor scales (the
    objectness column inherits a ~2.0 quant step from the 0-640px box
    range).  Here the int8 graph ends at the RAW per-scale head tensors
    (homogeneous logit ranges), and decode runs in float at load time
    (backends.decode_raw_np) from constants in the metadata sidecar."""
    import jax.numpy as jnp
    import yaml

    head = type(model.head).__name__
    if head != "Detect":
        print(f"--int8 supports anchor-based Detect heads (got {head}) — "
              "skipping the int8 artifact")
        return None

    def fn_raw(x):
        return tuple(model.apply(fp, fs, x.astype(jnp.float32) / 255.0,
                                 dtype=jnp.float32, fused=True))

    # legacy graph lowering: real TF ops legalize to quantizable TFLite
    # builtins (native serialization is one opaque XlaCallModule the
    # quantizer cannot enter)
    conv_fn = jax2tf.convert(fn_raw, with_gradient=False,
                             native_serialization=False)
    mod = tf.Module()
    mod.f = tf.function(conv_fn, autograph=False,
                        input_signature=[tf.TensorSpec(
                            (opt.batch_size, opt.imgsz, opt.imgsz, 3),
                            tf.uint8)])
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [mod.f.get_concrete_function()], mod)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = _calibration_batches(opt)
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.uint8  # outputs dequantize to f32
    out = base.parent / (base.name + "-int8.tflite")
    out.write_bytes(conv.convert())
    write_meta(out)

    strides = [int(s) for s in np.asarray(model.stride)]
    anchors_px = (np.asarray(model.head.anchors, np.float32)
                  * np.asarray(strides, np.float32).reshape(-1, 1, 1))
    meta_path = out.parent / (out.name + ".meta.yaml")
    m = yaml.safe_load(meta_path.read_text())
    m.update(
        raw_heads=True,
        strides=strides,
        anchors_px=anchors_px.tolist(),
        shapes=[[opt.imgsz // s, opt.imgsz // s] for s in strides],
    )
    meta_path.write_text(yaml.safe_dump(m, sort_keys=False))
    return out


def main(argv=None):
    opt = build_parser().parse_args(argv)
    from .common import check_img_size, setup_device

    setup_device(opt.device)
    import jax
    import jax.numpy as jnp

    from ..nn.fuse import fuse_params
    from ..utils.checkpoint import save_checkpoint
    from .common import load_model_from_checkpoint

    model, params, stats = load_model_from_checkpoint(opt.weights, opt.cfg)
    opt.imgsz = check_img_size(opt.imgsz, int(model.stride.max()))
    from ..utils.checkpoint import load_checkpoint as _lc

    src_meta = {}
    if not str(opt.weights).endswith(".pt"):
        _, src_meta = _lc(opt.weights)
    cfg_meta = opt.cfg or src_meta.get("cfg") or model.yaml
    if cfg_meta is model.yaml and hasattr(model.head, "anchors"):
        # keep the live (possibly autoanchor-evolved) anchors, in px units
        cfg_meta = dict(cfg_meta)
        anc_px = np.asarray(model.head.anchors) * model.stride.reshape(-1, 1, 1)
        cfg_meta["anchors"] = anc_px.reshape(len(model.stride), -1).tolist()
    base = Path(opt.weights).with_suffix("")
    dtype = jnp.float32 if opt.fp32 else jnp.bfloat16

    outputs = []
    if "npz" in opt.include:
        fp, fs = fuse_params(model, params, stats)
        out = base.parent / (base.name + "_fused.npz")
        save_checkpoint(out, params=fp, stats=fs,
                        meta={"fused": True, "nc": model.nc, "cfg": cfg_meta})
        outputs.append(out)

    if "torch" in opt.include:
        out = base.parent / (base.name + ".pt")
        if out.resolve() == Path(opt.weights).resolve():
            # --weights best.pt --include torch would overwrite the user's
            # source checkpoint with a bare state_dict (losing ema/yaml/nc)
            out = base.parent / (base.name + "_export.pt")
        export_torch_state_dict(model, params, stats, out)
        outputs.append(out)

    def _write_meta(artifact: Path, inside_dir=False):
        """Sidecar metadata so detect.py can run the artifact standalone
        (the reference's DetectMultiBackend reads equivalent metadata from
        its exported files, ref detect.py:96-141 / export.py)."""
        import yaml as _yaml

        meta = {
            "nc": int(model.nc),
            "imgsz": int(opt.imgsz),
            "batch_size": int(opt.batch_size),
            "stride": int(model.stride.max()),
            "head": type(model.head).__name__,
            "names": list(getattr(model, "names", [])),
        }
        path = (artifact / "dmayolo_meta.yaml" if inside_dir
                else artifact.parent / (artifact.name + ".meta.yaml"))
        path.write_text(_yaml.safe_dump(meta, sort_keys=False))

    if "stablehlo" in opt.include:
        from jax import export as jexport

        fp, fs = fuse_params(model, params, stats)

        def fn(x):
            dec = model.decode(model.apply(fp, fs, x.astype(dtype) / 255.0,
                                           dtype=dtype, fused=True))
            return dec

        x_spec = jax.ShapeDtypeStruct((opt.batch_size, opt.imgsz, opt.imgsz, 3), jnp.uint8)
        exported = jexport.export(jax.jit(fn))(x_spec)
        out = base.parent / (base.name + ".stablehlo")
        out.write_bytes(exported.serialize())
        _write_meta(out)
        # record the lowering platform(s) — a .stablehlo program only runs
        # on the backend it was lowered for (backends.py checks at load)
        meta_path = out.parent / (out.name + ".meta.yaml")
        import yaml as _yaml2
        m = _yaml2.safe_load(meta_path.read_text())
        m["platforms"] = list(exported.platforms)
        meta_path.write_text(_yaml2.safe_dump(m, sort_keys=False))
        outputs.append(out)

    want_sm = {"tf", "saved_model"} & set(opt.include)
    want_tfl = "tflite" in opt.include
    if want_sm or want_tfl or opt.int8:
        try:
            import tensorflow as tf
        except ImportError:
            print("tensorflow not installed — skipping tf/saved_model/tflite")
        else:
            # reference export.py TF surface (export.py:123+ / models/tf.py):
            # theirs re-implements the module zoo in Keras; ours converts the
            # SAME jax program via jax2tf, so numerics are the jax numerics.
            from jax.experimental import jax2tf

            fp, fs = fuse_params(model, params, stats)

            def make_mod(dt):
                def fn(x):
                    return model.decode(model.apply(fp, fs, x.astype(dt) / 255.0,
                                                    dtype=dt, fused=True))

                mod = tf.Module()
                mod.f = tf.function(
                    jax2tf.convert(fn, with_gradient=False), autograph=False,
                    input_signature=[tf.TensorSpec(
                        (opt.batch_size, opt.imgsz, opt.imgsz, 3), tf.uint8)])
                return mod

            mod = make_mod(dtype)
            if want_sm:
                out = base.parent / (base.name + "_saved_model")
                tf.saved_model.save(mod, str(out))
                _write_meta(out, inside_dir=True)
                outputs.append(out)
            if want_tfl:
                # TFLite builtins cannot legalize bf16 arithmetic — the
                # tflite artifact is always the f32 program
                tfl_mod = mod if opt.fp32 else make_mod(jnp.float32)
                conv = tf.lite.TFLiteConverter.from_concrete_functions(
                    [tfl_mod.f.get_concrete_function()], tfl_mod)
                # the jax program lands as one XlaCallModule op -> flex
                conv.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS,
                    tf.lite.OpsSet.SELECT_TF_OPS,
                ]
                out = base.parent / (base.name + ".tflite")
                out.write_bytes(conv.convert())
                _write_meta(out)
                outputs.append(out)
            if opt.int8:
                out = _export_tflite_int8(model, fp, fs, opt, base, tf,
                                          jax2tf, _write_meta)
                if out is not None:
                    outputs.append(out)

    for o in outputs:
        print(f"exported: {o}")
    return outputs


if __name__ == "__main__":
    main()
