"""Interop round-trips: our weights -> torch .pt -> reference model (and
StableHLO artifact execute)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.graph import DetectionModel

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)


def test_torch_export_loads_into_reference(tmp_path):
    from models.yolo import Model as RefModel

    from dmayolo_tpu.cli.export import export_torch_state_dict

    ours = DetectionModel("/root/reference/models/yolov5n.yaml")
    params, stats = ours.init_with_priors(jax.random.PRNGKey(7))
    pt = tmp_path / "ours.pt"
    export_torch_state_dict(ours, params, stats, pt)

    torch.manual_seed(0)
    ref = RefModel("/root/reference/models/yolov5n.yaml")
    sd = torch.load(pt, weights_only=True)
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "anchor" not in m], missing
    assert not unexpected, unexpected

    ref.eval()
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        t_dec, _ = ref(torch.tensor(x))
    j_dec = np.asarray(
        ours.decode(ours.apply(params, stats, jnp.asarray(x.transpose(0, 2, 3, 1))))
    )
    np.testing.assert_allclose(j_dec, t_dec.numpy(), atol=1e-4)


def test_stablehlo_roundtrip(tmp_path):
    from jax import export as jexport

    from dmayolo_tpu.nn.fuse import fuse_params
    from tests.test_train_step import TINY_CFG

    model = DetectionModel(TINY_CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(model, params, stats)

    def fn(x):
        return model.decode(
            model.apply(fp, fs, x.astype(jnp.float32) / 255.0, fused=True)
        )

    spec = jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    assert len(blob) > 1000
    restored = jexport.deserialize(blob)
    out = restored.call(np.zeros((1, 128, 128, 3), np.uint8))
    ref_out = fn(jnp.zeros((1, 128, 128, 3), jnp.uint8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_stablehlo_roundtrip_tdetect(tmp_path):
    # the anchor-free head family must export/restore identically too
    from jax import export as jexport

    from dmayolo_tpu.nn.fuse import fuse_params
    from tests.test_train_step import TINY_CFG

    cfg = {**TINY_CFG, "head": [[[4, 6, 7], 1, "TDetect", ["nc"]]]}
    model = DetectionModel(cfg)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(model, params, stats)

    def fn(x):
        return model.decode(
            model.apply(fp, fs, x.astype(jnp.float32) / 255.0, fused=True)
        )

    spec = jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fn))(spec)
    restored = jexport.deserialize(exported.serialize())
    out = restored.call(np.zeros((1, 128, 128, 3), np.uint8))
    ref_out = fn(jnp.zeros((1, 128, 128, 3), jnp.uint8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_saved_model_and_tflite_roundtrip(tmp_path):
    """The export CLI's TF surface (jax2tf): SavedModel must reproduce the
    jax program exactly; TFLite (flex-delegated XlaCallModule) within loose
    float tolerance."""
    tf = pytest.importorskip("tensorflow")

    from dmayolo_tpu.cli.export import main as export_main
    from dmayolo_tpu.nn.fuse import fuse_params
    from dmayolo_tpu.utils.checkpoint import save_checkpoint
    from tests.test_train_step import TINY_CFG

    model = DetectionModel(TINY_CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    ckpt = tmp_path / "w.npz"
    save_checkpoint(ckpt, params=params, stats=stats,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})
    outs = export_main(["--weights", str(ckpt), "--imgsz", "128",
                        "--include", "saved_model", "tflite",
                        "--fp32", "--device", "cpu"])
    sm = [o for o in outs if str(o).endswith("_saved_model")][0]
    tfl = [o for o in outs if str(o).endswith(".tflite")][0]

    fp, fs = fuse_params(model, params, stats)

    def fn(x):
        return model.decode(
            model.apply(fp, fs, x.astype(jnp.float32) / 255.0, fused=True))

    x = np.random.default_rng(0).integers(0, 255, (1, 128, 128, 3),
                                          dtype=np.uint8)
    ref = np.asarray(fn(jnp.asarray(x)))

    loaded = tf.saved_model.load(str(sm))
    out = np.asarray(loaded.f(tf.constant(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    interp = tf.lite.Interpreter(model_path=str(tfl))
    interp.allocate_tensors()
    interp.set_tensor(interp.get_input_details()[0]["index"], x)
    interp.invoke()
    out2 = interp.get_tensor(interp.get_output_details()[0]["index"])
    np.testing.assert_allclose(out2, ref, atol=5e-3, rtol=1e-2)
