"""--int8 TFLite export: quantized net + float decode (ref export.py:197-205).

Two claims, tested separately because int8 accuracy is data-dependent:
  1. the numpy raw-head decode used for int8 artifacts is EXACTLY the
     model's decode (same math, same candidate order);
  2. the full-integer artifact exports, carries its decode constants in
     the sidecar, and runs through the real detect CLI.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.utils.checkpoint import save_checkpoint

from test_e2e_train import TINY_CFG

tf = pytest.importorskip("tensorflow")


def _model_and_ckpt(tmp_path):
    model = DetectionModel(TINY_CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(3))
    ckpt = tmp_path / "w.npz"
    save_checkpoint(ckpt, params=params, stats=stats,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})
    return model, params, stats, ckpt


def test_decode_raw_np_matches_model_decode(tmp_path):
    from dmayolo_tpu.cli.backends import decode_raw_np
    from dmayolo_tpu.nn.fuse import fuse_params

    model, params, stats, _ = _model_and_ckpt(tmp_path)
    fp, fs = fuse_params(model, params, stats)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 256, 256, 3)).astype(np.float32))
    raws = model.apply(fp, fs, x, dtype=jnp.float32, fused=True)
    want = np.asarray(model.decode(raws))

    strides = [int(s) for s in np.asarray(model.stride)]
    meta = {
        "strides": strides,
        "anchors_px": (np.asarray(model.head.anchors, np.float32)
                       * np.asarray(strides, np.float32).reshape(-1, 1, 1)
                       ).tolist(),
        "shapes": [[256 // s, 256 // s] for s in strides],
    }
    got = decode_raw_np([np.asarray(r) for r in raws], meta)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_int8_artifact_runs_through_detect(tmp_path):
    import cv2

    from dmayolo_tpu.cli.detect import main as detect_main
    from dmayolo_tpu.cli.export import main as export_main
    from dmayolo_tpu.data.synthetic import generate

    _, _, _, ckpt = _model_and_ckpt(tmp_path)
    data = generate(tmp_path / "shapes", n_train=2, n_val=8, img_size=256,
                    seed=4)

    artifacts = export_main([
        "--weights", str(ckpt), "--imgsz", "256", "--batch-size", "1",
        "--include", "npz", "--int8", "--data", str(data),
        "--ncalib", "8", "--device", "cpu", "--fp32",
    ])
    int8 = [a for a in artifacts if a.name.endswith("-int8.tflite")]
    assert int8, artifacts
    meta = (int8[0].parent / (int8[0].name + ".meta.yaml")).read_text()
    assert "raw_heads" in meta and "anchors_px" in meta

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        cv2.imwrite(str(src / f"{i}.jpg"),
                    rng.integers(0, 255, (200, 320, 3), dtype=np.uint8))
    out = detect_main([
        "--weights", str(int8[0]), "--source", str(src),
        # untrained + int8 quant noise: any threshold low enough to emit
        # rows proves the artifact executes and decodes sanely
        "--imgsz", "256", "--conf-thres", "0.0001", "--max-det", "100",
        "--device", "cpu", "--save-txt", "--save-conf", "--nosave",
        "--project", str(tmp_path / "runs"), "--name", "int8", "--exist-ok",
    ])
    txts = list((out / "labels").glob("*.txt"))
    assert txts, "int8 artifact produced no label files"
    rows = np.array([ln.split() for t in txts
                     for ln in t.read_text().split("\n") if ln], np.float64)
    assert rows.size and rows.shape[1] == 6
    # xywhn + conf are all normalised/bounded
    assert (rows[:, 1:] >= -0.01).all() and (rows[:, 1:] <= 1.5).all()
