"""int8 PTQ TPU serving (nn/quant.py): mAP holds on trained weights.

The reference's only int8 artifact is the TFLite export for edge CPUs
(ref export.py:197-205); here the same PTQ scheme runs the convs on the
MXU's native int8 path (chip-measured 1.8-3.1x bf16 per conv,
experiments/exp_int8_conv.py).  This trains a tiny model for real and
holds the quantized val mAP to the float mAP.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.data.synthetic import generate
from dmayolo_tpu.train.trainer import Trainer

from test_e2e_train import HYP, TINY_CFG


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("int8")
    data = generate(tmp / "shapes", n_train=48, n_val=24, img_size=256, seed=2)
    trainer = Trainer(
        TINY_CFG, str(data), HYP, epochs=32, batch_size=8, img_size=256,
        out_dir=str(tmp / "exp"), dtype=jnp.float32, workers=2,
        max_targets=32, val_interval=100, warmup_min_iters=60, seed=0,
        accumulate=1,
    )
    trainer.train(log_every=100)
    return trainer, data, tmp


def test_int8_val_matches_float(trained):
    from dmayolo_tpu.eval.validator import run_validation
    from dmayolo_tpu.nn.fuse import fuse_params
    from dmayolo_tpu.nn.quant import calibrate_act_scales

    trainer, data, tmp = trained
    model = trainer.model
    params = jax.device_get(trainer.state.ema_params)
    stats = jax.device_get(trainer.state.ema_stats)
    fp, fs = fuse_params(model, params, stats)

    import cv2

    from dmayolo_tpu.data.augment import letterbox
    from dmayolo_tpu.data.datasets import _scan_images, check_dataset

    d = check_dataset(str(data))
    files = _scan_images(d["train"])[:16]
    imgs = [letterbox(cv2.imread(str(f)), 256, auto=False)[0][..., ::-1]
            .astype(np.uint8) for f in files]
    scales = calibrate_act_scales(model, fp, fs, [np.stack(imgs)],
                                  dtype=jnp.float32)
    assert len(scales) >= 5, "calibration found too few eligible convs"

    kw = dict(img_size=256, batch_size=8, nc=3, dtype=jnp.float32,
              fused=True, max_targets=64)
    r_f32 = run_validation(model, fp, fs, d["val"], **kw)
    r_int8 = run_validation(model, fp, fs, d["val"], quant=scales, **kw)
    assert r_f32.map50 > 0.15, f"fixture undertrained: {r_f32.summary()}"
    delta = r_f32.map50 - r_int8.map50
    assert abs(delta) < 0.05, (
        f"int8 mAP@.5 moved {delta:+.4f} (f32 {r_f32.map50:.4f} -> "
        f"int8 {r_int8.map50:.4f})")


def test_int8_val_cli_flag(trained):
    from dmayolo_tpu.cli.val import main as val_main
    from dmayolo_tpu.utils.checkpoint import save_checkpoint

    import yaml

    trainer, data, tmp = trained
    cfg_path = tmp / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_CFG, f)
    ckpt = tmp / "trained.npz"
    save_checkpoint(str(ckpt),
                    params=jax.device_get(trainer.state.params),
                    stats=jax.device_get(trainer.state.stats),
                    ema_params=jax.device_get(trainer.state.ema_params),
                    ema_stats=jax.device_get(trainer.state.ema_stats),
                    meta={})
    val_main(["--weights", str(ckpt), "--cfg", str(cfg_path),
              "--data", str(data), "--img", "256", "--batch-size", "8",
              "--fp32", "--int8", "--ncalib", "8", "--device", "cpu",
              "--project", str(tmp / "val"), "--name", "exp", "--exist-ok"])
