"""End-to-end smoke: synthetic dataset -> short training -> mAP improves.

The offline analogue of the reference's coco128 1-epoch CI check
(SURVEY.md §4: tutorial.ipynb "CI Checks").
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dmayolo_tpu.data.synthetic import generate
from dmayolo_tpu.train.trainer import Trainer
from dmayolo_tpu.utils.checkpoint import load_checkpoint

TINY_CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.25,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 2, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 2, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "SPPF", [512, 5]],
    ],
    "head": [[[4, 6, 7], 1, "Detect", ["nc", "anchors"]]],
}

HYP = {
    "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 0.5, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
    "hsv_h": 0.015, "hsv_s": 0.5, "hsv_v": 0.3,
    "degrees": 0.0, "translate": 0.1, "scale": 0.3, "shear": 0.0,
    "perspective": 0.0, "flipud": 0.0, "fliplr": 0.5,
    "mosaic": 0.5, "mixup": 0.0,
}


@pytest.fixture(scope="module")
def shapes_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapes")
    return generate(root, n_train=48, n_val=12, img_size=256, seed=0)


def test_train_smoke(shapes_data, tmp_path):
    trainer = Trainer(
        TINY_CFG,
        str(shapes_data),
        HYP,
        epochs=20,
        batch_size=8,
        img_size=256,
        out_dir=str(tmp_path / "exp"),
        dtype=jnp.float32,
        workers=2,
        max_targets=32,
        val_interval=5,
        warmup_min_iters=60,
        seed=0,
        accumulate=1,  # per-batch steps: the smoke run needs every update
    )
    best = trainer.train(log_every=100)
    # sanity: checkpoints written, csv written
    assert (tmp_path / "exp" / "last.npz").exists()
    assert (tmp_path / "exp" / "results.csv").exists()
    res = trainer.validate(use_ema=True)
    print("final:", res.summary())
    # tiny model + 4 epochs on easy synthetic shapes: recall should be
    # clearly above chance; mAP improving is the real signal
    assert np.isfinite(res.map50)
    assert res.map50 > 0.10, res.summary()

    # resume path loads
    trees, meta = load_checkpoint(tmp_path / "exp" / "last")
    assert "params" in trees and meta["epoch"] == 19


TINY_TAL_CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.25,
    "anchors": [[10, 13, 16, 30, 33, 23]] * 3,
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],   # P3/8
        [-1, 1, "Conv", [512, 3, 2]],   # P4/16
        [-1, 1, "Conv", [512, 3, 2]],   # P5/32
    ],
    "head": [[[3, 4, 5], 1, "TDetect", ["nc"]]],
}


def test_tal_train_smoke(shapes_data, tmp_path):
    """Anchor-free (TAL/TDetect) training path end-to-end."""
    trainer = Trainer(
        TINY_TAL_CFG,
        str(shapes_data),
        HYP,
        epochs=3,
        batch_size=8,
        img_size=256,
        assignment="tal",
        out_dir=str(tmp_path / "tal"),
        dtype=jnp.float32,
        workers=2,
        max_targets=32,
        val_interval=3,
        warmup_min_iters=20,
        seed=0,
        accumulate=1,
    )
    trainer.train(log_every=100)
    assert (tmp_path / "tal" / "last.npz").exists()
    res = trainer.validate(use_ema=False)
    assert np.isfinite(res.map50)


def test_grad_accumulation_train_smoke(shapes_data, tmp_path):
    """Reference nbs=64 cadence (train.py:189, 448-454): the trainer groups
    `accumulate` loader batches per optimizer step, carrying partial groups
    across epoch boundaries like the reference's global-ni stepping."""
    trainer = Trainer(
        TINY_CFG,
        str(shapes_data),
        HYP,
        epochs=2,
        batch_size=8,
        img_size=256,
        out_dir=str(tmp_path / "acc"),
        dtype=jnp.float32,
        workers=2,
        max_targets=32,
        val_interval=2,
        warmup_min_iters=4,
        seed=0,
        accumulate=4,   # 6 batches/epoch -> 1.5 opt steps/epoch, carries over
    )
    assert trainer.accumulate == 4
    # weight decay is scaled to the effective batch (ref train.py:191)
    assert np.isclose(trainer.weight_decay,
                      HYP["weight_decay"] * 8 * 4 / 64)
    trainer.train(log_every=1)
    # 12 loader batches / accumulate 4 = 3 optimizer steps
    assert int(trainer.state.opt.step) == 3
    assert (tmp_path / "acc" / "last.npz").exists()
    res = trainer.validate(use_ema=False)
    assert np.isfinite(res.map50)
