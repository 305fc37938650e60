"""One REAL train step per architecturally-distinct model family.

Forward-parity tests run eval-mode; this exercises the TRAIN path (train
forward + loss + grads + optimizer + placeholder-anchor autoanchor) that
caught the integer-anchor NaN (the Swin tph family NaN'd on its first
optimizer step while every eval-mode test was green — ROUND2_NOTES).

Families chosen for distinct compute paths: Swin windows (ca-str), HorNet
GnConv (hornet), GhostV2 DFC gate (ghostnet), ConvMixer (yolo_convmix),
DM/SM convs (DM), 5-scale P7 head (yolov5-p7), BiFPN+P2 (yolop2bifpn),
SPD (spdconv).
"""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from dmayolo_tpu.cli.common import CONFIGS
from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.train.loss import ComputeLoss, Targets
from dmayolo_tpu.train.optim import Schedule, param_groups
from dmayolo_tpu.train.step import init_train_state, make_train_step

HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "label_smoothing": 0.0, "fl_gamma": 0.0,
       "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
       "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1}

FAMILIES = ["ca-str", "hornet", "ghostnet", "yolo_convmix", "DM",
            "yolov5-p7", "yolop2bifpn", "spdconv"]


@pytest.mark.parametrize("name", FAMILIES)
def test_family_one_train_step_finite(name):
    cfg = yaml.safe_load(open(CONFIGS / "models" / f"{name}.yaml",
                              errors="ignore"))
    cfg["depth_multiple"], cfg["width_multiple"] = 0.33, 0.5
    cfg["nc"] = 3
    model = DetectionModel(cfg)
    if isinstance(cfg.get("anchors"), int):
        # integer-anchor configs build with [0,1,2..] placeholders that only
        # autoanchor replaces; install kmeans-like synthetic anchors the way
        # maybe_autoanchor would (tested separately in test_train_flags)
        nl, na = model.head.nl, model.head.na
        px = np.linspace(8, 160, nl * na * 2).reshape(nl, na, 2)
        model.head.anchors = (
            px / np.asarray(model.stride).reshape(-1, 1, 1)).astype(np.float32)

    loss = ComputeLoss(model.head.anchors, HYP, nc=3)
    sched = Schedule(HYP, epochs=3, steps_per_epoch=10)
    step = jax.jit(make_train_step(model, loss, sched, param_groups(model),
                                   weight_decay=5e-4, dtype=jnp.float32))
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    state = init_train_state(params, stats)
    rng = np.random.default_rng(0)
    bs = 2
    x = jnp.asarray(rng.uniform(0, 1, (bs, 128, 128, 3)).astype(np.float32))
    tgt = Targets(
        jnp.asarray(rng.integers(0, 3, (bs, 6)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.2, 0.8, (bs, 6, 4)).astype(np.float32)),
        jnp.asarray(np.concatenate(
            [np.ones((bs, 4)), np.zeros((bs, 2))], axis=1
        ).astype(bool)),  # include padded rows
    )
    state, met = step(state, x, tgt, jax.random.PRNGKey(1))
    assert np.isfinite(float(met["loss"])), met
    leaf = next(iter(state.params.values()))
    assert bool(jnp.isfinite(leaf).all())
