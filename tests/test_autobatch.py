"""Autobatch: XLA-memory-analysis batch search (ref utils/autobatch.py:22-56).

On CPU there is no device memory budget, so the CLI path returns the default
(like the reference's CUDA-not-detected branch); the fit path is exercised by
passing an explicit hbm budget.
"""
import numpy as np

import jax
import jax.numpy as jnp

from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.train.autobatch import (autobatch, device_memory_budget,
                                         find_train_batch_size)
from dmayolo_tpu.train.loss import ComputeLoss

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
        [-1, 1, "SPPF", [256, 5]],
    ],
    "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]],
}

HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
       "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
       "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1}


def test_cpu_has_no_budget_and_default_is_used():
    assert device_memory_budget() is None  # conftest pins the CPU platform
    assert autobatch(lambda bs: (_ for _ in ()).throw(AssertionError("must not lower")),
                     default=16) == 16


def test_fit_path_scales_with_budget():
    model = DetectionModel(dict(TINY_CFG), nc=3)
    loss = ComputeLoss(model.head.anchors, HYP, nc=3)

    def find(gib):
        return find_train_batch_size(model, loss, HYP, img_size=128,
                                     dtype=jnp.float32,
                                     hbm_bytes=int(gib * 1024**3),
                                     max_targets=16)

    b_small, b_big = find(0.5), find(4.0)
    assert b_small >= 1 and b_big >= b_small
    assert b_big > b_small  # 8x the memory must admit a larger batch


def test_multiple_of_rounding():
    calls = []

    def lower(bs):
        calls.append(bs)

        class L:
            def compile(self):
                class C:
                    def memory_analysis(self_c):
                        class MA:  # 100MB fixed + 50MB/img
                            temp_size_in_bytes = int(50e6) * bs
                            argument_size_in_bytes = int(100e6)
                            output_size_in_bytes = 0
                            alias_size_in_bytes = 0
                        return MA()
                return C()
        return L()

    # budget 1.2GB, 90% target: (1.08e9 - 1e8) / 5e7 = 19.6 -> 19 -> 16 (mult 8)
    b = autobatch(lower, hbm_bytes=int(1.2e9), multiple_of=8)
    assert b == 16
    assert calls == [1, 2, 4]
