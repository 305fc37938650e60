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


def test_fit_path_probes_the_real_step():
    # Integration: the real jitted train step lowers at each rung and XLA's
    # memory analysis is readable on CPU. max_batch bounds the compile count
    # (ladder 1,2,4 only) — the ladder/selection logic itself is covered by
    # the fake-lower tests below.
    model = DetectionModel(dict(TINY_CFG), nc=3)
    loss = ComputeLoss(model.head.anchors, HYP, nc=3)
    b = find_train_batch_size(model, loss, HYP, img_size=64,
                              dtype=jnp.float32,
                              hbm_bytes=int(4 * 1024**3),
                              max_targets=8, max_batch=4)
    assert b == 4  # tiny model at 64px: every rung up to max_batch fits in 4G


def test_bigger_budget_admits_bigger_batch():
    G = 1024**3
    def mem(bs):
        return int(0.1 * G + 0.05 * G * bs)
    b_small = autobatch(_fake_lower(mem), hbm_bytes=1 * G)   # 0.9G limit -> 16
    b_big = autobatch(_fake_lower(mem), hbm_bytes=4 * G)     # 3.6G limit -> 64
    assert b_small >= 1 and b_big > b_small


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

    # budget 1.2GB, 90% target = 1.08G limit; memory 0.1G + 0.05G/img.
    # multiple_of=8 -> ladder probes only valid sizes 8,16,32: 8,16 fit,
    # 32 -> 1.7G > 1.25*limit stops it; midpoint probes 24 (1.3G, over)
    # and keeps 16
    b = autobatch(lower, hbm_bytes=int(1.2e9), multiple_of=8)
    assert b == 16
    assert calls == [8, 16, 32, 24]


def _fake_lower(mem_fn):
    """lower_for_batch stub: mem_fn(bs) -> bytes, or raise to model a
    compile failure."""
    def lower(bs):
        m = mem_fn(bs)

        class L:
            def compile(self):
                class C:
                    def memory_analysis(self_c):
                        class MA:
                            temp_size_in_bytes = m
                            argument_size_in_bytes = 0
                            output_size_in_bytes = 0
                            alias_size_in_bytes = 0
                        return MA()
                return C()
        return L()
    return lower


def test_non_monotonic_memory_keeps_probing():
    # The 1536px flagship case measured on a real v5e (exp_autobatch_calib):
    # bs4 schedules to MORE memory than bs8; the ladder must not stop at the
    # first just-over-limit probe. budget 16G, limit 14.4G.
    G = 1024**3
    table = {1: 13.0 * G, 2: 14.0 * G, 4: 15.25 * G, 8: 14.25 * G}

    def mem(bs):
        if bs not in table:          # bs >= 16: compile blows up
            raise RuntimeError("remote_compile 500")
        return int(table[bs])

    b = autobatch(_fake_lower(mem), hbm_bytes=16 * G)
    assert b == 8  # not 2 (last under-limit before bs4) and not a bail-out


def test_compile_failure_above_working_size_means_too_big():
    G = 1024**3
    b = autobatch(_fake_lower(
        lambda bs: int(1 * G + 0.5 * G * bs) if bs <= 8 else
        (_ for _ in ()).throw(RuntimeError("boom"))),
        hbm_bytes=16 * G)
    # bs8 = 5G fits, bs16 fails to compile -> treated as over; midpoint 12
    # also fails -> best stays 8
    assert b == 8


def test_smallest_probe_compile_failure_returns_default():
    def mem(bs):
        raise RuntimeError("broken")

    assert autobatch(_fake_lower(mem), hbm_bytes=16 * 1024**3, default=7) == 7


def test_multiple_of_never_returns_an_over_budget_batch():
    # Regression: with multiple_of=8 and bs8 measuring OVER the device
    # budget, autobatch used to round 1/2/4-fit results UP to 8 — the exact
    # program it measured as not fitting. Now it must refuse.
    import pytest

    G = 1024**3
    with pytest.raises(RuntimeError, match="smallest valid batch-size 8"):
        autobatch(_fake_lower(lambda bs: int(2.5 * G * bs)),  # bs8 = 20G
                  hbm_bytes=16 * G, multiple_of=8)


def test_multiple_of_tight_fit_within_physical_budget_is_allowed():
    # bs8 over the 90% limit (15.2G > 14.4G) but under the 16G device
    # budget: usable, returned with a warning rather than refused.
    G = 1024**3
    b = autobatch(_fake_lower(lambda bs: int(1.9 * G * bs)),
                  hbm_bytes=16 * G, multiple_of=8)
    assert b == 8


def test_probe_mirrors_deployed_program_accumulate_and_uint8():
    # find_train_batch_size must lower the program the Trainer jits: batch
    # dim accumulate*bs and uint8 images under device-aug.
    import jax

    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.train.loss import ComputeLoss

    model = DetectionModel(dict(TINY_CFG), nc=3)
    loss = ComputeLoss(model.head.anchors, HYP, nc=3)
    seen = []
    import dmayolo_tpu.train.autobatch as ab

    orig = ab.autobatch

    def spy(lower_for_batch, **kw):
        seen.append(lower_for_batch(2).as_text())  # bs=2 -> accumulate=32
        return 2

    ab.autobatch = spy
    try:
        b = find_train_batch_size(
            model, loss, HYP, img_size=64, dtype=jnp.float32,
            hbm_bytes=4 * 1024**3, max_targets=4,
            device_aug={"hgain": 0.015, "sgain": 0.7, "vgain": 0.4,
                        "fliplr": 0.5})
    finally:
        ab.autobatch = orig
    assert b == 2
    # argument batch = accumulate(32) * bs(2) = 64 images, uint8 (device-aug)
    assert "tensor<64x64x64x3xui8>" in seen[0]
