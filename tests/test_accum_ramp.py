"""Warmup accumulate ramp (ref train.py:412): during warmup the optimizer
steps every `round(interp(ni, [0, nw], [1, nbs/bs]))` batches, not every
nbs/bs — on short-budget runs this is MOST of the optimizer steps (the
round-5 vda benchmark: 292 vs 120; measured +4.3 pt mAP@.5 on the TAL
recipe).  The lr/momentum schedule on this path is driven by the batch
counter ni directly (the opt-step -> ni mapping is nonlinear).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dmayolo_tpu.train.optim import Schedule  # noqa: E402


def ref_cadence_steps(n_batches, nw, A):
    """The reference's exact stepping rule (train.py:409-412, 448-454)."""
    pending, steps = 0, 0
    for ni in range(n_batches):
        pending += 1
        a = max(1, min(A, round(float(np.interp(ni, [0, nw], [1, A])))))
        if pending >= a:
            steps += 1
            pending = 0
    return steps


@pytest.fixture(scope="module")
def shapes(tmp_path_factory):
    from dmayolo_tpu.data.synthetic import generate

    root = tmp_path_factory.mktemp("ramp_shapes")
    generate(root, n_train=24, n_val=8, img_size=128, seed=3)
    return root


def _tiny_cfg(tmp_path):
    import yaml

    cfg = {
        "nc": 3, "depth_multiple": 0.33, "width_multiple": 0.25,
        "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
                    [116, 90, 156, 198, 373, 326]],
        "backbone": [[-1, 1, "Conv", [64, 6, 2, 2]],
                     [-1, 1, "Conv", [128, 3, 2]],
                     [-1, 1, "C3", [128]],
                     [-1, 1, "Conv", [256, 3, 2]],
                     [-1, 1, "C3", [256]],
                     [-1, 1, "Conv", [512, 3, 2]],
                     [-1, 1, "C3", [512]],
                     [-1, 1, "SPPF", [512, 5]]],
        "head": [[[4, 6, 7], 1, "Detect", ["nc", "anchors"]]],
    }
    p = tmp_path / "tiny.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(p)


def test_trainer_matches_reference_cadence(shapes, tmp_path):
    from dmayolo_tpu.cli.common import load_hyp
    from dmayolo_tpu.train.trainer import Trainer

    epochs = 4
    tr = Trainer(
        _tiny_cfg(tmp_path), str(shapes / "shapes.yaml"),
        hyp=load_hyp("scratch"), epochs=epochs, batch_size=8, img_size=128,
        out_dir=str(tmp_path / "runs"), max_targets=16, dtype=jnp.float32,
        workers=1, noval=True, autoanchor=False, warmup_min_iters=4,
    )
    assert tr.accum_ramp and tr.accumulate == 3  # 24 imgs bs8 -> spe 3
    tr.train()
    n_batches = epochs * tr.steps_per_epoch
    want = ref_cadence_steps(n_batches, tr.sched.nw, tr.accumulate)
    assert int(tr.state.opt.step) == want
    assert want > n_batches // tr.accumulate  # the ramp added real steps


def test_fixed_cadence_opt_out(shapes, tmp_path):
    from dmayolo_tpu.cli.common import load_hyp
    from dmayolo_tpu.train.trainer import Trainer

    tr = Trainer(
        _tiny_cfg(tmp_path), str(shapes / "shapes.yaml"),
        hyp=load_hyp("scratch"), epochs=2, batch_size=8, img_size=128,
        out_dir=str(tmp_path / "runs"), max_targets=16, dtype=jnp.float32,
        workers=1, noval=True, autoanchor=False, accum_ramp=False,
    )
    assert not tr.accum_ramp
    tr.train()
    assert int(tr.state.opt.step) == 2 * (tr.steps_per_epoch // tr.accumulate)


def test_schedule_batch_units_matches_reference_interp():
    """sched(ni, batch_units=True) == the reference's per-batch warmup
    interp (train.py:405-422) for every group, momentum included."""
    hyp = {"lr0": 0.01, "lrf": 0.1, "momentum": 0.937,
           "warmup_epochs": 3.0, "warmup_momentum": 0.8,
           "warmup_bias_lr": 0.1, "weight_decay": 5e-4}
    spe, epochs = 24, 40
    s = Schedule(hyp, epochs=epochs, steps_per_epoch=spe, batch_size=8,
                 warmup_min_iters=1000, step_scale=8)
    nw = s.nw
    one_cycle = lambda e: ((1 - np.cos(e * np.pi / epochs)) / 2) * (hyp["lrf"] - 1) + 1
    for ni in [0, 1, 17, 250, 500, 999, 1000]:
        got = {k: float(v) for k, v in s(jnp.asarray(ni), batch_units=True).items()}
        epoch = ni // spe
        base = hyp["lr0"] * one_cycle(epoch)
        want_main = np.interp(ni, [0, nw], [0.0, base])
        want_bias = np.interp(ni, [0, nw], [hyp["warmup_bias_lr"], base])
        want_mom = np.interp(ni, [0, nw], [hyp["warmup_momentum"], hyp["momentum"]])
        assert np.isclose(got["g0"], want_main, rtol=1e-5), (ni, got["g0"], want_main)
        assert np.isclose(got["g2"], want_bias, rtol=1e-5)
        assert np.isclose(got["momentum"], want_mom, rtol=1e-5)
