"""Unit tests: WBF, checkpoint roundtrip, evolution mutation, schedules,
fuse_params numerics, callbacks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.core.wbf import weighted_boxes_fusion
from dmayolo_tpu.train.evolve import META, log_generation, mutate
from dmayolo_tpu.train.optim import Schedule, ema_decay, param_groups
from dmayolo_tpu.utils.callbacks import Callbacks
from dmayolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint, strip_checkpoint


class TestWBF:
    def test_identical_models_fuse_to_same_boxes(self):
        boxes = np.array([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]])
        scores = np.array([0.9, 0.7])
        labels = np.array([0.0, 1.0])
        fb, fs, fl = weighted_boxes_fusion([boxes, boxes], [scores, scores],
                                           [labels, labels], iou_thr=0.5)
        assert fb.shape == (2, 4)
        np.testing.assert_allclose(sorted(fs.tolist()), [0.7, 0.9], atol=1e-9)
        np.testing.assert_allclose(fb[0], boxes[0], atol=1e-9)

    def test_overlapping_boxes_weighted_average(self):
        b1 = np.array([[0.10, 0.10, 0.30, 0.30]])
        b2 = np.array([[0.12, 0.12, 0.32, 0.32]])
        fb, fs, fl = weighted_boxes_fusion(
            [b1, b2], [np.array([0.8]), np.array([0.4])],
            [np.zeros(1), np.zeros(1)], iou_thr=0.4,
        )
        assert len(fb) == 1
        expected = (0.8 * b1[0] + 0.4 * b2[0]) / 1.2
        np.testing.assert_allclose(fb[0], expected, atol=1e-9)
        assert fs[0] == pytest.approx(0.6)  # avg, full support

    def test_single_model_support_rescales_score(self):
        b1 = np.array([[0.1, 0.1, 0.3, 0.3]])
        empty = np.zeros((0, 4))
        fb, fs, fl = weighted_boxes_fusion(
            [b1, empty], [np.array([0.8]), np.zeros(0)],
            [np.zeros(1), np.zeros(0)],
        )
        assert fs[0] == pytest.approx(0.4)  # 1/2 model support


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = {("model", "0", "conv", "kernel"): jnp.ones((3, 3, 2, 4))}
        stats = {("model", "0", "bn", "mean"): jnp.zeros((4,))}
        save_checkpoint(tmp_path / "ck", params=params, stats=stats,
                        ema_params=params, ema_stats=stats,
                        meta={"epoch": 7, "best_fitness": 0.5})
        trees, meta = load_checkpoint(tmp_path / "ck")
        assert meta["epoch"] == 7
        np.testing.assert_array_equal(
            np.asarray(trees["params"][("model", "0", "conv", "kernel")]), np.ones((3, 3, 2, 4))
        )
        strip_checkpoint(tmp_path / "ck", tmp_path / "ck_stripped")
        trees2, _ = load_checkpoint(tmp_path / "ck_stripped")
        assert "opt_mom" not in trees2 and "params" in trees2


class TestEvolve:
    def test_mutation_stays_in_bounds(self, tmp_path):
        import random

        base = {k: (lo + hi) / 2 for k, (g, lo, hi) in META.items()}
        rng = random.Random(0)
        for i in range(20):
            h = mutate(dict(base), tmp_path / "evolve.csv", rng)
            for k, (g, lo, hi) in META.items():
                assert lo - 1e-9 <= h[k] <= hi + 1e-9, (k, h[k])
            log_generation(tmp_path / "evolve.csv", fitness=float(i), hyp=h)
        # parent selection reads back the csv without crashing
        h = mutate(dict(base), tmp_path / "evolve.csv", rng)
        assert set(META).issubset(h)


class TestSchedule:
    HYP = {"lr0": 0.01, "lrf": 0.1, "momentum": 0.937,
           "warmup_momentum": 0.8, "warmup_bias_lr": 0.1, "warmup_epochs": 3.0}

    def test_warmup_and_cosine(self):
        s = Schedule(self.HYP, epochs=100, steps_per_epoch=100, warmup_min_iters=300)
        d0 = s(jnp.asarray(0))
        assert float(d0["g2"]) == pytest.approx(0.1, abs=1e-6)  # bias warmup start
        assert float(d0["g0"]) == pytest.approx(0.0, abs=1e-6)
        assert float(d0["momentum"]) == pytest.approx(0.8, abs=1e-6)
        mid = s(jnp.asarray(5000))
        end = s(jnp.asarray(9999))
        assert float(mid["g1"]) > float(end["g1"])  # cosine decays
        assert float(end["g1"]) == pytest.approx(0.01 * 0.1, rel=0.05)

    def test_ema_ramp(self):
        assert float(ema_decay(jnp.asarray(1))) < 0.001
        assert float(ema_decay(jnp.asarray(100000))) == pytest.approx(0.9999, rel=1e-3)


def test_param_groups_reference_policy():
    from dmayolo_tpu.graph import DetectionModel
    from tests.test_train_step import TINY_CFG

    m = DetectionModel(TINY_CFG)
    labels = param_groups(m)
    # BN scales -> g0, kernels -> g1, biases -> g2
    assert labels[("model", "0", "bn", "scale")] == "g0"
    assert labels[("model", "0", "conv", "kernel")] == "g1"
    assert labels[("model", "0", "bn", "bias")] == "g2"
    counts = {}
    for v in labels.values():
        counts[v] = counts.get(v, 0) + 1
    assert counts["g0"] > 0 and counts["g1"] > 0 and counts["g2"] > 0


def test_fuse_params_preserves_outputs():
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params
    from tests.test_train_step import TINY_CFG

    m = DetectionModel(TINY_CFG)
    params, stats = m.init_with_priors(jax.random.PRNGKey(3))
    # non-trivial BN stats
    stats = {k: v + 0.3 if k[-1] == "mean" else v * 1.7 for k, v in stats.items()}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    ref = m.apply(params, stats, x)
    fp, fs = fuse_params(m, params, stats)
    fused = m.apply(fp, fs, x, fused=True)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fuse_params_folds_non_convbn_pairs():
    """SCConv k2/k3/k4, CoorAttention conv1->bn1 and GhostV2 ConvUnit carry
    raw Conv2d+BatchNorm2d pairs; fuse_params must fold them (the r2 perf
    profile showed them dominating the 'fused' forward) with identical
    outputs and no leftover bn params."""
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    cfg = {
        "nc": 3,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]] * 3,
        "backbone": [
            [-1, 1, "Conv", [16, 6, 2, 2]],
            [-1, 1, "SCConv", [16]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "C3CA", [32]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "C3GhostV2", [32]],
        ],
        "head": [[[2, 4, 5], 1, "Detect", ["nc", "anchors"]]],
    }
    m = DetectionModel(cfg)
    params, stats = m.init_with_priors(jax.random.PRNGKey(5))
    stats = {k: v + 0.2 if k[-1] == "mean" else v * 1.4 for k, v in stats.items()}
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    ref = m.apply(params, stats, x)
    fp, fs = fuse_params(m, params, stats)
    assert not any("bn" in k[-2] or k[-2] == "bn1" for k in fs), "BN stats left unfused"
    fused = m.apply(fp, fs, x, fused=True)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # idempotent on already-fused params
    fp2, fs2 = fuse_params(m, fp, fs)
    assert set(fp2) == set(fp) and set(fs2) == set(fs)


def test_callbacks_bus():
    cb = Callbacks()
    hits = []
    cb.register_action("on_train_end", "t", lambda *a: hits.append(a))
    cb.run("on_train_end", 1, 2)
    assert hits == [(1, 2)]
    with pytest.raises(AssertionError):
        cb.run("not_a_hook")


def test_profile_layers_serving_conditions(capsys):
    # profile_layers must accept serving conditions (batch>1, bf16, fused
    # weights) — the flagship serving profile runs through this path.
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params
    from dmayolo_tpu.utils.model_info import profile_layers
    from tests.test_train_step import TINY_CFG

    m = DetectionModel(TINY_CFG)
    params, stats = m.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(m, params, stats)
    res = profile_layers(m, fp, fs, img_size=64, iters=1, batch=2,
                         dtype=jnp.bfloat16, fused=True)
    assert len(res) == len(m.specs)
    assert all(cum >= 0 for _, _, _, cum in res)
    assert "module" in capsys.readouterr().out


def test_tal_assigner_ya_yb_env(monkeypatch):
    # reference tuning surface: YA/YB env override assigner alpha/beta
    # (ref utils/tal.py:95-96); explicit args still win
    from dmayolo_tpu.train.tal import ComputeLossTAL

    monkeypatch.setenv("YA", "0.7")
    monkeypatch.setenv("YB", "4.0")
    l1 = ComputeLossTAL([8.0, 16.0, 32.0], nc=3)
    assert (l1.assigner.alpha, l1.assigner.beta) == (0.7, 4.0)
    l2 = ComputeLossTAL([8.0, 16.0, 32.0], nc=3, alpha=0.25, beta=8.0)
    assert (l2.assigner.alpha, l2.assigner.beta) == (0.25, 8.0)
    monkeypatch.delenv("YA")
    monkeypatch.delenv("YB")
    l3 = ComputeLossTAL([8.0, 16.0, 32.0], nc=3)
    assert (l3.assigner.alpha, l3.assigner.beta) == (0.5, 6.0)


def test_resolve_remat_policy():
    # remat auto-enables at >= 1024px (measured faster AND smaller there),
    # explicit flags win in both directions
    from dmayolo_tpu.cli.train import resolve_remat

    assert resolve_remat(False, False, 640) is False
    assert resolve_remat(False, False, 1024) is True
    assert resolve_remat(False, False, 1536) is True
    assert resolve_remat(False, True, 1536) is False   # --no-remat opts out
    assert resolve_remat(True, False, 640) is True     # --remat forces on


def test_checkpoint_anchor_roundtrip(tmp_path):
    # autoanchor-evolved anchors must survive save -> load -> strip: the
    # cfg alone would rebuild the ORIGINAL (or placeholder) anchors and
    # silently decode garbage (round-2 advisor finding)
    import numpy as np

    from dmayolo_tpu.cli.common import load_model_from_checkpoint, resolve_config
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.utils.checkpoint import save_checkpoint, strip_checkpoint

    import jax

    model = DetectionModel(resolve_config("yolov5n.yaml", "models"), nc=3)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    evolved = np.asarray(model.head.anchors, np.float32) * 1.7
    model.head.anchors = evolved

    ck = tmp_path / "last.npz"
    save_checkpoint(ck, params=params, stats=stats,
                    meta={"cfg": "yolov5n.yaml", "nc": 3,
                          "anchors": evolved.tolist()})
    m2, _, _ = load_model_from_checkpoint(str(ck))
    assert np.allclose(np.asarray(m2.head.anchors), evolved)

    stripped = strip_checkpoint(str(ck), str(tmp_path / "best.npz"))
    m3, _, _ = load_model_from_checkpoint(str(stripped))
    assert np.allclose(np.asarray(m3.head.anchors), evolved)


def test_loggers_csv_schema_widens_mid_run(tmp_path):
    """val_interval>1 logs train-only rows before the first val row adds
    metrics/* columns — the csv must keep ONE consistent header (this
    produced 6-col headers over 11-col rows before the union-rewrite fix)."""
    import csv

    from dmayolo_tpu.utils.loggers import Loggers

    lg = Loggers(tmp_path, use_tb=False)
    lg.log_metrics({"train/loss": 1.0}, 0)
    lg.log_metrics({"train/loss": 0.9, "metrics/mAP_0.5": 0.5}, 1)
    lg.log_metrics({"train/loss": 0.8}, 2)
    with open(tmp_path / "results.csv", newline="") as f:
        rows = list(csv.reader(f))
    header = rows[0]
    assert header == ["epoch", "train/loss", "metrics/mAP_0.5"]
    assert all(len(r) == len(header) for r in rows), rows
    with open(tmp_path / "results.csv", newline="") as f:
        d = list(csv.DictReader(f))
    assert d[1]["metrics/mAP_0.5"] == "0.5" and d[2]["metrics/mAP_0.5"] == ""
