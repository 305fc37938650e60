"""TFLite round-trip on TRAINED weights (round-3 verdict item 7).

test_detect_backends.py certifies the export formats on an untrained
model, where the conf band is dense and near-tied (~3e-4), so XNNPACK's
ulp-level differences flip selection ties and the bar had to sit at 90%
row match.  That bar exists only because of the degenerate conf
distribution — on genuinely trained weights the conf gaps between real
detections and noise are orders of magnitude, so the same TFLite leg must
match essentially exactly.  This test trains a tiny model for real (the
link-5b recipe scaled down, same as the bf16-delta fixture), exports
SavedModel + TFLite, and holds the round trip to >=99% row match at a
serving-style conf threshold.

Reference surface: export.py TF sections (export_saved_model/export_tflite)
+ detect.py:96-141 (DetectMultiBackend running TFLite weights).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.data.synthetic import generate
from dmayolo_tpu.train.trainer import Trainer
from dmayolo_tpu.utils.checkpoint import save_checkpoint

from test_e2e_train import HYP, TINY_CFG

tf = pytest.importorskip("tensorflow")


def _read_labels(d):
    out = {}
    for p in sorted(d.glob("*.txt")):
        rows = np.array([ln.split() for ln in p.read_text().split("\n") if ln],
                        np.float64)
        out[p.stem] = rows.reshape(-1, 6) if rows.size else np.zeros((0, 6))
    return out


def test_tflite_matches_native_on_trained_weights(tmp_path):
    from dmayolo_tpu.cli.detect import main as detect_main
    from dmayolo_tpu.cli.export import main as export_main

    data = generate(tmp_path / "shapes", n_train=48, n_val=24, img_size=256,
                    seed=2)
    trainer = Trainer(
        TINY_CFG, str(data), HYP, epochs=32, batch_size=8, img_size=256,
        out_dir=str(tmp_path / "exp"), dtype=jnp.float32, workers=2,
        max_targets=32, val_interval=100, warmup_min_iters=60, seed=0,
        accumulate=1,
    )
    trainer.train(log_every=100)

    ckpt = tmp_path / "trained.npz"
    save_checkpoint(ckpt, params=trainer.state.ema_params,
                    stats=trainer.state.ema_stats,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})

    artifacts = export_main([
        "--weights", str(ckpt), "--imgsz", "256", "--batch-size", "2",
        "--include", "saved_model", "tflite", "--device", "cpu", "--fp32",
    ])
    by_kind = {a.name.split(".")[-1] if a.suffix else "saved_model": a
               for a in artifacts}
    assert {"saved_model", "tflite"} <= set(by_kind)

    src = tmp_path / "shapes" / "images" / "val"

    def run(weights, name):
        out = detect_main([
            "--weights", str(weights), "--source", str(src),
            # serving-style threshold (~150x the untrained ~3e-4 tie band):
            # trained conf gaps are real here, so ulp diffs cannot flip
            # selection the way they do in test_detect_backends
            "--imgsz", "256", "--conf-thres", "0.05", "--max-det", "300",
            "--device", "cpu",
            "--fp32", "--save-txt", "--save-conf", "--nosave",
            "--project", str(tmp_path / "runs"), "--name", name,
            "--exist-ok",
        ])
        return _read_labels(out / "labels")

    native = run(ckpt, "native")
    n_det = sum(len(v) for v in native.values())
    assert n_det >= 12, f"trained model found only {n_det} objects at " \
        "conf 0.05 — comparison would be vacuous"

    for kind in ("saved_model", "tflite"):
        got = run(by_kind[kind], kind)
        assert set(got) == set(native), kind
        total = matched = 0
        for stem in native:
            a, b = native[stem], got[stem]
            for x, y in ((a, b), (b, a)):
                if not len(x):
                    continue
                if not len(y):
                    total += len(x)
                    continue
                d = np.abs(x[:, None, :] - y[None, :, :]).max(-1)
                total += len(x)
                matched += int((d.min(1) < 5e-3).sum())
        assert total and matched / total >= 0.99, \
            (kind, matched, total, matched / max(total, 1))
