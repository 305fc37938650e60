"""Export-then-infer round trip: detect.py runs exported artifacts.

Reference surface: detect.py:96-141 (DetectMultiBackend runs pt/ONNX/TF/
TFLite weights) + export.py.  Ours: the native npz checkpoint and the
three exported program formats (stablehlo / SavedModel / TFLite) must
produce the same detections through the real detect CLI.  ONNX itself is
env-blocked (no `onnx`/`tf2onnx` wheels, zero egress) — see COVERAGE.md.
"""
import numpy as np
import pytest

import jax

from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.utils.checkpoint import save_checkpoint

from test_e2e_train import TINY_CFG

tf = pytest.importorskip("tensorflow")


def _read_labels(d):
    out = {}
    for p in sorted(d.glob("*.txt")):
        rows = np.array([ln.split() for ln in p.read_text().split("\n") if ln],
                        np.float64)
        out[p.stem] = rows.reshape(-1, 6) if rows.size else np.zeros((0, 6))
    return out


def test_detect_runs_exported_artifacts(tmp_path):
    import cv2

    from dmayolo_tpu.cli.detect import main as detect_main
    from dmayolo_tpu.cli.export import main as export_main

    # tiny checkpoint (weights need not be trained for a format round trip)
    model = DetectionModel(TINY_CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(3))
    ckpt = tmp_path / "w.npz"
    save_checkpoint(ckpt, params=params, stats=stats,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})

    # 3 images through a batch-2 exported program exercises the pad path
    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        cv2.imwrite(str(src / f"{i}.jpg"),
                    rng.integers(0, 255, (200, 320, 3), dtype=np.uint8))

    artifacts = export_main([
        "--weights", str(ckpt), "--imgsz", "256", "--batch-size", "2",
        "--include", "stablehlo", "saved_model", "tflite", "--device", "cpu",
        "--fp32",
    ])
    by_kind = {a.name.split(".")[-1] if a.suffix else "saved_model": a
               for a in artifacts}
    assert {"stablehlo", "saved_model", "tflite"} <= set(by_kind)

    def run(weights, name):
        out = detect_main([
            "--weights", str(weights), "--source", str(src),
            # untrained prior-init biases put conf = sigmoid(obj)*sigmoid(cls)
            # around 3e-4; threshold below it so the comparison has rows.
            # max-det > total anchors (4032): a top-K cut inside the dense
            # near-tied conf band would turn runtime ulp differences into
            # wholesale selection differences
            "--imgsz", "256", "--conf-thres", "0.0001", "--max-det", "4500",
            "--device", "cpu",
            "--fp32", "--save-txt", "--save-conf", "--nosave",
            "--project", str(tmp_path / "runs"), "--name", name, "--exist-ok",
        ])
        return _read_labels(out / "labels")

    native = run(ckpt, "native")
    assert native and any(len(v) for v in native.values()), \
        "native run produced no detections — comparison would be vacuous"

    # same program, same dtype — but each runtime's ulp-level arithmetic
    # differences can flip NMS suppression ties inside the untrained model's
    # dense near-tied conf band (~3e-4). stablehlo/saved_model execute the
    # identical XLA program (>=98% row match); TFLite re-lowers through its
    # own builtins + XNNPACK, where tie flips cascade further (>=90%).
    min_match = {"stablehlo": 0.98, "saved_model": 0.98, "tflite": 0.90}
    for kind in ("stablehlo", "saved_model", "tflite"):
        got = run(by_kind[kind], kind)
        assert set(got) == set(native), kind
        for stem in native:
            a, b = native[stem], got[stem]
            assert abs(len(a) - len(b)) <= max(2, 0.02 * len(a)), \
                (kind, stem, len(a), len(b))
            for x, y, tag in ((a, b, "fwd"), (b, a, "rev")):
                if not len(x):
                    continue
                # nearest row by max-abs over (cls, cx, cy, w, h, conf)
                d = np.abs(x[:, None, :] - y[None, :, :]).max(-1)
                matched = (d.min(1) < 5e-3).mean()
                assert matched >= min_match[kind], (kind, stem, tag, matched)


def test_streams_batch_exceeding_exported_batch_chunks(tmp_path, capsys):
    """Two live sources through a batch-1 exported program: the backend
    infer must chunk (it used to die on `assert b <= backend_bs`)."""
    import cv2

    from dmayolo_tpu.cli.detect import main as detect_main
    from dmayolo_tpu.cli.export import main as export_main

    model = DetectionModel(TINY_CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(4))
    ckpt = tmp_path / "w.npz"
    save_checkpoint(ckpt, params=params, stats=stats,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})
    (art,) = export_main([
        "--weights", str(ckpt), "--imgsz", "128", "--batch-size", "1",
        "--include", "stablehlo", "--device", "cpu", "--fp32",
    ])

    rng = np.random.default_rng(9)
    vids = []
    for i in range(2):
        v = tmp_path / f"s{i}.mp4"
        vw = cv2.VideoWriter(str(v), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (160, 120))
        assert vw.isOpened()
        for _ in range(20):
            vw.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
        vw.release()
        vids.append(v)
    streams = tmp_path / "src.streams"
    streams.write_text("\n".join(str(v) for v in vids) + "\n")

    detect_main([
        "--weights", str(art), "--source", str(streams),
        "--imgsz", "128", "--conf-thres", "0.001",
        "--project", str(tmp_path / "runs"), "--name", "s", "--exist-ok",
        "--device", "cpu",
    ])
    out = capsys.readouterr().out
    assert "2 sources" in out
