"""Smoke: detect CLI video-file and multi-stream batched paths
(ref LoadImages video branch + LoadStreams, utils/datasets.py:158-367).
Synthetic mp4s stand in for cameras/URLs — the loop/annotate/write
machinery is identical.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax

    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.utils.checkpoint import save_checkpoint
    from tests.test_e2e_train import TINY_CFG

    p_dir = tmp_path_factory.mktemp("ck")
    m = DetectionModel(TINY_CFG)
    p, s = m.init_with_priors(jax.random.PRNGKey(0))
    save_checkpoint(p_dir / "w.npz", params=p, stats=s,
                    meta={"cfg": TINY_CFG, "nc": TINY_CFG["nc"]})
    return p_dir / "w.npz"


@pytest.fixture(scope="module")
def tiny_cls_ckpt(tmp_path_factory):
    import jax

    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.utils.checkpoint import save_checkpoint
    from tests.test_e2e_train import TINY_CFG

    cfg = {
        "nc": TINY_CFG["nc"], "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Conv", [16, 3, 2]]],
        "head": [[-1, 1, "Classify", ["nc"]]],
    }
    p_dir = tmp_path_factory.mktemp("cls")
    m = DetectionModel(cfg)
    p, s = m.init(jax.random.PRNGKey(1))
    save_checkpoint(p_dir / "c.npz", params=p, stats=s,
                    meta={"cfg": cfg, "nc": cfg["nc"]})
    return p_dir / "c.npz"


def _write_video(path, n_frames=6, size=(160, 120), seed=0):
    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, size)
    assert vw.isOpened(), "mp4v encoder unavailable"
    for _ in range(n_frames):
        vw.write(rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8))
    vw.release()


def test_detect_video_file(tiny_ckpt, tiny_cls_ckpt, tmp_path):
    from dmayolo_tpu.cli.detect import main as detect_main

    vid = tmp_path / "clip.mp4"
    _write_video(vid)
    out = detect_main([
        "--weights", str(tiny_ckpt), "--source", str(vid),
        "--imgsz", "128", "--conf-thres", "0.001",
        "--classify", str(tiny_cls_ckpt),  # second stage on the video path
        "--project", str(tmp_path / "runs"), "--name", "v", "--exist-ok",
        "--device", "cpu",
    ])
    assert (out / "clip_det.mp4").exists()
    cap = cv2.VideoCapture(str(out / "clip_det.mp4"))
    assert cap.isOpened() and cap.get(cv2.CAP_PROP_FRAME_COUNT) >= 1
    cap.release()


def test_detect_streams(tiny_ckpt, tmp_path, capsys):
    from dmayolo_tpu.cli.detect import main as detect_main

    a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_video(a, n_frames=30, seed=1)
    _write_video(b, n_frames=30, seed=2)
    streams = tmp_path / "src.streams"
    streams.write_text(f"{a}\n{b}\n")
    detect_main([
        "--weights", str(tiny_ckpt), "--source", str(streams),
        "--imgsz", "128", "--conf-thres", "0.001",
        "--project", str(tmp_path / "runs"), "--name", "s", "--exist-ok",
        "--device", "cpu",
    ])
    out = capsys.readouterr().out
    assert "streams:" in out and "2 sources" in out
