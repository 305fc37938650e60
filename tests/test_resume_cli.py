"""Run-config persistence + resume surface.

Reference contract: every run persists hyp.yaml + opt.yaml (train.py:92-99)
and --resume restores the run's own options and continues in place
(train.py:657-669); utils/aws/resume.py rescans for interrupted runs.
"""
import sys

import numpy as np
import pytest
import yaml

from pathlib import Path

CFG = {
    "nc": 4,
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
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "SPPF", [512, 5]],
    ],
    "head": [[[4, 6, 7], 1, "Detect", ["nc", "anchors"]]],
}


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """One finished 2-epoch training via the real CLI."""
    tmp = tmp_path_factory.mktemp("resume")
    from dmayolo_tpu.data.synthetic import generate

    data_yaml = generate(str(tmp / "data"), n_train=8, n_val=4, img_size=128)
    cfg_path = tmp / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(CFG))

    from dmayolo_tpu.cli.train import main

    main([
        "--cfg", str(cfg_path), "--data", str(data_yaml), "--epochs", "2",
        "--batch-size", "8", "--imgsz", "128", "--project",
        str(tmp / "runs"), "--name", "r", "--exist-ok", "--workers", "1",
        "--noautoanchor", "--fp32", "--patience", "100",
    ])
    return tmp / "runs" / "r", cfg_path, data_yaml, tmp


def test_run_persists_config(run_dir):
    out, cfg_path, data_yaml, _ = run_dir
    assert (out / "opt.yaml").exists() and (out / "hyp.yaml").exists()
    saved = yaml.safe_load((out / "opt.yaml").read_text())
    assert saved["epochs"] == 2 and saved["imgsz"] == 128
    assert yaml.safe_load((out / "hyp.yaml").read_text())["lr0"] > 0


def test_find_interrupted_and_resume(run_dir):
    out, cfg_path, data_yaml, tmp = run_dir
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import resume_all

    # finished run: last.npz is STRIPPED at train end (reference
    # train.py:553-557), so it never reads as interrupted
    from dmayolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    trees, meta = load_checkpoint(out / "last.npz")
    assert "opt_mom" not in trees, "finished last.npz must be stripped"
    assert list(resume_all.find_interrupted(tmp / "runs")) == []

    # construct a genuinely interrupted run: optimizer state present and
    # epoch short of the opt.yaml target (as if the process was killed)
    out2 = tmp / "runs" / "r2"
    out2.mkdir(parents=True, exist_ok=True)
    import numpy as np

    save_checkpoint(
        out2 / "last", params=trees["params"], stats=trees["stats"],
        ema_params=trees["params"], ema_stats=trees["stats"],
        opt_mom={k: np.zeros_like(np.asarray(v, np.float32))
                 for k, v in trees["params"].items()},
        opt_vel={k: np.zeros_like(np.asarray(v, np.float32))
                 for k, v in trees["params"].items()},
        meta={"epoch": 0, "step": 1, "updates": 1, "best_fitness": 0.0,
              "nc": 4, "cfg": meta.get("cfg", CFG)},
    )
    opt = yaml.safe_load((out / "opt.yaml").read_text())
    opt["epochs"] = 2
    (out2 / "opt.yaml").write_text(yaml.safe_dump(opt))
    (out2 / "hyp.yaml").write_text((out / "hyp.yaml").read_text())
    found = list(resume_all.find_interrupted(tmp / "runs"))
    assert len(found) == 1 and found[0][0] == out2 / "last.npz"

    # bare --resume <ckpt> restores EVERY saved option — including cfg/data,
    # which argparse must not demand on resume (ref train.py:657-669)
    from dmayolo_tpu.cli.train import main

    main(["--resume", str(out2 / "last.npz"),
          # wrong values on purpose: opt.yaml must win
          "--epochs", "99", "--imgsz", "64"])
    trees2, meta2 = load_checkpoint(out2 / "last.npz")
    assert meta2["epoch"] == 1  # finished the target's second epoch
    # completed -> stripped -> no longer interrupted
    assert list(resume_all.find_interrupted(tmp / "runs")) == []


def test_resume_auto_finds_latest(run_dir, capsys):
    out, _, _, tmp = run_dir
    from dmayolo_tpu.cli.train import get_latest_run

    # most-recent last.npz in the tree (r2 may exist from the resume test)
    found = get_latest_run(str(tmp / "runs"))
    expected = max((tmp / "runs").rglob("last.npz"),
                   key=lambda p: p.stat().st_mtime)
    assert found == expected and found.name == "last.npz"
