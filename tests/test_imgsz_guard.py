"""check_img_size guard (ref general.py:290-296).

Regression: the reference VisDrone TTA recipe passes --img 1996, which is
not a multiple of 32 — static-shape XLA desyncs the pyramid concats unless
the size is rounded up (the reference rounds silently). Exercised through
the real val CLI with --augment.
"""
import yaml

import pytest

from dmayolo_tpu.cli.common import check_img_size

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


def test_check_img_size_values(capsys):
    assert check_img_size(1996, 32) == 2016  # the val.sh recipe size
    assert "WARNING" in capsys.readouterr().out
    assert check_img_size(640, 32) == 640
    assert check_img_size(100, 32, floor=64) == 128
    assert check_img_size(1, 32, floor=64) == 64


def test_val_cli_tta_rounds_odd_imgsz(tmp_path):
    import jax

    from dmayolo_tpu.cli.val import main
    from dmayolo_tpu.data.synthetic import generate
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.utils.checkpoint import save_checkpoint

    data_yaml = generate(str(tmp_path / "d"), n_train=4, n_val=4, img_size=160)
    model = DetectionModel(CFG)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    ck = tmp_path / "m.npz"
    save_checkpoint(ck, params=params, stats=stats,
                    meta={"cfg": CFG, "nc": 4})
    # 250 is not a multiple of 32 -> must round to 256 and run TTA cleanly
    main(["--weights", str(ck), "--data", str(data_yaml), "--imgsz", "250",
          "--batch-size", "4", "--augment", "--fp32",
          "--project", str(tmp_path / "runs"), "--name", "v", "--exist-ok"])
