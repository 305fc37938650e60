"""End-to-end hyperparameter evolution smoke (round-3 verdict item 6).

Drives `cli/train.py --evolve 2` on the synthetic shapes set: proves the
GA loop (train/evolve.py mutate/log_generation), evolve.csv accumulation,
hyp_evolve.yaml persistence, and the plot_evolve visualization — the
reference's train.py:714-820 + utils/plots.py:371 surface.
"""
import csv

import pytest
import yaml

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
def evolve_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("evolve")
    from dmayolo_tpu.data.synthetic import generate

    data_yaml = generate(str(tmp / "data"), n_train=8, n_val=4, img_size=128)
    cfg_path = tmp / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(CFG))

    from dmayolo_tpu.cli.train import main

    main([
        "--cfg", str(cfg_path), "--data", str(data_yaml), "--epochs", "1",
        "--batch-size", "8", "--imgsz", "128", "--project",
        str(tmp / "runs"), "--name", "ev", "--exist-ok", "--workers", "1",
        "--noautoanchor", "--fp32", "--evolve", "2",
    ])
    return tmp / "runs" / "ev"


def test_evolve_csv_two_generations(evolve_run):
    csv_path = evolve_run / "evolve.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "fitness"
    assert len(rows) == 3  # header + 2 generations
    for r in rows[1:]:
        float(r[0])  # fitness parses


def test_hyp_evolve_yaml(evolve_run):
    hy = evolve_run / "hyp_evolve.yaml"
    assert hy.exists()
    best = yaml.safe_load(hy.read_text())
    assert "lr0" in best and best["lr0"] > 0


def test_plot_evolve_png(evolve_run):
    png = evolve_run / "evolve.png"
    assert png.exists() and png.stat().st_size > 1000


def test_plot_evolve_function(tmp_path):
    """plot_evolve also works standalone on any evolve.csv."""
    from dmayolo_tpu.utils.plots import plot_evolve

    p = tmp_path / "evolve.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fitness", "lr0", "momentum", "box"])
        for i in range(5):
            w.writerow([0.1 * i, 0.01 * (1 + i), 0.9, 0.05])
    out = plot_evolve(p)
    assert out.exists() and out.suffix == ".png"
