"""Reference train.py flag-surface parity: --freeze/--nosave/--noval/
--save-period/--quad/--rect/--label-smoothing (ref train.py:581-640)."""
import numpy as np
import pytest
import yaml

import jax

from dmayolo_tpu.train.trainer import Trainer

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

HYP = {
    "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 0.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
    "iou_t": 0.2, "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
    "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "degrees": 0.0,
    "translate": 0.0, "scale": 0.0, "shear": 0.0, "perspective": 0.0,
    "flipud": 0.0, "fliplr": 0.0, "mosaic": 0.0, "mixup": 0.0,
    "copy_paste": 0.0,
}


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    from dmayolo_tpu.data.synthetic import generate

    tmp = tmp_path_factory.mktemp("flags")
    return generate(str(tmp / "d"), n_train=8, n_val=4, img_size=128)


def test_freeze_keeps_frozen_layers_fixed(tmp_path, data_yaml):
    tr = Trainer(CFG, data_yaml, dict(HYP), epochs=2, batch_size=8,
                 img_size=128, workers=1, out_dir=str(tmp_path / "r"),
                 dtype=jax.numpy.float32, freeze=3, noval=True,
                 autoanchor=False, accumulate=1, patience=100)
    before = {k: np.asarray(v).copy() for k, v in tr.state.params.items()}
    tr.train()
    after = {k: np.asarray(v) for k, v in tr.state.params.items()}
    changed_frozen = changed_live = 0
    for k in before:
        is_frozen = k[0] == "model" and k[1].isdigit() and int(k[1]) < 3
        diff = float(np.abs(after[k] - before[k]).max())
        if is_frozen:
            assert diff == 0.0, (k, diff)
            changed_frozen += 1
        elif diff > 0:
            changed_live += 1
    assert changed_frozen > 0 and changed_live > 0


def test_nosave_noval_save_period(tmp_path, data_yaml):
    out = tmp_path / "r2"
    tr = Trainer(CFG, data_yaml, dict(HYP), epochs=3, batch_size=8,
                 img_size=128, workers=1, out_dir=str(out),
                 dtype=jax.numpy.float32, nosave=True, noval=True,
                 save_period=2, autoanchor=False, accumulate=1, patience=100)
    tr.train()
    # nosave: no best.npz (val only ran on the final epoch, and best saves
    # are suppressed); last.npz exists only from the final epoch
    assert not (out / "best.npz").exists()
    assert (out / "last.npz").exists()
    assert (out / "epoch1.npz").exists()      # save-period=2 -> epochs 1
    assert not (out / "epoch0.npz").exists()


def test_quad_and_rect_loaders(data_yaml):
    from dmayolo_tpu.data.datasets import DetectionDataset, check_dataset
    from dmayolo_tpu.data.loader import DataLoader

    data = check_dataset(data_yaml)
    ds = DetectionDataset(data["train"], img_size=128, augment=True,
                          hyp=dict(HYP), nc=4, batch_size=8)
    quad = next(iter(DataLoader(ds, 8, workers=1, quad=True)))
    assert quad.images.shape[0] == 2          # 8 samples -> 2 quad images
    assert quad.images.shape[1] == 256        # at 2x resolution

    ds_r = DetectionDataset(data["train"], img_size=128, augment=True,
                            hyp=dict(HYP), nc=4, batch_size=8, rect=True)
    assert not ds_r.mosaic                    # rect disables mosaic (ref)
    plain = next(iter(DataLoader(ds_r, 8, workers=1, shuffle=False)))
    assert plain.images.shape[0] == 8


def test_rect_disables_accumulation_grouping(tmp_path, data_yaml):
    # regression: rect buckets letterbox batches to per-batch shapes, so
    # accumulation groups (np.concatenate across loader batches) crashed on
    # mixed shapes mid-epoch; the Trainer must step every batch under rect
    t = Trainer(dict(CFG), data_yaml, dict(HYP), epochs=1, batch_size=8,
                img_size=128, out_dir=str(tmp_path / "r"), workers=0,
                autoanchor=False, patience=100, rect=True)
    assert t.accumulate == 1
    # weight decay scaled for the per-batch cadence, not round(64/8)=8
    assert t.weight_decay == pytest.approx(HYP["weight_decay"] * 8 * 1 / 64)


def test_placeholder_int_anchors_require_autoanchor(tmp_path, data_yaml):
    # configs with `anchors: <int>` (e.g. yolov5l-xs-tph) carry [0,1,2,..]
    # placeholder anchors (ref yolo.py:365); training them with autoanchor
    # disabled NaN'd on the first step (zero-width anchor -> 0/0 in SIoU).
    # The Trainer must now refuse loudly instead.
    cfg = dict(CFG)
    cfg["anchors"] = 3
    with pytest.raises(ValueError, match="placeholder"):
        Trainer(cfg, data_yaml, dict(HYP), epochs=1, batch_size=8,
                img_size=128, out_dir=str(tmp_path / "pa"), workers=0,
                autoanchor=False, patience=100)


def test_autoanchor_replaces_placeholder_int_anchors(tmp_path, data_yaml):
    # `anchors: 3` placeholders include a zero anchor; autoanchor must
    # recompute regardless of the (bogus) BPR and write real anchors back
    import numpy as np

    cfg = dict(CFG)
    cfg["anchors"] = 3
    t = Trainer(cfg, data_yaml, dict(HYP), epochs=1, batch_size=8,
                img_size=128, out_dir=str(tmp_path / "aa"), workers=0,
                autoanchor=True, patience=100)
    a = np.asarray(t.model.head.anchors)
    assert float(a.min()) > 0, a
