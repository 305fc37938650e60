"""COCO-JSON prediction writer parity vs the reference (val.py:50-60).

VERDICT r1 item 4: identical detections through our append_coco_json and the
reference's save_one_json must produce identical entries (image_id typing,
xyxy->top-left-xywh, rounding, class_map indirection).
"""
import json
from pathlib import Path

import numpy as np
import pytest

from dmayolo_tpu.eval.coco_json import (append_coco_json, coco80_to_coco91_class,
                                        evaluate_coco, image_id_map,
                                        is_coco_data, write_coco_json)
from tests.ref_compat import setup_reference_imports

DETS = np.array([
    [258.15, 41.29, 606.41, 285.07, 0.236184, 17.0],
    [10.0, 20.0, 30.5, 55.25, 0.987654, 0.0],
    [0.0, 0.0, 640.0, 640.0, 0.00012, 79.0],
], np.float32)


def _ref_entries(stem, class_map):
    assert setup_reference_imports()
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location("ref_val", "/root/reference/val.py")
    ref_val = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_val)
    jdict = []
    ref_val.save_one_json(torch.from_numpy(DETS), jdict, Path(f"{stem}.jpg"), class_map)
    return jdict


@pytest.mark.parametrize("stem,cmap", [
    ("000000042", coco80_to_coco91_class()),   # numeric stem -> int image_id + 91-class map
    ("frame_0001", list(range(1000))),          # string stem passthrough
])
def test_json_entries_match_reference(stem, cmap):
    ours = []
    append_coco_json(ours, DETS, stem, cmap)
    theirs = _ref_entries(stem, cmap)
    assert len(ours) == len(theirs) == len(DETS)
    for a, b in zip(ours, theirs):
        assert a["image_id"] == b["image_id"]
        assert a["category_id"] == b["category_id"]
        assert a["score"] == pytest.approx(b["score"], abs=1e-9)
        assert a["bbox"] == pytest.approx(b["bbox"], abs=2e-3)  # ref rounds f32, ours f64


def test_write_and_graceful_eval(tmp_path):
    jdict = []
    append_coco_json(jdict, DETS, "7", list(range(1000)))
    p = write_coco_json(jdict, tmp_path / "preds.json")
    loaded = json.loads(p.read_text())
    assert loaded[0]["image_id"] == 7 and len(loaded) == 3
    # pycocotools absent in this env -> None + saved-file message, no raise
    assert evaluate_coco(p, tmp_path / "missing_annotations.json") is None


def test_is_coco_heuristic():
    assert is_coco_data({"val": "datasets/coco/val2017.txt"})
    assert not is_coco_data({"val": "datasets/VisDrone/images"})
    assert not is_coco_data({})


def test_image_id_map_unique_stems_keep_reference_convention():
    from dmayolo_tpu.eval.coco_json import image_id_map

    m = image_id_map(["/d/a/000001.jpg", "/d/a/img.jpg"])
    assert m["/d/a/000001.jpg"] == 1        # int-when-numeric (ref val.py:52)
    assert m["/d/a/img.jpg"] == "img"


def test_image_id_map_sequence_frames_do_not_collide():
    # UAVDT/VisDrone-sequence layout: every sequence dir repeats img00001...
    from dmayolo_tpu.eval.coco_json import image_id_map

    files = ["/d/seq1/img00001.jpg", "/d/seq1/img00002.jpg",
             "/d/seq2/img00001.jpg", "/d/seq2/img00002.jpg"]
    m = image_id_map(files)
    assert len(set(m.values())) == 4
    assert m["/d/seq1/img00001.jpg"] != m["/d/seq2/img00001.jpg"]


def test_gt_builder_and_writer_agree_on_colliding_stems(tmp_path):
    # end-to-end: two sequences with identical frame names; the GT builder
    # and append_coco_json must use the SAME unique ids
    import cv2
    import numpy as np

    from dmayolo_tpu.eval.coco_json import (build_coco_gt_from_yolo,
                                            image_id_map)

    for seq in ("seq1", "seq2"):
        (tmp_path / "images" / seq).mkdir(parents=True)
        (tmp_path / "labels" / seq).mkdir(parents=True)
        img = np.full((64, 64, 3), 128, np.uint8)
        cv2.imwrite(str(tmp_path / "images" / seq / "img00001.jpg"), img)
        (tmp_path / "labels" / seq / "img00001.txt").write_text(
            "0 0.5 0.5 0.25 0.25\n")
    gt = build_coco_gt_from_yolo(str(tmp_path / "images"), nc=1)
    gt_ids = {im["id"] for im in gt["images"]}
    assert len(gt_ids) == 2

    from dmayolo_tpu.data.datasets import DetectionDataset

    ds = DetectionDataset(str(tmp_path / "images"), img_size=64, augment=False)
    ids = image_id_map(ds.im_files)
    assert set(ids.values()) == gt_ids


def test_image_id_map_numeric_stem_collisions_stay_distinct():
    # '7' and '007' are distinct stems but identical ints — int conversion
    # must be abandoned, not allowed to merge two images' detections
    m = image_id_map(["/d/7.jpg", "/d2/007.jpg"])
    assert len(set(map(str, m.values()))) == 2


def test_image_id_map_unicode_numeric_stem():
    # isnumeric() accepts '²' but int('²') raises — must stay a string id
    m = image_id_map(["/d/x².jpg", "/d/y.jpg"])
    assert m["/d/x².jpg"] == "x²"


def test_gt_builder_single_cls(tmp_path):
    # --single-cls: every GT category must be 0 to match the zeroed preds
    d = tmp_path / "ds"
    (d / "images").mkdir(parents=True)
    (d / "labels").mkdir()
    import cv2
    import numpy as np
    for i, cls in enumerate([0, 1, 2]):
        cv2.imwrite(str(d / "images" / f"im{i}.jpg"),
                    np.zeros((40, 40, 3), np.uint8))
        (d / "labels" / f"im{i}.txt").write_text(f"{cls} 0.5 0.5 0.4 0.4\n")
    from dmayolo_tpu.eval.coco_json import build_coco_gt_from_yolo
    gt = build_coco_gt_from_yolo(str(d / "images"), nc=3, single_cls=True)
    assert {a["category_id"] for a in gt["annotations"]} == {0}
    assert [c["id"] for c in gt["categories"]] == [0]
