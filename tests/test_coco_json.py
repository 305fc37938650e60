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
                                        evaluate_coco, is_coco_data,
                                        write_coco_json)
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
