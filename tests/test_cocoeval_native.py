"""Native COCOeval tests — hand-computable protocol cases.

pycocotools is not installed in this environment (which is exactly why the
native evaluator exists), so correctness is asserted on constructed cases
whose AP/AR values follow directly from the protocol definition.
"""
import json

import numpy as np
import pytest

from dmayolo_tpu.eval.cocoeval import NpCOCOeval, evaluate_coco_native


def _gt(images, anns):
    return {
        "images": [{"id": i} for i in images],
        "annotations": [
            {"id": j + 1, "image_id": im, "category_id": c,
             "bbox": list(map(float, b)), "area": float(b[2] * b[3]),
             "iscrowd": 0}
            for j, (im, c, b) in enumerate(anns)
        ],
        "categories": [{"id": c} for c in sorted({c for _, c, _ in anns})],
    }


def _dt(entries):
    return [
        {"image_id": im, "category_id": c, "bbox": list(map(float, b)),
         "score": float(s)}
        for im, c, b, s in entries
    ]


def test_perfect_predictions():
    boxes = [(10, 10, 40, 40), (100, 100, 50, 30)]  # medium-area boxes
    gt = _gt([1], [(1, 1, b) for b in boxes])
    dt = _dt([(1, 1, b, 0.9 - 0.1 * i) for i, b in enumerate(boxes)])
    ev = NpCOCOeval(gt, dt).evaluate()
    st = ev.summarize(verbose=False)
    assert st[0] == pytest.approx(1.0)   # AP
    assert st[1] == pytest.approx(1.0)   # AP50
    assert st[2] == pytest.approx(1.0)   # AP75
    assert st[4] == pytest.approx(1.0)   # AP medium
    assert st[3] == -1.0 and st[5] == -1.0  # no small/large gts
    assert st[8] == pytest.approx(1.0)   # AR@100
    assert st[6] == pytest.approx(0.5)   # AR@1: only 1 det allowed, 2 gts


def test_half_recall_and_precision():
    # 2 gts, detector finds one exactly plus one false positive with LOWER
    # score: PR curve = [1.0 @ r=0.5, 0.5 @ r=0.5] -> AP = 101-pt mean
    gt = _gt([1], [(1, 1, (10, 10, 40, 40)), (1, 1, (200, 200, 40, 40))])
    dt = _dt([
        (1, 1, (10, 10, 40, 40), 0.9),
        (1, 1, (500, 120, 40, 40), 0.5),  # no overlap with any gt
    ])
    st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
    # interpolated precision: 1.0 for r <= 0.5 (51 points), 0 beyond
    assert st[1] == pytest.approx(51 / 101, abs=1e-6)
    assert st[8] == pytest.approx(0.5)


def test_iou_threshold_sweep():
    # det overlaps gt with IoU = 0.6: counts at thresholds .50/.55/.60 only
    gt = _gt([1], [(1, 1, (0, 0, 100, 100))])
    # shift so inter = 75*100... build IoU 0.6: inter/union = 0.6
    # boxes (0,0,100,100) and (25,0,100,100): inter 75*100, union 125*100 -> 0.6
    dt = _dt([(1, 1, (25, 0, 100, 100), 0.9)])
    st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
    assert st[1] == pytest.approx(1.0)          # AP50
    assert st[2] == pytest.approx(0.0)          # AP75
    assert st[0] == pytest.approx(3 / 10, abs=1e-6)  # thr .50,.55,.60 of 10


def test_score_order_matching_and_fp_before_tp():
    # false positive with HIGHER score than the true positive:
    # running precision at the tp is 1/2, so AP50 = mean(0.5 over r<=1.0)
    gt = _gt([1], [(1, 1, (10, 10, 40, 40))])
    dt = _dt([
        (1, 1, (300, 300, 40, 40), 0.95),
        (1, 1, (10, 10, 40, 40), 0.5),
    ])
    st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
    assert st[1] == pytest.approx(0.5, abs=1e-6)


def test_crowd_gt_ignored_not_penalised():
    gt = _gt([1], [(1, 1, (10, 10, 40, 40))])
    gt["annotations"].append({
        "id": 99, "image_id": 1, "category_id": 1,
        "bbox": [200.0, 200.0, 60.0, 60.0], "area": 3600.0, "iscrowd": 1,
    })
    # det on the crowd region: matches the crowd gt -> ignored (not a FP)
    dt = _dt([
        (1, 1, (10, 10, 40, 40), 0.9),
        (1, 1, (200, 200, 60, 60), 0.8),
    ])
    st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
    assert st[1] == pytest.approx(1.0)


def test_area_ranges():
    # one small (16x16=256 < 1024) + one large (200x200) gt, both found
    gt = _gt([1, 2], [(1, 1, (5, 5, 16, 16)), (2, 1, (0, 0, 200, 200))])
    dt = _dt([(1, 1, (5, 5, 16, 16), 0.9), (2, 1, (0, 0, 200, 200), 0.8)])
    st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
    assert st[3] == pytest.approx(1.0)  # AP small
    assert st[5] == pytest.approx(1.0)  # AP large
    assert st[4] == -1.0                # no medium gts


def test_multi_class_mean():
    # class 1 perfect, class 2 completely missed -> mAP = 0.5
    gt = _gt([1], [(1, 1, (10, 10, 40, 40)), (1, 2, (100, 100, 40, 40))])
    dt = _dt([(1, 1, (10, 10, 40, 40), 0.9)])
    st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
    assert st[1] == pytest.approx(0.5)


def test_maxdets_limit():
    # 3 gts, 3 exact dets but AR@1 only counts the best det
    boxes = [(10, 10, 40, 40), (100, 10, 40, 40), (10, 100, 40, 40)]
    gt = _gt([1], [(1, 1, b) for b in boxes])
    dt = _dt([(1, 1, b, 0.9 - 0.1 * i) for i, b in enumerate(boxes)])
    st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
    assert st[6] == pytest.approx(1 / 3, abs=1e-6)   # AR@1
    assert st[8] == pytest.approx(1.0)               # AR@100


def test_json_roundtrip(tmp_path):
    gt = _gt([1], [(1, 1, (10, 10, 40, 40))])
    dt = _dt([(1, 1, (10, 10, 40, 40), 0.9)])
    gt_p, dt_p = tmp_path / "gt.json", tmp_path / "dt.json"
    gt_p.write_text(json.dumps(gt))
    dt_p.write_text(json.dumps(dt))
    out = evaluate_coco_native(dt_p, gt_p)
    assert out is not None
    m, m50 = out
    assert m == pytest.approx(1.0) and m50 == pytest.approx(1.0)


def test_fallback_wiring(tmp_path, capsys):
    """evaluate_coco (the val.py hook) must route to the native evaluator
    when pycocotools is missing (it is, in this env)."""
    from dmayolo_tpu.eval.coco_json import evaluate_coco

    gt = _gt([1], [(1, 1, (10, 10, 40, 40))])
    dt = _dt([(1, 1, (10, 10, 40, 40), 0.9)])
    gt_p, dt_p = tmp_path / "gt.json", tmp_path / "dt.json"
    gt_p.write_text(json.dumps(gt))
    dt_p.write_text(json.dumps(dt))
    out = evaluate_coco(dt_p, gt_p)
    captured = capsys.readouterr().out
    if out is None:  # pycocotools present and failed — not this env
        pytest.skip("pycocotools importable; fallback not exercised")
    assert out[0] == pytest.approx(1.0)
    assert "native" in captured or "Average Precision" in captured


def test_gt_without_annotation_ids_or_zero_based():
    # third-party GT jsons may lack annotation ids or use 0-based ids;
    # 0 means "unmatched" in the dtm/gtm bookkeeping so both cases must be
    # internally reassigned, not scored as false positives
    boxes = [(10, 10, 40, 40), (100, 100, 50, 30)]
    for ids in (None, [0, 1]):
        gt = _gt([1], [(1, 1, b) for b in boxes])
        for j, a in enumerate(gt["annotations"]):
            if ids is None:
                del a["id"]
            else:
                a["id"] = ids[j]
        dt = _dt([(1, 1, b, 0.9 - 0.1 * i) for i, b in enumerate(boxes)])
        st = NpCOCOeval(gt, dt).evaluate().summarize(verbose=False)
        assert st[0] == pytest.approx(1.0), f"ids={ids}"
