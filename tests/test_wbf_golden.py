"""WBF golden fixtures + end-to-end CLI test.

The `ensemble_boxes` package the reference shells out to (ref wbf.py:67,
weighted_boxes_fusion @ iou_thr 0.67, skip_box_thr 0.01) is not installed
in this env, so the goldens below are hand-derived worked examples of the
published algorithm (Solovyev et al., 2021) covering the semantics the
package documents: per-model weights, 'avg'/'max' confidence, the support
rescale min(T, W)/W and its allows_overflow variant, the skip_box_thr
boundary (score == thr is kept), and the prefilter (clip to [0,1], swap
inverted coords, drop zero-area boxes).

The e2e test drives the real wbf CLI over two prediction dirs in the
val --save-txt --save-conf format and asserts the fused set scores at
least as high as either input on the synthetic GT (the whole point of
WBF ensembling).
"""
import numpy as np
import pytest

from dmayolo_tpu.core.wbf import weighted_boxes_fusion


class TestGoldens:
    def test_weighted_two_model_fusion_avg(self):
        """Worked example: model weights (2, 1), one overlapping pair.

        rows: a=(0.1,0.1,0.5,0.5) s=0.9 w=2 -> weighted 1.8
              b=(0.12,0.12,0.52,0.52) s=0.6 w=1 -> weighted 0.6
        IoU(a,b) = 0.1444/0.1756 = 0.822 > 0.55 -> one cluster.
        fused box = (1.8a + 0.6b)/2.4 = 0.75a + 0.25b
        avg conf = (1.8+0.6)/2 * min(2, 3)/3 = 1.2 * 2/3 = 0.8
        """
        a = np.array([[0.1, 0.1, 0.5, 0.5]])
        b = np.array([[0.12, 0.12, 0.52, 0.52]])
        fb, fs, fl = weighted_boxes_fusion(
            [a, b], [np.array([0.9]), np.array([0.6])],
            [np.zeros(1), np.zeros(1)], weights=[2.0, 1.0], iou_thr=0.55,
        )
        assert len(fb) == 1
        np.testing.assert_allclose(fb[0], 0.75 * a[0] + 0.25 * b[0], atol=1e-12)
        assert fs[0] == pytest.approx(0.8)
        assert fl[0] == 0

    def test_weighted_two_model_fusion_max(self):
        """Same cluster, conf_type='max': max(1.8, 0.6) * 2/3 = 1.2 —
        scores may exceed 1 with model weights > 1 (package behaviour)."""
        a = np.array([[0.1, 0.1, 0.5, 0.5]])
        b = np.array([[0.12, 0.12, 0.52, 0.52]])
        _, fs, _ = weighted_boxes_fusion(
            [a, b], [np.array([0.9]), np.array([0.6])],
            [np.zeros(1), np.zeros(1)], weights=[2.0, 1.0], iou_thr=0.55,
            conf_type="max",
        )
        assert fs[0] == pytest.approx(1.2)

    def test_skip_box_thr_keeps_equal_score(self):
        """score == skip_box_thr is KEPT (package prefilter: score < thr
        skips); just below is dropped."""
        boxes = np.array([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.7, 0.7]])
        scores = np.array([0.5, 0.5 - 1e-9])
        fb, fs, _ = weighted_boxes_fusion(
            [boxes], [scores], [np.zeros(2)], skip_box_thr=0.5,
        )
        assert len(fb) == 1
        np.testing.assert_allclose(fb[0], boxes[0], atol=1e-12)
        # single model of weight 1 => W=1, support min(1,1)/1 = 1
        assert fs[0] == pytest.approx(0.5)

    def test_allows_overflow(self):
        """weights (0.5, 0.5), full 2-box cluster: W=1, T=2.
        avg conf = (0.4+0.3)/2 = 0.35; no-overflow support min(2,1)/1 = 1
        -> 0.35; overflow support 2/1 = 2 -> 0.7."""
        box = np.array([[0.1, 0.1, 0.3, 0.3]])
        args = ([box, box], [np.array([0.8]), np.array([0.6])],
                [np.zeros(1), np.zeros(1)])
        _, fs, _ = weighted_boxes_fusion(*args, weights=[0.5, 0.5])
        assert fs[0] == pytest.approx(0.35)
        _, fs, _ = weighted_boxes_fusion(*args, weights=[0.5, 0.5],
                                         allows_overflow=True)
        assert fs[0] == pytest.approx(0.7)

    def test_prefilter_swap_clip_zero_area(self):
        boxes = np.array([
            [0.5, 0.1, 0.3, 0.3],   # x1 > x2: swapped -> (0.3,0.1,0.5,0.3)
            [0.9, 0.9, 1.2, 1.2],   # clipped -> (0.9,0.9,1.0,1.0)
            [0.2, 0.2, 0.2, 0.5],   # zero width -> dropped
        ])
        fb, fs, fl = weighted_boxes_fusion(
            [boxes], [np.array([0.9, 0.8, 0.7])], [np.arange(3.0)],
        )
        assert len(fb) == 2
        np.testing.assert_allclose(fb[0], [0.3, 0.1, 0.5, 0.3], atol=1e-12)
        np.testing.assert_allclose(fb[1], [0.9, 0.9, 1.0, 1.0], atol=1e-12)

    def test_no_cross_label_fusion(self):
        box = np.array([[0.1, 0.1, 0.3, 0.3]])
        fb, _, fl = weighted_boxes_fusion(
            [box, box], [np.array([0.9]), np.array([0.8])],
            [np.zeros(1), np.ones(1)],
        )
        assert len(fb) == 2
        assert sorted(fl.tolist()) == [0.0, 1.0]

    def test_cluster_matches_running_fused_box(self):
        """Clustering compares each new box against the running FUSED box,
        not the cluster seed: c is within iou_thr of fused(a,b) but not of
        a alone."""
        a = np.array([[0.10, 0.10, 0.50, 0.50]])
        b = np.array([[0.20, 0.10, 0.60, 0.50]])   # IoU(a,b)=0.6 > 0.55
        # fused(a,b) with equal weighted scores = (0.15,0.10,0.55,0.50)
        c = np.array([[0.24, 0.10, 0.64, 0.50]])
        # IoU(c, a) = 0.26/0.4/(0.32/0.4... -> (0.5-0.24)*0.4 inter 0.104,
        # union 0.216 -> 0.481 < 0.55;  IoU(c, fused) = 0.124/0.196 = 0.633
        _, fs, _ = weighted_boxes_fusion(
            [a, b, c],
            [np.array([0.9]), np.array([0.9]), np.array([0.8])],
            [np.zeros(1)] * 3, iou_thr=0.55,
        )
        assert len(fs) == 1  # all three end in one cluster


def _write_preds(dirpath, preds):
    """preds: {stem: list of (cls, cx, cy, w, h, conf)} in val txt format."""
    dirpath.mkdir(parents=True, exist_ok=True)
    for stem, rows in preds.items():
        lines = [
            f"{int(c)} {cx:.6g} {cy:.6g} {w:.6g} {h:.6g} {conf:.6g}"
            for c, cx, cy, w, h, conf in rows
        ]
        (dirpath / f"{stem}.txt").write_text("\n".join(lines) + "\n")


def _map50(pred_dir, gt, one_indexed=False):
    """mAP@.5 of a label dir against GT dict {stem: (M,5) cls,xyxy}."""
    from dmayolo_tpu.eval.metrics import ap_per_class, process_batch

    iouv = np.linspace(0.5, 0.95, 10)
    tps, confs, pcls, tcls = [], [], [], []
    for stem, labels in gt.items():
        path = pred_dir / f"{stem}.txt"
        rows = (np.array([ln.split() for ln in path.read_text().split("\n") if ln],
                         np.float64) if path.exists() else np.zeros((0, 6)))
        if rows.size == 0:
            dets = np.zeros((0, 6))
        else:
            cls = rows[:, 0] - (1 if one_indexed else 0)
            cx, cy, w, h = rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4]
            dets = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                             rows[:, 5], cls], 1)
            dets = dets[dets[:, 4].argsort()[::-1]]
        tps.append(process_batch(dets, labels, iouv))
        confs.append(dets[:, 4])
        pcls.append(dets[:, 5])
        tcls.append(labels[:, 0])
    _, _, ap, _, _ = ap_per_class(
        np.concatenate(tps), np.concatenate(confs),
        np.concatenate(pcls), np.concatenate(tcls))
    return float(ap[:, 0].mean())


def test_wbf_cli_end_to_end_improves_map(tmp_path):
    """Two noisy 'val runs' -> real wbf CLI -> fused mAP >= max(single).

    Model A and B jitter the GT in OPPOSITE directions (fusion averages the
    error away) and each misses a different subset (fusion recovers union
    recall); both emit low-conf false positives that fusion cannot promote.
    """
    from dmayolo_tpu.cli.wbf import main as wbf_main

    rng = np.random.default_rng(11)
    gt = {}
    preds_a, preds_b = {}, {}
    for i in range(8):
        stem = f"{i:05d}"
        labels = []
        rows_a, rows_b = [], []
        for j in range(4):
            c = int(rng.integers(0, 3))
            cx, cy = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.1, 0.2, 2)
            labels.append([c, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
            d = 0.018  # opposite-sign centre jitter, cancels on average
            if not (j == 0):      # A misses the first GT box
                rows_a.append((c, cx + d, cy + d, w, h, 0.85))
            if not (j == 1):      # B misses the second
                rows_b.append((c, cx - d, cy - d, w, h, 0.80))
        # false positives, below the fused true-box confidences
        fx, fy = rng.uniform(0.05, 0.1, 2)
        rows_a.append((0, fx, fy, 0.05, 0.05, 0.30))
        rows_b.append((1, 1 - fx, 1 - fy, 0.05, 0.05, 0.30))
        gt[stem] = np.array(labels)
        preds_a[stem], preds_b[stem] = rows_a, rows_b

    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    _write_preds(dir_a, preds_a)
    _write_preds(dir_b, preds_b)
    out = tmp_path / "fused"
    wbf_main([str(dir_a), str(dir_b), "--out", str(out),
              "--iou-thr", "0.55", "--skip-box-thr", "0.01"])

    map_a = _map50(dir_a, gt)
    map_b = _map50(dir_b, gt)
    map_f = _map50(out, gt, one_indexed=True)  # ref-parity 1-indexed output
    assert map_f >= max(map_a, map_b), (map_f, map_a, map_b)
    assert map_f > 0.5, map_f


def test_weights_length_mismatch_resets_to_ones():
    """Package behavior: len(weights) != n_models warns and falls back to
    uniform weights (neither silently deflates scores nor IndexErrors)."""
    b = [np.array([[0.1, 0.1, 0.5, 0.5]]), np.array([[0.1, 0.1, 0.5, 0.5]])]
    s = [np.array([0.8]), np.array([0.6])]
    l = [np.array([0.0]), np.array([0.0])]
    ref_boxes, ref_scores, _ = weighted_boxes_fusion(b, s, l, iou_thr=0.5)
    for bad in ([2.0, 1.0, 3.0], [2.0]):
        with pytest.warns(UserWarning, match="weights"):
            bb, ss, _ = weighted_boxes_fusion(b, s, l, weights=bad, iou_thr=0.5)
        np.testing.assert_allclose(ss, ref_scores)
        np.testing.assert_allclose(bb, ref_boxes)
