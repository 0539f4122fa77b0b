"""Hand-computed golden values for the VOC AP implementation."""

import numpy as np

from yolojax.eval.voc_map import compute_map, voc_ap


def box(x0, y0, x1, y1):
    return np.asarray([y0, x0, y1, x1], np.float64)


def test_perfect_detection_ap_1():
    gt = [(0, 0, box(0, 0, 10, 10)), (1, 0, box(5, 5, 20, 20))]
    dets = [(0, 0, 0.9, box(0, 0, 10, 10)), (1, 0, 0.8, box(5, 5, 20, 20))]
    m = compute_map(dets, gt, num_classes=1)
    assert np.isclose(m["map"], 1.0)


def test_completely_wrong_detection_ap_0():
    gt = [(0, 0, box(0, 0, 10, 10))]
    dets = [(0, 0, 0.9, box(50, 50, 60, 60))]
    m = compute_map(dets, gt, num_classes=1)
    assert m["map"] == 0.0


def test_duplicate_detections_count_as_fp():
    # two detections on one GT: first (higher score) TP, second FP
    gt = [(0, 0, box(0, 0, 10, 10))]
    dets = [
        (0, 0, 0.9, box(0, 0, 10, 10)),
        (0, 0, 0.8, box(0.5, 0.5, 10, 10)),
    ]
    m = compute_map(dets, gt, num_classes=1, eleven_point=False)
    # recall reaches 1.0 at precision 1.0 (first det), then precision drops;
    # continuous AP = 1.0 (envelope at full recall already achieved)
    assert np.isclose(m["map"], 1.0)
    # 11-point also 1.0 since max precision at all recall levels >= t is 1.0
    m11 = compute_map(dets, gt, num_classes=1, eleven_point=True)
    assert abs(m11["map"] - 1.0) < 1e-9


def test_half_recall_eleven_point():
    # 2 GTs, only one detected (perfectly): recall 0.5 at precision 1.
    gt = [(0, 0, box(0, 0, 10, 10)), (1, 0, box(0, 0, 10, 10))]
    dets = [(0, 0, 0.9, box(0, 0, 10, 10))]
    m = compute_map(dets, gt, num_classes=1, eleven_point=True)
    # 11-point: precision 1 for t in {0,...,0.5} (6 points), 0 above
    np.testing.assert_allclose(m["map"], 6 / 11, rtol=1e-9)
    m_cont = compute_map(dets, gt, num_classes=1, eleven_point=False)
    np.testing.assert_allclose(m_cont["map"], 0.5, rtol=1e-9)


def test_class_confusion_is_fp():
    # image 0: class-1 GT misdetected as class 0; image 1: a real class-0
    # GT, so class 0 is present in the set and the confusion counts as FP
    gt = [(0, 1, box(0, 0, 10, 10)), (1, 0, box(0, 0, 10, 10))]
    dets = [(0, 0, 0.9, box(0, 0, 10, 10)),   # right box, wrong class: FP
            (1, 0, 0.5, box(0, 0, 10, 10))]   # real TP, ranked below the FP
    m = compute_map(dets, gt, num_classes=2, eleven_point=False)
    assert m["ap_1"] == 0.0  # class 1 undetected
    assert np.isclose(m["ap_0"], 0.5)  # precision 1/2 at recall 1
    assert np.isclose(m["map"], 0.25)


def test_absent_class_excluded_from_mean():
    """Classes with no GT in the set are excluded (VOC devkit / COCO
    convention), NOT averaged in as 0 — detections of absent classes carry
    no penalty and no ap_c key is emitted."""
    gt = [(0, 0, box(0, 0, 10, 10))]
    dets = [(0, 0, 0.9, box(0, 0, 10, 10)),
            (0, 1, 0.95, box(20, 20, 30, 30))]  # hallucinated absent class
    m = compute_map(dets, gt, num_classes=2)
    assert "ap_1" not in m
    assert np.isclose(m["map"], 1.0)


def test_iou_threshold_boundary():
    gt = [(0, 0, box(0, 0, 10, 10))]
    # shifted box with IoU just above/below 0.5: shift by 3.3 -> IoU ~ 0.503
    dets_hit = [(0, 0, 0.9, box(3.3, 0, 13.3, 10))]
    dets_miss = [(0, 0, 0.9, box(3.4, 0, 13.4, 10))]
    assert np.isclose(compute_map(dets_hit, gt, 1, iou_thresh=0.5)["map"], 1.0)
    assert compute_map(dets_miss, gt, 1, iou_thresh=0.5)["map"] == 0.0


def test_voc_ap_monotone_envelope():
    rec = np.asarray([0.1, 0.2, 0.4, 1.0])
    prec = np.asarray([1.0, 0.5, 0.75, 0.3])
    ap = voc_ap(rec, prec, eleven_point=False)
    # envelope: [0,0.1]->1.0 region 0.1*1.0 ... manual integral:
    # mpre envelope right-to-left: [1.0, 0.75, 0.75, 0.3]
    want = 0.1 * 1.0 + 0.1 * 0.75 + 0.2 * 0.75 + 0.6 * 0.3
    np.testing.assert_allclose(ap, want, rtol=1e-9)


def test_coco_map_perfect_detection():
    from yolojax.eval.voc_map import compute_coco_map

    gt = [(0, 0, np.array([0.0, 0.0, 10.0, 10.0]))]
    det = [(0, 0, 0.9, np.array([0.0, 0.0, 10.0, 10.0]))]
    m = compute_coco_map(det, gt, 1)
    assert m["coco_map"] == 1.0 and m["ap50"] == 1.0 and m["ap75"] == 1.0


def test_coco_map_partial_iou_counts_low_thresholds_only():
    from yolojax.eval.voc_map import compute_coco_map

    gt = [(0, 0, np.array([0.0, 0.0, 10.0, 10.0]))]
    # IoU = 6/14 ≈ 0.429 < 0.5 -> no threshold matches
    det_low = [(0, 0, 0.9, np.array([4.0, 0.0, 14.0, 10.0]))]
    assert compute_coco_map(det_low, gt, 1)["coco_map"] == 0.0
    # IoU = 8/12 ≈ 0.667 -> matches t in {.50,.55,.60,.65} = 4/10
    det_mid = [(0, 0, 0.9, np.array([2.0, 0.0, 12.0, 10.0]))]
    m = compute_coco_map(det_mid, gt, 1)
    np.testing.assert_allclose(m["coco_map"], 0.4)
    assert m["ap50"] == 1.0 and m["ap75"] == 0.0


def test_coco_map_size_bins_with_box_scale():
    from yolojax.eval.voc_map import compute_coco_map

    # normalized boxes on a 416 canvas: 0.05 -> 20.8 px (small),
    # 0.5 -> 208 px (large)
    small = np.array([0.0, 0.0, 0.05, 0.05])
    large = np.array([0.1, 0.1, 0.6, 0.6])
    gt = [(0, 0, small), (0, 0, large)]
    det = [(0, 0, 0.9, small), (0, 0, 0.8, large)]
    m = compute_coco_map(det, gt, 1, box_scale=416.0)
    assert m["ap_small"] == 1.0 and m["ap_large"] == 1.0
    assert np.isnan(m["ap_medium"])  # no medium GT on this set


# ---------------------------------------------------------------------------
# COCO ignore semantics for the size bins (ADVICE r2 medium): detections
# matched to out-of-bin GT must be ignored, not false positives, and
# classes with no in-bin GT must be excluded from the bin mean.
# ---------------------------------------------------------------------------


def test_coco_bin_det_matching_out_of_bin_gt_is_ignored():
    from yolojax.eval.voc_map import compute_coco_map

    # one small GT (in small bin) + one large GT; both detected perfectly.
    small = np.array([0.0, 0.0, 20.0, 20.0])     # 400 px^2 -> small
    large = np.array([50.0, 50.0, 250.0, 250.0])  # 40000 px^2 -> large
    gt = [(0, 0, small), (0, 0, large)]
    det = [(0, 0, 0.9, small), (0, 0, 0.8, large)]
    m = compute_coco_map(det, gt, 1)
    # the large detection matches large (out-of-small-bin) GT: ignored in
    # the small bin, so ap_small is a clean 1.0 (the old filter-both
    # behavior also gave 1.0 here; the next tests separate them)
    assert m["ap_small"] == 1.0 and m["ap_large"] == 1.0

    # now score the LARGE det higher and make its box slightly off so its
    # area drifts just under the small/large boundary while still matching
    # the large GT at IoU>0.5: under filter-both it would leak into the
    # small bin as an unmatched FP ranked above the small TP, halving AP.
    drifted = np.array([50.0, 50.0, 81.0, 81.0])  # 961 px^2 -> small bin
    gt2 = [(0, 0, small), (0, 0, np.array([50.0, 50.0, 90.0, 90.0]))]
    det2 = [(0, 0, 0.95, drifted), (0, 0, 0.8, small)]
    m2 = compute_coco_map(det2, gt2, 1)
    # drifted det (in small bin by area) matches the out-of-bin 1600px GT
    # (IoU 961/1600 = 0.6) at t=0.5..0.6 -> ignored there, so the small
    # bin's TP stream is the clean small detection
    assert m2["ap_small"] >= 0.3, m2  # nonzero across the 10-threshold mean


def test_coco_bin_class_without_in_bin_gt_excluded():
    from yolojax.eval.voc_map import compute_coco_map

    small = np.array([0.0, 0.0, 20.0, 20.0])
    large = np.array([50.0, 50.0, 250.0, 250.0])
    # class 0: small GT, perfect small det. class 1: only LARGE GT, and a
    # large detection for it (out of small bin entirely).
    gt = [(0, 0, small), (0, 1, large)]
    det = [(0, 0, 0.9, small), (0, 1, 0.8, large)]
    m = compute_coco_map(det, gt, 2)
    # class 1 has no small GT -> excluded from the small-bin mean entirely
    # (the old code averaged in an AP of 0.0 for it, giving 0.5)
    assert m["ap_small"] == 1.0, m


def test_coco_bin_unmatched_out_of_bin_detection_ignored():
    from yolojax.eval.voc_map import compute_coco_map

    small = np.array([0.0, 0.0, 20.0, 20.0])
    gt = [(0, 0, small)]
    # a high-scoring LARGE spurious detection: FP for the large bin (nan
    # there: no large GT) but must NOT count as FP inside the small bin
    det = [(0, 0, 0.95, np.array([100.0, 100.0, 300.0, 300.0])),
           (0, 0, 0.9, small)]
    m = compute_coco_map(det, gt, 1)
    assert m["ap_small"] == 1.0, m


# ---------------------------------------------------------------------------
# COCO Average Recall (AR@K + size bins), pycocotools semantics
# ---------------------------------------------------------------------------


def test_coco_ar_max_dets_cap():
    from yolojax.eval.voc_map import compute_coco_map

    # 3 GT in one image; detections rank a junk box FIRST, so AR@1 wastes
    # the single slot while AR@10 recovers all three
    g = [np.array([0, 0, 10, 10]), np.array([20, 20, 30, 30]),
         np.array([40, 40, 50, 50])]
    gt = [(0, 0, b) for b in g]
    det = [(0, 0, 0.95, np.array([70.0, 70.0, 80.0, 80.0]))]  # junk, top score
    det += [(0, 0, 0.9 - 0.1 * i, b) for i, b in enumerate(g)]
    m = compute_coco_map(det, gt, 1)
    assert np.isclose(m["ar_1"], 0.0), m["ar_1"]  # slot spent on junk
    assert np.isclose(m["ar_10"], 1.0), m["ar_10"]
    assert np.isclose(m["ar_100"], 1.0)


def test_coco_ar_per_image_cap_not_global():
    from yolojax.eval.voc_map import compute_coco_map

    # one GT per image in two images: AR@1 keeps the best det of EACH image
    gt = [(0, 0, np.array([0, 0, 10, 10])), (1, 0, np.array([0, 0, 10, 10]))]
    det = [(0, 0, 0.9, np.array([0.0, 0.0, 10.0, 10.0])),
           (1, 0, 0.2, np.array([0.0, 0.0, 10.0, 10.0]))]
    m = compute_coco_map(det, gt, 1)
    assert np.isclose(m["ar_1"], 1.0), m["ar_1"]


def test_coco_ar_size_bins_ignore_out_of_bin_gt():
    from yolojax.eval.voc_map import compute_coco_map

    small = np.array([0.0, 0.0, 20.0, 20.0])       # 400 px^2
    large = np.array([50.0, 50.0, 250.0, 250.0])   # 40000 px^2
    gt = [(0, 0, small), (0, 0, large)]
    det = [(0, 0, 0.9, small)]  # only the small GT is found
    m = compute_coco_map(det, gt, 1)
    assert np.isclose(m["ar_small"], 1.0), m  # large GT ignored in the bin
    assert np.isclose(m["ar_large"], 0.0), m
    assert np.isclose(m["ar_100"], 0.5), m    # unbinned: 1 of 2
    assert np.isnan(m["ar_medium"])


def test_coco_ar_absent_class_excluded():
    from yolojax.eval.voc_map import compute_coco_map

    gt = [(0, 0, np.array([0, 0, 10, 10]))]
    det = [(0, 0, 0.9, np.array([0.0, 0.0, 10.0, 10.0])),
           (0, 1, 0.95, np.array([20.0, 20.0, 30.0, 30.0]))]  # class 1: no GT
    m = compute_coco_map(det, gt, 2)
    assert np.isclose(m["ar_100"], 1.0), m


# ---------------------------------------------------------------------------
# VOC difficult ignore semantics (devkit VOCevaldet behavior)
# ---------------------------------------------------------------------------


def _box(x0, y0, x1, y1):
    return np.asarray([y0, x0, y1, x1], np.float64)


def test_difficult_gt_neither_tp_nor_fp():
    """A detection sitting on a difficult GT is ignored; the same
    detection against a cache that DROPPED the difficult box is an FP."""
    from yolojax.eval.voc_map import compute_map

    easy = _box(0.1, 0.1, 0.3, 0.3)
    diff = _box(0.6, 0.6, 0.8, 0.8)
    gt = [(0, 0, easy), (0, 0, diff)]
    dets = [
        (0, 0, 0.9, diff),   # on the difficult object: ignored
        (0, 0, 0.8, easy),   # TP
    ]
    m = compute_map(dets, gt, 1, gt_difficult=[False, True],
                    eleven_point=False)
    assert m["map"] == 1.0, m  # the ignored det does not dent precision

    # legacy drop-at-cache behavior: the top-scored det lands on a GT that
    # is no longer there -> FP ABOVE the TP -> precision at full recall 1/2
    m_drop = compute_map(dets, [(0, 0, easy)], 1, eleven_point=False)
    assert m_drop["map"] == 0.5, m_drop


def test_difficult_gt_never_consumed_and_excluded_from_npos():
    from yolojax.eval.voc_map import compute_map

    diff = _box(0.6, 0.6, 0.8, 0.8)
    easy = _box(0.1, 0.1, 0.3, 0.3)
    # two detections on the same difficult GT: BOTH ignored (the devkit
    # never marks difficult GT as matched)
    dets = [(0, 0, 0.9, diff), (0, 0, 0.8, diff), (0, 0, 0.7, easy)]
    m = compute_map(dets, [(0, 0, easy), (0, 0, diff)], 1,
                    gt_difficult=[False, True], eleven_point=False)
    assert m["map"] == 1.0, m

    # a class whose only GT is difficult has npos == 0 -> excluded from
    # the mean entirely (devkit convention), detections unpenalized
    m2 = compute_map([(0, 1, 0.9, diff)],
                     [(0, 0, easy), (0, 1, diff)], 2,
                     gt_difficult=[False, True], eleven_point=False)
    assert "ap_1" not in m2 and m2["map"] == 0.0, m2


def test_coco_metrics_gt_ignore():
    """compute_coco_map's gt_ignore: matches to ignored GT are not FPs,
    ignored GT leaves every denominator."""
    from yolojax.eval.voc_map import compute_coco_map

    easy = _box(0.1, 0.1, 0.4, 0.4)
    diff = _box(0.6, 0.6, 0.9, 0.9)
    gt = [(0, 0, easy), (0, 0, diff)]
    dets = [(0, 0, 0.9, easy), (0, 0, 0.8, diff)]
    m_ign = compute_coco_map(dets, gt, 1, box_scale=100.0,
                             gt_ignore=[False, True])
    assert m_ign["coco_map"] == 1.0, m_ign
    assert m_ign["ar_100"] == 1.0, m_ign
    # without the flag the second GT counts: both dets are perfect matches
    m_all = compute_coco_map(dets, gt, 1, box_scale=100.0)
    assert m_all["coco_map"] == 1.0
    # but with the flag and WITHOUT the second det, recall is still full
    m_half = compute_coco_map(dets[:1], gt, 1, box_scale=100.0,
                              gt_ignore=[False, True])
    assert m_half["ar_100"] == 1.0, m_half
    m_half_all = compute_coco_map(dets[:1], gt, 1, box_scale=100.0)
    assert m_half_all["ar_100"] == 0.5, m_half_all
