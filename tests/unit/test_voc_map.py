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
    gt = [(0, 1, box(0, 0, 10, 10))]
    dets = [(0, 0, 0.9, box(0, 0, 10, 10))]  # right box, wrong class
    m = compute_map(dets, gt, num_classes=2)
    assert m["ap_1"] == 0.0  # class 1 undetected
    assert m["ap_0"] == 0.0  # class 0 detection is FP (no class-0 GT... )
    assert m["map"] == 0.0


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
