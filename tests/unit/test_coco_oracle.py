"""Independent naive-loop oracle for the COCO metrics stack.

``compute_coco_map`` (yolojax/eval/voc_map.py) guards the BASELINE
config-5 quality gate through cached-IoU machinery (``_ClassIndex`` /
``_binned_aps``). This file re-derives every surface it reports —
AP@[.50:.95] / AP50 / AP75, AR@1/10/100, and the size-binned AP/AR with
COCO ignore semantics — as plain per-image Python loops that share no
code with the implementation (own IoU, own every-point integral, own
greedy matcher), then asserts equality on randomized and adversarial
small cases. The pattern follows tests/unit/test_loss_oracle.py, which
pins the fused losses the same way.

Semantics pinned here (pycocotools-style, as documented on
``compute_coco_map``):
- greedy matching in global score order; a detection takes the
  best-IoU *unmatched* GT above the threshold, preferring non-ignored
  GT; matches to ignored/out-of-bin GT consume the GT but are neither
  TP nor FP; unmatched out-of-bin detections are ignored, not FPs.
- recall denominator = non-ignored (in-bin) GT; classes with no such GT
  are excluded from means, not averaged as zero.
- AP uses continuous every-point interpolation; AR is the recall of the
  greedy match with at most K detections per image, averaged over the
  IoU sweep then over classes.
"""

import numpy as np
import pytest

from yolojax.eval.voc_map import COCO_AREA_RANGES, compute_coco_map

IOU_T = tuple(round(0.5 + 0.05 * i, 2) for i in range(10))


# ---------------------------------------------------------------- oracle

def _iou(a, b):
    """Scalar IoU of two [ymin,xmin,ymax,xmax] boxes, written longhand."""
    y0 = max(a[0], b[0])
    x0 = max(a[1], b[1])
    y1 = min(a[2], b[2])
    x1 = min(a[3], b[3])
    inter = max(y1 - y0, 0.0) * max(x1 - x0, 0.0)
    area_a = max(a[2] - a[0], 0.0) * max(a[3] - a[1], 0.0)
    area_b = max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)
    denom = area_a + area_b - inter
    return inter / denom if denom > 1e-10 else inter / 1e-10


def _area(box, box_scale):
    b = np.asarray(box, np.float64) * box_scale
    return max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)


def _every_point_ap(flags, npos):
    """AP from an ordered list of (tp?,) flags via the precision envelope,
    integrated point by point."""
    if not flags:
        return 0.0
    ctp = cfp = 0
    rec, prec = [], []
    for tp in flags:
        ctp += tp
        cfp += 1 - tp
        rec.append(ctp / npos)
        prec.append(ctp / (ctp + cfp))
    ap = 0.0
    prev_r = 0.0
    for i, tp in enumerate(flags):
        if tp:
            envelope = max(prec[i:])
            ap += (rec[i] - prev_r) * envelope
            prev_r = rec[i]
    return ap


def _match_class_threshold(dets_c, gts_c, t, *, det_live, gt_live):
    """Greedy match one class at one IoU threshold.

    dets_c: [(score, img, det_index, box)] in global score-desc order.
    gts_c:  [(img, gt_index, box)].
    det_live / gt_live: bool by original index — False = ignored
    (out-of-bin or crowd/difficult).
    Returns the ordered list of counted detection flags (1=TP, 0=FP).
    """
    matched = set()  # gt_index
    flags = []
    for score, img, di, dbox in dets_c:
        cands = [(gi, _iou(dbox, gbox)) for (gimg, gi, gbox) in gts_c
                 if gimg == img and gi not in matched]
        cands = [(gi, ov) for gi, ov in cands if ov >= t]
        live = [(gi, ov) for gi, ov in cands if gt_live[gi]]
        if live:
            gi = max(live, key=lambda r: r[1])[0]
            matched.add(gi)
            flags.append(1)
        elif cands:  # best available is ignored GT: consume, no TP/FP
            gi = max(cands, key=lambda r: r[1])[0]
            matched.add(gi)
        elif det_live[di]:
            flags.append(0)
        # else: ignored unmatched detection — dropped entirely
    return flags


def _oracle_binned_ap(dets, gts, num_classes, t, *, det_live, gt_live):
    """Mean AP over classes at one threshold; None if no class has live
    GT."""
    per_cls = []
    for c in range(num_classes):
        gts_c = [(img, gi, np.asarray(b, np.float64))
                 for gi, (img, cls, b) in enumerate(gts) if cls == c]
        npos = sum(1 for (_, gi, _) in gts_c if gt_live[gi])
        if npos == 0:
            continue
        dets_c = sorted(
            ((score, img, di, np.asarray(b, np.float64))
             for di, (img, cls, score, b) in enumerate(dets) if cls == c),
            key=lambda r: -r[0])
        flags = _match_class_threshold(dets_c, gts_c, t,
                                       det_live=det_live, gt_live=gt_live)
        per_cls.append(_every_point_ap(flags, npos))
    return float(np.mean(per_cls)) if per_cls else None


def _oracle_recall(dets, gts, num_classes, c, t, max_dets, gt_live):
    """Recall of class ``c`` at threshold ``t`` with at most ``max_dets``
    detections per image; None when the class has no live GT."""
    gts_c = [(img, gi, np.asarray(b, np.float64))
             for gi, (img, cls, b) in enumerate(gts) if cls == c]
    npos = sum(1 for (_, gi, _) in gts_c if gt_live[gi])
    if npos == 0:
        return None
    images = sorted({img for img, _, _ in gts_c} |
                    {img for img, cls, _, _ in dets if cls == c})
    hit = 0
    for img in images:
        dets_i = sorted(((score, np.asarray(b, np.float64))
                         for dimg, cls, score, b in dets
                         if cls == c and dimg == img),
                        key=lambda r: -r[0])[:max_dets]
        matched = set()
        for score, dbox in dets_i:
            cands = [(gi, _iou(dbox, gbox)) for (gimg, gi, gbox) in gts_c
                     if gimg == img and gi not in matched]
            cands = [(gi, ov) for gi, ov in cands if ov >= t]
            live = [(gi, ov) for gi, ov in cands if gt_live[gi]]
            if live:
                matched.add(max(live, key=lambda r: r[1])[0])
                hit += 1
            elif cands:
                matched.add(max(cands, key=lambda r: r[1])[0])
    return hit / npos


def oracle_coco(dets, gts, num_classes, *, box_scale=1.0, gt_ignore=None):
    """Full naive re-derivation of ``compute_coco_map``'s output dict."""
    countable = (np.ones(len(gts), bool) if gt_ignore is None
                 else ~np.asarray(gt_ignore, bool))
    all_live = np.ones(len(dets), bool)
    out = {}

    per_t = []
    for t in IOU_T:
        v = _oracle_binned_ap(dets, gts, num_classes, t,
                              det_live=all_live, gt_live=countable)
        per_t.append(0.0 if v is None else v)
    out["coco_map"] = float(np.mean(per_t))
    out["ap50"] = per_t[0]
    out["ap75"] = per_t[5]

    def mean_recall(max_dets, gt_live):
        per_cls = []
        for c in range(num_classes):
            vals = [_oracle_recall(dets, gts, num_classes, c, t, max_dets,
                                   gt_live) for t in IOU_T]
            vals = [v for v in vals if v is not None]
            if vals:
                per_cls.append(float(np.mean(vals)))
        return float(np.mean(per_cls)) if per_cls else float("nan")

    for k in (1, 10, 100):
        out[f"ar_{k}"] = mean_recall(k, countable)

    gt_areas = np.asarray([_area(g[2], box_scale) for g in gts])
    det_areas = np.asarray([_area(d[3], box_scale) for d in dets])
    for name, (lo, hi) in COCO_AREA_RANGES.items():
        gt_in = ((gt_areas >= lo) & (gt_areas < hi) & countable
                 if len(gts) else np.zeros(0, bool))
        det_in = ((det_areas >= lo) & (det_areas < hi)
                  if len(dets) else np.zeros(0, bool))
        if not gt_in.any():
            out[f"ap_{name}"] = float("nan")
            out[f"ar_{name}"] = float("nan")
            continue
        vals = []
        for t in IOU_T:
            v = _oracle_binned_ap(dets, gts, num_classes, t,
                                  det_live=det_in, gt_live=gt_in)
            if v is not None:
                vals.append(v)
        out[f"ap_{name}"] = float(np.mean(vals)) if vals else float("nan")
        out[f"ar_{name}"] = mean_recall(100, gt_in)
    return out


# ----------------------------------------------------------- generators

def _random_case(rng, *, n_images, n_classes, n_gt, n_det, perturb=0.15):
    """Random boxes in [0,1] with sizes spanning all three COCO area bins
    at box_scale=416; roughly half the detections perturb a real GT (so
    matching at mid thresholds is exercised), the rest are noise. Scores
    are made unique so score-sort ties cannot differ between matchers."""
    gts = []
    for _ in range(n_gt):
        img = int(rng.integers(n_images))
        cls = int(rng.integers(n_classes))
        # side from ~8px (small) to ~300px (large) on a 416 canvas
        side = float(rng.uniform(0.02, 0.72))
        y0 = float(rng.uniform(0, 1 - side))
        x0 = float(rng.uniform(0, 1 - side))
        ar = float(rng.uniform(0.6, 1.6))
        h, w = side, min(side * ar, 1 - x0)
        gts.append((img, cls, np.array([y0, x0, y0 + h, x0 + w])))
    dets = []
    scores = rng.permutation(n_det) / n_det + rng.uniform(0, 1e-4, n_det)
    for k in range(n_det):
        if gts and k % 2 == 0:
            img, cls, b = gts[int(rng.integers(len(gts)))]
            jitter = rng.uniform(-perturb, perturb, 4) * (b[2] - b[0])
            bb = np.clip(b + jitter, 0, 1)
            if bb[2] <= bb[0] or bb[3] <= bb[1]:
                bb = b.copy()
            if rng.uniform() < 0.1:
                cls = int(rng.integers(n_classes))  # class confusion
        else:
            img = int(rng.integers(n_images))
            cls = int(rng.integers(n_classes))
            side = float(rng.uniform(0.02, 0.6))
            y0 = float(rng.uniform(0, 1 - side))
            x0 = float(rng.uniform(0, 1 - side))
            bb = np.array([y0, x0, y0 + side, x0 + side])
        dets.append((img, cls, float(scores[k]), bb))
    return dets, gts


def _assert_same(got, want):
    assert set(got) >= set(want), sorted(set(want) - set(got))
    for k, v in want.items():
        g = got[k]
        if isinstance(v, float) and np.isnan(v):
            assert np.isnan(g), f"{k}: impl {g}, oracle NaN"
        else:
            np.testing.assert_allclose(
                g, v, rtol=1e-9, atol=1e-12,
                err_msg=f"key {k}: impl {g} vs oracle {v}")


# ---------------------------------------------------------------- tests

@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_random_cases_match_oracle(seed):
    rng = np.random.default_rng(seed)
    dets, gts = _random_case(
        rng,
        n_images=int(rng.integers(2, 6)),
        n_classes=int(rng.integers(1, 5)),
        n_gt=int(rng.integers(3, 14)),
        n_det=int(rng.integers(4, 22)),
    )
    got = compute_coco_map(dets, gts, 5, box_scale=416.0)
    want = oracle_coco(dets, gts, 5, box_scale=416.0)
    _assert_same(got, want)


@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_random_cases_with_ignored_gt_match_oracle(seed):
    """gt_ignore (difficult/crowd) flows through every surface."""
    rng = np.random.default_rng(seed)
    dets, gts = _random_case(rng, n_images=4, n_classes=3, n_gt=12,
                             n_det=18)
    ignore = rng.uniform(size=len(gts)) < 0.35
    got = compute_coco_map(dets, gts, 3, box_scale=416.0,
                           gt_ignore=ignore)
    want = oracle_coco(dets, gts, 3, box_scale=416.0, gt_ignore=ignore)
    _assert_same(got, want)


def test_max_dets_cap_binds():
    """AR@1 < AR@10 when one image holds several well-detected GTs — the
    per-image cap must actually drop detections."""
    rng = np.random.default_rng(42)
    gts, dets = [], []
    for k in range(6):  # 6 GT in ONE image, all detected perfectly
        y0, x0 = 0.15 * k, 0.1
        b = np.array([y0, x0, y0 + 0.1, x0 + 0.1])
        gts.append((0, 0, b))
        dets.append((0, 0, 0.9 - 0.01 * k, b))
    got = compute_coco_map(dets, gts, 1, box_scale=416.0)
    want = oracle_coco(dets, gts, 1, box_scale=416.0)
    _assert_same(got, want)
    assert got["ar_1"] == pytest.approx(1 / 6)
    assert got["ar_10"] == pytest.approx(1.0)


def test_detection_in_empty_image_is_fp():
    gts = [(0, 0, np.array([0.1, 0.1, 0.4, 0.4]))]
    dets = [(0, 0, 0.9, np.array([0.1, 0.1, 0.4, 0.4])),
            (3, 0, 0.8, np.array([0.1, 0.1, 0.4, 0.4]))]  # no GT there
    got = compute_coco_map(dets, gts, 1, box_scale=416.0)
    want = oracle_coco(dets, gts, 1, box_scale=416.0)
    _assert_same(got, want)
    assert got["coco_map"] == pytest.approx(1.0)  # FP ranked after the TP


def test_out_of_bin_semantics_cross_checked():
    """A large detection sitting on a small GT: in the small bin the GT is
    live but the det is out-of-bin (unmatched-out-of-bin dets are ignored,
    matched ones count); in the large bin the GT is ignored. Both paths
    must agree with the oracle's independent ignore logic."""
    small_gt = np.array([0.0, 0.0, 0.05, 0.05])      # ~20.8px: small
    large_det = np.array([0.0, 0.0, 0.30, 0.30])     # ~125px: large
    gts = [(0, 0, small_gt)]
    dets = [(0, 0, 0.9, large_det),
            (0, 0, 0.8, small_gt)]  # the real match, ranked second
    got = compute_coco_map(dets, gts, 1, box_scale=416.0)
    want = oracle_coco(dets, gts, 1, box_scale=416.0)
    _assert_same(got, want)


def test_all_gt_ignored_class_excluded():
    gts = [(0, 0, np.array([0.1, 0.1, 0.4, 0.4])),
           (0, 1, np.array([0.5, 0.5, 0.8, 0.8]))]
    dets = [(0, 0, 0.9, np.array([0.1, 0.1, 0.4, 0.4])),
            (0, 1, 0.8, np.array([0.5, 0.5, 0.8, 0.8]))]
    ignore = np.array([False, True])  # class 1's only GT is ignored
    got = compute_coco_map(dets, gts, 2, box_scale=416.0,
                           gt_ignore=ignore)
    want = oracle_coco(dets, gts, 2, box_scale=416.0, gt_ignore=ignore)
    _assert_same(got, want)
    assert got["coco_map"] == pytest.approx(1.0)  # only class 0 counts


def test_no_detections_at_all():
    gts = [(0, 0, np.array([0.1, 0.1, 0.4, 0.4]))]
    got = compute_coco_map([], gts, 1, box_scale=416.0)
    want = oracle_coco([], gts, 1, box_scale=416.0)
    _assert_same(got, want)
    assert got["coco_map"] == 0.0 and got["ar_100"] == 0.0
