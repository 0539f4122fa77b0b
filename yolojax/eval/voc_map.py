"""PASCAL VOC mAP (host-side numpy; the device produced the detections).

The reference had no eval module of its own — quality was judged by eye
(SURVEY.md §4). The rebuild's BASELINE targets VOC2007 mAP, so this
implements the standard VOC protocol: per-class AP with greedy IoU
matching (each GT matched at most once, detections sorted by score),
both the VOC2007 11-point interpolation and the later continuous
(every-point) interpolation.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def voc_ap(recall: np.ndarray, precision: np.ndarray,
           *, eleven_point: bool = True) -> float:
    if eleven_point:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            mask = recall >= t
            p = float(precision[mask].max()) if mask.any() else 0.0
            ap += p / 11.0
        return ap
    # continuous: precision envelope integral
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def compute_map(
    detections: Sequence[Tuple[int, int, float, np.ndarray]],
    ground_truth: Sequence[Tuple[int, int, np.ndarray]],
    num_classes: int,
    *,
    iou_thresh: float = 0.5,
    eleven_point: bool = True,
) -> Dict[str, float]:
    """Compute per-class AP and mAP.

    detections:   (image_id, class_id, score, box[ymin,xmin,ymax,xmax])
    ground_truth: (image_id, class_id, box)
    Boxes in any consistent coordinate system.
    """

    def iou(a, b):  # a: (4,), b: (M,4)
        lo = np.maximum(a[:2], b[:, :2])
        hi = np.minimum(a[2:], b[:, 2:])
        inter = np.prod(np.maximum(hi - lo, 0), axis=1)
        area_a = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
        area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
            b[:, 3] - b[:, 1], 0
        )
        return inter / np.maximum(area_a + area_b - inter, 1e-10)

    aps = {}
    for c in range(num_classes):
        gt_by_img: Dict[int, List[np.ndarray]] = {}
        for img, cls, box in ground_truth:
            if cls == c:
                gt_by_img.setdefault(img, []).append(np.asarray(box, np.float64))
        npos = sum(len(v) for v in gt_by_img.values())
        dets = [(img, score, np.asarray(box, np.float64))
                for img, cls, score, box in detections if cls == c]
        if npos == 0:
            if dets:
                aps[c] = 0.0
            continue
        dets.sort(key=lambda d: -d[1])
        matched: Dict[int, np.ndarray] = {
            img: np.zeros(len(v), bool) for img, v in gt_by_img.items()
        }
        tp = np.zeros(len(dets))
        fp = np.zeros(len(dets))
        for i, (img, score, box) in enumerate(dets):
            gts = gt_by_img.get(img)
            if not gts:
                fp[i] = 1
                continue
            overlaps = iou(box, np.stack(gts))
            j = int(np.argmax(overlaps))
            if overlaps[j] >= iou_thresh and not matched[img][j]:
                tp[i] = 1
                matched[img][j] = True
            else:
                fp[i] = 1
        ctp = np.cumsum(tp)
        cfp = np.cumsum(fp)
        recall = ctp / npos
        precision = ctp / np.maximum(ctp + cfp, 1e-10)
        aps[c] = voc_ap(recall, precision, eleven_point=eleven_point)
    out = {f"ap_{c}": v for c, v in aps.items()}
    out["map"] = float(np.mean(list(aps.values()))) if aps else 0.0
    return out
