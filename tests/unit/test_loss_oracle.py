"""Independent numpy oracles for both fused objectives (SURVEY.md §3.5).

The fused losses in yolojax/train/losses.py are fully vectorized (scatter
gridding, argmax matching, masked terms). These tests re-derive the same
numbers from the paper equations with literal Python loops — per GT, per
cell, per anchor, sequential-overwrite assignment — sharing NO code with
the implementation under test (numpy only). Agreement on random inputs
(crowded images, duplicate cells, padding garbage) pins the whole loss
contract, not just the per-term behaviors the other unit tests check.

v1: arXiv:1506.02640 §2.2 eq. 3.   v2: arXiv:1612.08242 §2 + Darknet
region-layer semantics (documented in YoloV2LossConfig).
"""

import numpy as np
import jax
import jax.numpy as jnp

from yolojax.train.losses import (
    YoloV1LossConfig,
    YoloV2LossConfig,
    yolo_v1_loss,
    yolo_v2_loss,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _corners(xy, wh):
    # (cx, cy), (w, h) -> (ymin, xmin, ymax, xmax)
    return np.array([
        xy[1] - wh[1] / 2, xy[0] - wh[0] / 2,
        xy[1] + wh[1] / 2, xy[0] + wh[0] / 2,
    ])


def _iou(a, b):
    lo = np.maximum(a[:2], b[:2])
    hi = np.minimum(a[2:], b[2:])
    inter = np.prod(np.maximum(hi - lo, 0.0))
    area = lambda c: max(c[2] - c[0], 0.0) * max(c[3] - c[1], 0.0)
    return inter / max(area(a) + area(b) - inter, 1e-10)


# ---------------------------------------------------------------------------
# v2 oracle
# ---------------------------------------------------------------------------


def _v2_oracle(head, anchors, gt_xywh, gt_class, gt_valid, cfg):
    n, h, w, a, _ = head.shape
    c = head.shape[-1] - 5
    anc = np.asarray(anchors, np.float64)
    head = head.astype(np.float64)

    sxy = _sigmoid(head[..., 0:2])
    twh = head[..., 2:4]
    conf = _sigmoid(head[..., 4])
    probs = _softmax(head[..., 5:])

    terms = {k: 0.0 for k in ("coord", "object", "noobject", "class", "prior")}
    for img in range(n):
        # decoded prediction boxes (normalized corner coords)
        pred = np.zeros((h, w, a, 4))
        for j in range(h):
            for i in range(w):
                for k in range(a):
                    pxy = (sxy[img, j, i, k] + [i, j]) / [w, h]
                    pwh = anc[k] * np.exp(twh[img, j, i, k]) / [w, h]
                    pred[j, i, k] = _corners(pxy, pwh)

        # sequential-overwrite assignment: later valid GTs win the slot
        assign = {}  # (j, i, k) -> gt index
        for g in range(gt_xywh.shape[1]):
            if not gt_valid[img, g]:
                continue
            gx, gy, gw, gh = gt_xywh[img, g].astype(np.float64)
            i = int(min(max(np.floor(gx * w), 0), w - 1))
            j = int(min(max(np.floor(gy * h), 0), h - 1))
            # best anchor by wh-only IoU in grid units
            gwg = np.array([gw * w, gh * h])
            best_k, best = 0, -1.0
            for k in range(a):
                inter = min(gwg[0], anc[k][0]) * min(gwg[1], anc[k][1])
                union = gwg.prod() + anc[k].prod() - inter
                v = inter / max(union, 1e-10)
                if v > best:
                    best_k, best = k, v
            assign[(j, i, best_k)] = g

        # noobj exemption uses ALL valid GTs (incl. overwritten duplicates)
        valid_corners = [
            _corners(gt_xywh[img, g, :2].astype(np.float64),
                     gt_xywh[img, g, 2:].astype(np.float64))
            for g in range(gt_xywh.shape[1]) if gt_valid[img, g]
        ]

        for j in range(h):
            for i in range(w):
                for k in range(a):
                    if (j, i, k) in assign:
                        g = assign[(j, i, k)]
                        gx, gy, gw, gh = gt_xywh[img, g].astype(np.float64)
                        txs = np.array([gx * w, gy * h]) - [i, j]
                        tws = np.log(
                            np.maximum([gw * w, gh * h], 1e-8)
                            / np.maximum(anc[k], 1e-8))
                        cw = (2.0 - gw * gh) if cfg.coord_area_weight else 1.0
                        d = np.concatenate([
                            sxy[img, j, i, k] - txs,
                            twh[img, j, i, k] - tws,
                        ])
                        terms["coord"] += cfg.coord_scale * cw * (d ** 2).sum()
                        gtc = _corners([gx, gy], [gw, gh])
                        tgt = _iou(pred[j, i, k], gtc) if cfg.rescore else 1.0
                        terms["object"] += cfg.object_scale * (
                            conf[img, j, i, k] - tgt) ** 2
                        one = np.zeros(c)
                        one[gt_class[img, g]] = 1.0
                        terms["class"] += cfg.class_scale * (
                            (probs[img, j, i, k] - one) ** 2).sum()
                    else:
                        best = max((_iou(pred[j, i, k], gc)
                                    for gc in valid_corners), default=0.0)
                        if best <= cfg.iou_thresh:
                            terms["noobject"] += (cfg.noobject_scale
                                                  * conf[img, j, i, k] ** 2)
                        if cfg.prior_scale > 0:
                            terms["prior"] += cfg.prior_scale * (
                                ((sxy[img, j, i, k] - 0.5) ** 2).sum()
                                + (twh[img, j, i, k] ** 2).sum())
    if cfg.prior_scale <= 0:
        del terms["prior"]
    terms = {k: v / n for k, v in terms.items()}
    terms["total"] = sum(terms.values())
    return terms


def _random_v2_case(seed, n=2, h=5, w=5, a=3, c=4, g=6):
    rng = np.random.RandomState(seed)
    head = rng.randn(n, h, w, a, 5 + c).astype(np.float32)
    gt_xywh = np.stack([
        rng.uniform(0.05, 0.95, (n, g)),
        rng.uniform(0.05, 0.95, (n, g)),
        rng.uniform(0.05, 0.6, (n, g)),
        rng.uniform(0.05, 0.6, (n, g)),
    ], axis=-1).astype(np.float32)
    gt_class = rng.randint(0, c, (n, g)).astype(np.int32)
    gt_valid = rng.rand(n, g) < 0.7
    gt_valid[:, 0] = True
    # force a duplicate collision: GT 1 shares GT 0's center and shape
    # (same cell AND same best anchor -> the later one must win)
    gt_xywh[:, 1] = gt_xywh[:, 0]
    gt_valid[:, 1] = True
    # garbage in padding slots must not leak
    gt_xywh[~gt_valid] = rng.uniform(-5, 5, gt_xywh[~gt_valid].shape)
    anchors = ((1.2, 1.5), (2.5, 1.0), (4.0, 4.5))
    return head, anchors, gt_xywh, gt_class, gt_valid


def _assert_terms_match(got, want, rtol=2e-4):
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in want:
        np.testing.assert_allclose(
            float(got[k]), want[k], rtol=rtol, atol=1e-6,
            err_msg=f"term {k!r}")


def test_v2_loss_matches_numpy_oracle():
    for seed in (0, 1, 2):
        head, anchors, gt_xywh, gt_class, gt_valid = _random_v2_case(seed)
        cfg = YoloV2LossConfig()
        got = jax.jit(
            lambda hd: yolo_v2_loss(hd, anchors, jnp.asarray(gt_xywh),
                                    jnp.asarray(gt_class),
                                    jnp.asarray(gt_valid), cfg)
        )(head)
        want = _v2_oracle(head, anchors, gt_xywh, gt_class, gt_valid, cfg)
        _assert_terms_match(got, want)


def test_v2_loss_matches_oracle_all_config_branches():
    head, anchors, gt_xywh, gt_class, gt_valid = _random_v2_case(7)
    cfg = YoloV2LossConfig(
        coord_scale=2.0, object_scale=3.0, noobject_scale=0.7,
        class_scale=1.5, iou_thresh=0.4, rescore=False,
        coord_area_weight=False, prior_scale=0.01,
    )
    got = yolo_v2_loss(jnp.asarray(head), anchors, jnp.asarray(gt_xywh),
                       jnp.asarray(gt_class), jnp.asarray(gt_valid), cfg)
    want = _v2_oracle(head, anchors, gt_xywh, gt_class, gt_valid, cfg)
    assert "prior" in want
    _assert_terms_match(got, want)


# ---------------------------------------------------------------------------
# v1 oracle
# ---------------------------------------------------------------------------


def _v1_oracle(flat, s, b, c, gt_xywh, gt_class, gt_valid, cfg):
    n = flat.shape[0]
    flat = flat.astype(np.float64)
    probs = flat[:, : s * s * c].reshape(n, s, s, c)
    conf = flat[:, s * s * c : s * s * (c + b)].reshape(n, s, s, b)
    raw = flat[:, s * s * (c + b):].reshape(n, s, s, b, 4)

    terms = {k: 0.0 for k in ("coord", "object", "noobject", "class")}
    for img in range(n):
        # sequential-overwrite: later valid GTs win the cell
        cells = {}  # (j, i) -> gt index
        for g in range(gt_xywh.shape[1]):
            if not gt_valid[img, g]:
                continue
            gx, gy = gt_xywh[img, g, :2].astype(np.float64)
            i = int(min(max(np.floor(gx * s), 0), s - 1))
            j = int(min(max(np.floor(gy * s), 0), s - 1))
            cells[(j, i)] = g

        for j in range(s):
            for i in range(s):
                if (j, i) in cells:
                    g = cells[(j, i)]
                    gx, gy, gw, gh = gt_xywh[img, g].astype(np.float64)
                    gtc = _corners([gx, gy], [gw, gh])
                    # responsible predictor = argmax IoU (first on ties)
                    ious = []
                    for k in range(b):
                        px = (raw[img, j, i, k, 0] + i) / s
                        py = (raw[img, j, i, k, 1] + j) / s
                        pwh = (raw[img, j, i, k, 2:4] ** 2
                               if cfg.sqrt else raw[img, j, i, k, 2:4])
                        ious.append(_iou(_corners([px, py], pwh), gtc))
                    r = int(np.argmax(ious))
                    txy = np.array([gx * s, gy * s])
                    txy -= np.floor(txy)
                    twh = (np.sqrt(np.maximum([gw, gh], 0.0))
                           if cfg.sqrt else np.array([gw, gh]))
                    d = np.concatenate([raw[img, j, i, r, 0:2] - txy,
                                        raw[img, j, i, r, 2:4] - twh])
                    terms["coord"] += cfg.coord_scale * (d ** 2).sum()
                    tgt = ious[r] if cfg.rescore else 1.0
                    terms["object"] += cfg.object_scale * (
                        conf[img, j, i, r] - tgt) ** 2
                    for k in range(b):
                        if k != r:
                            terms["noobject"] += (cfg.noobject_scale
                                                  * conf[img, j, i, k] ** 2)
                    one = np.zeros(c)
                    one[gt_class[img, g]] = 1.0
                    terms["class"] += cfg.class_scale * (
                        (probs[img, j, i] - one) ** 2).sum()
                else:
                    for k in range(b):
                        terms["noobject"] += (cfg.noobject_scale
                                              * conf[img, j, i, k] ** 2)
    terms = {k: v / n for k, v in terms.items()}
    terms["total"] = sum(terms.values())
    return terms


def test_v1_loss_matches_numpy_oracle():
    s, b, c, g, n = 5, 2, 3, 6, 2
    for seed in (0, 3):
        rng = np.random.RandomState(seed)
        flat = rng.randn(n, s * s * (c + 5 * b)).astype(np.float32)
        gt_xywh = np.stack([
            rng.uniform(0.05, 0.95, (n, g)),
            rng.uniform(0.05, 0.95, (n, g)),
            rng.uniform(0.05, 0.6, (n, g)),
            rng.uniform(0.05, 0.6, (n, g)),
        ], axis=-1).astype(np.float32)
        gt_class = rng.randint(0, c, (n, g)).astype(np.int32)
        gt_valid = rng.rand(n, g) < 0.7
        gt_valid[:, 0] = True
        gt_xywh[:, 1, :2] = gt_xywh[:, 0, :2]  # duplicate cell: later wins
        gt_valid[:, 1] = True
        gt_xywh[~gt_valid] = rng.uniform(-5, 5, gt_xywh[~gt_valid].shape)

        cfg = YoloV1LossConfig()
        got = jax.jit(
            lambda f: yolo_v1_loss(f, s, b, c, jnp.asarray(gt_xywh),
                                   jnp.asarray(gt_class),
                                   jnp.asarray(gt_valid), cfg)
        )(flat)
        want = _v1_oracle(flat, s, b, c, gt_xywh, gt_class, gt_valid, cfg)
        _assert_terms_match(got, want)


def test_v1_loss_matches_oracle_no_sqrt_no_rescore():
    s, b, c, g, n = 4, 3, 2, 4, 1
    rng = np.random.RandomState(11)
    flat = rng.randn(n, s * s * (c + 5 * b)).astype(np.float32)
    gt_xywh = rng.uniform(0.1, 0.7, (n, g, 4)).astype(np.float32)
    gt_class = rng.randint(0, c, (n, g)).astype(np.int32)
    gt_valid = np.ones((n, g), bool)
    cfg = YoloV1LossConfig(coord_scale=3.0, noobject_scale=0.2,
                           rescore=False, sqrt=False)
    got = yolo_v1_loss(jnp.asarray(flat), s, b, c, jnp.asarray(gt_xywh),
                       jnp.asarray(gt_class), jnp.asarray(gt_valid), cfg)
    want = _v1_oracle(flat, s, b, c, gt_xywh, gt_class, gt_valid, cfg)
    _assert_terms_match(got, want)
