"""Fused YOLO objectives, fully vectorized (no Python control flow).

Replaces the reference's ``model/yolo/__init__.py`` / ``model/yolo2/
__init__.py`` Objectives classes (SURVEY.md §2, §3.5). The north star asks
for "a single fused loss kernel": everything here — anchor matching,
responsible-box selection, target scatter, all loss terms — is one traced
function of (head, padded ground truth), so XLA fuses it into the backward
pass and it shards cleanly under pjit (batch-dim parallel).

Ground-truth convention (padded, static shapes — SURVEY.md §7 hard parts):
  gt_xywh:  (N, G, 4) normalized (cx, cy, w, h) in [0, 1]
  gt_class: (N, G) int32
  gt_valid: (N, G) bool        (padding mask)

Loss contracts are [H]-confidence, fixed by the papers:
  v1: arXiv:1506.02640 §2.2 (squared-error grid loss, responsible box by
      IoU, lambda_coord=5, lambda_noobj=0.5)
  v2: arXiv:1612.08242 §2 + Darknet region_layer semantics (sigma decode,
      best-anchor match per GT, IoU-thresholded noobj mask, rescored
      objectness target, optional early-training prior matching).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from yolojax.ops.boxes import iou_matrix, iou_pairwise, xywh_to_corners


def _mask_duplicate_slots(slot: jax.Array, gt_valid: jax.Array) -> jax.Array:
    """Deterministic winner for GTs colliding on one target slot.

    ``slot`` (N, G) int32 linearized scatter destination per GT. XLA scatter
    with duplicate indices is UNDEFINED, so before scattering we drop every
    valid GT that has a LATER valid GT bound for the same slot: the last GT
    in the padded list wins, the sequential-overwrite semantics of Darknet's
    per-truth loop (and of the reference's feed-dict gridding). Returns a
    bool (N, G) mask of surviving GTs. O(G^2) compare — G is max_boxes
    (<= 64), negligible next to the IoU matrix this loss already builds.
    """
    g = slot.shape[1]
    same = slot[:, :, None] == slot[:, None, :]  # (N, G, G') slot_i == slot_j
    later = jnp.arange(g)[None, :] > jnp.arange(g)[:, None]  # (G, G') j > i
    loser = jnp.any(same & later[None] & gt_valid[:, None, :], axis=-1)
    return gt_valid & ~loser


# ---------------------------------------------------------------------------
# YOLOv2
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class YoloV2LossConfig:
    """Darknet region-layer defaults (yolo-voc.cfg); the reference read the
    same lambdas from its INI [model] section (SURVEY.md §3.5 [M])."""

    coord_scale: float = 1.0
    object_scale: float = 5.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    iou_thresh: float = 0.6  # anchors above this best-IoU escape noobj loss
    rescore: bool = True  # objectness target = IoU (else 1.0)
    # (2 - w*h) coord weighting per truth, as in Darknet's region layer
    coord_area_weight: bool = True
    # Early-training prior matching (Darknet "seen < 12800"): pull all boxes
    # toward their anchor prior with this weight; 0 disables. Presence in the
    # reference is uncertain (SURVEY.md §3.5 [L]) — off by default.
    prior_scale: float = 0.0


def yolo_v2_loss(
    head: jax.Array,  # (N, H, W, A, 5+C) raw
    anchors: Tuple[Tuple[float, float], ...],
    gt_xywh: jax.Array,
    gt_class: jax.Array,
    gt_valid: jax.Array,
    cfg: YoloV2LossConfig = YoloV2LossConfig(),
) -> Dict[str, jax.Array]:
    """Fused v2 objective. Returns dict of scalar loss terms + 'total'.

    All sums are normalized by batch size (per-image totals), matching the
    TF1-era convention of summing per image then averaging over the batch.
    """
    n, h, w, a, _ = head.shape
    c = head.shape[-1] - 5
    anc = jnp.asarray(anchors, jnp.float32)  # (A, 2) grid units
    scale = jnp.asarray([w, h], jnp.float32)
    f32 = jnp.float32

    txy = head[..., 0:2].astype(f32)
    twh = head[..., 2:4].astype(f32)
    to = head[..., 4].astype(f32)
    tc = head[..., 5:].astype(f32)

    sxy = jax.nn.sigmoid(txy)  # sigma(tx), sigma(ty)
    conf = jax.nn.sigmoid(to)
    probs = jax.nn.softmax(tc, axis=-1)

    # Decoded boxes in normalized image coords, for IoU computations.
    cx = jax.lax.broadcasted_iota(f32, (h, w), 1)
    cy = jax.lax.broadcasted_iota(f32, (h, w), 0)
    grid = jnp.stack([cx, cy], -1)[None, :, :, None, :]  # (1,H,W,1,2)
    pred_xy = (sxy + grid) / scale
    pred_wh = anc * jnp.exp(twh) / scale
    pred_corners = xywh_to_corners(pred_xy, pred_wh)  # (N,H,W,A,4)

    g = gt_xywh.shape[1]

    # ---- per-GT assignment: cell + best anchor ---------------------------
    gxy = gt_xywh[..., 0:2].astype(f32)  # (N,G,2) normalized centers
    gwh = gt_xywh[..., 2:4].astype(f32)
    cell = jnp.floor(gxy * scale)  # (N,G,2) -> (cx_i, cy_i) floats
    cell = jnp.clip(cell, 0, jnp.asarray([w - 1, h - 1], f32))
    # best anchor by IoU of wh-only boxes centered at origin (grid units)
    gwh_grid = gwh * scale  # (N,G,2)
    inter = jnp.minimum(gwh_grid[:, :, None, :], anc[None, None, :, :]).prod(-1)
    union = (
        gwh_grid.prod(-1)[:, :, None] + anc.prod(-1)[None, None, :] - inter
    )
    anchor_iou = inter / jnp.maximum(union, 1e-10)  # (N,G,A)
    best_a = jnp.argmax(anchor_iou, axis=-1)  # (N,G)

    # scatter indices; padding GTs get out-of-range rows -> mode='drop'.
    # Two valid GTs landing on the same (cell, anchor) — routine in crowded
    # images — would be an undefined-duplicate scatter: resolve first so the
    # LAST one in the padded list deterministically wins.
    n_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, g))
    slot = (cell[..., 1].astype(jnp.int32) * w
            + cell[..., 0].astype(jnp.int32)) * a + best_a
    keep_gt = _mask_duplicate_slots(
        jnp.where(gt_valid, slot, h * w * a), gt_valid)
    ci = jnp.where(keep_gt, cell[..., 0].astype(jnp.int32), w + h)  # x -> W
    cj = jnp.where(keep_gt, cell[..., 1].astype(jnp.int32), w + h)
    ai = best_a
    valid = keep_gt.astype(f32)  # survivors only feed the target scatters

    # coordinate targets in t-space
    t_xy_star = gxy * scale - cell  # in (0,1)
    pw = anc[best_a]  # (N,G,2)
    t_wh_star = jnp.log(jnp.maximum(gwh_grid, 1e-8) / jnp.maximum(pw, 1e-8))

    def scat(values, depth):
        buf = jnp.zeros((n, h, w, a) + ((depth,) if depth else ()), f32)
        return buf.at[n_idx, cj, ci, ai].set(values, mode="drop")

    obj_mask = scat(valid, 0)  # (N,H,W,A) 1 where a GT is assigned
    txy_t = scat(t_xy_star, 2)
    twh_t = scat(t_wh_star, 2)
    cls_t = scat(jax.nn.one_hot(gt_class, c) * valid[..., None], c)
    gt_corner_t = scat(xywh_to_corners(gxy, gwh), 4)
    # per-truth coord weight (2 - w*h), Darknet region layer
    if cfg.coord_area_weight:
        cw = scat(2.0 - gwh.prod(-1), 0)
    else:
        cw = obj_mask

    # ---- objectness target: IoU of predicted box at assigned slots -------
    iou_at = iou_pairwise(pred_corners, gt_corner_t)  # (N,H,W,A)
    obj_target = iou_at if cfg.rescore else jnp.ones_like(iou_at)

    # ---- noobj mask: best IoU with any GT <= thresh and not assigned -----
    # (ALL valid GTs exempt high-IoU predictors here, including duplicates
    # dropped from the scatter above — they are still real objects)
    gt_corners = xywh_to_corners(gxy, gwh)  # (N,G,4)
    pc = pred_corners.reshape(n, h * w * a, 4)
    all_iou = iou_matrix(pc, gt_corners)  # (N,HWA,G)
    all_iou = all_iou * gt_valid.astype(f32)[:, None, :]
    best_iou = jnp.max(all_iou, axis=-1).reshape(n, h, w, a)
    noobj_mask = (best_iou <= cfg.iou_thresh).astype(f32) * (1.0 - obj_mask)

    # ---- terms ------------------------------------------------------------
    per_img = lambda x: jnp.sum(x.reshape(n, -1), axis=-1)
    coord = cfg.coord_scale * per_img(
        cw[..., None] * obj_mask[..., None]
        * (jnp.square(sxy - txy_t) + jnp.square(twh - twh_t))
    )
    obj = cfg.object_scale * per_img(
        obj_mask * jnp.square(conf - jax.lax.stop_gradient(obj_target))
    )
    noobj = cfg.noobject_scale * per_img(noobj_mask * jnp.square(conf))
    cls = cfg.class_scale * per_img(
        obj_mask[..., None] * jnp.square(probs - cls_t)
    )
    terms = {
        "coord": jnp.mean(coord),
        "object": jnp.mean(obj),
        "noobject": jnp.mean(noobj),
        "class": jnp.mean(cls),
    }
    if cfg.prior_scale > 0.0:
        prior = cfg.prior_scale * per_img(
            (1.0 - obj_mask)[..., None]
            * (jnp.square(sxy - 0.5) + jnp.square(twh))
        )
        terms["prior"] = jnp.mean(prior)
    terms["total"] = sum(terms.values())
    return terms


# ---------------------------------------------------------------------------
# YOLOv1
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class YoloV1LossConfig:
    coord_scale: float = 5.0  # lambda_coord
    noobject_scale: float = 0.5  # lambda_noobj
    object_scale: float = 1.0
    class_scale: float = 1.0
    rescore: bool = True  # conf target = IoU (Darknet yolov1 rescore=1)
    sqrt: bool = True  # predictions carry sqrt(w), sqrt(h)


def yolo_v1_loss(
    flat: jax.Array,  # (N, S*S*(C+5B)) raw FC output
    grid: int,
    boxes_per_cell: int,
    num_classes: int,
    gt_xywh: jax.Array,
    gt_class: jax.Array,
    gt_valid: jax.Array,
    cfg: YoloV1LossConfig = YoloV1LossConfig(),
) -> Dict[str, jax.Array]:
    """Fused v1 objective (paper eq. 3). One GT per cell: later GTs in the
    padded list win the cell (enforced by masking earlier duplicates BEFORE
    the scatter — duplicate-index scatter is undefined in XLA, see
    :func:`_mask_duplicate_slots` — so the sequential-overwrite semantics
    hold deterministically; pinned by tests/unit/test_losses.py)."""
    from yolojax.ops.boxes import split_v1_head

    s, b, c = grid, boxes_per_cell, num_classes
    f32 = jnp.float32
    n = flat.shape[0]
    parts = split_v1_head(flat.astype(f32), s, b, c)
    probs = parts["probs"]  # (N,S,S,C)
    conf = parts["conf"]  # (N,S,S,B)
    raw = parts["boxes_raw"]  # (N,S,S,B,4) [x, y, (sqrt)w, (sqrt)h]

    # ---- grid the GTs: one per cell, later wins (deterministically) -------
    g = gt_xywh.shape[1]
    gxy = gt_xywh[..., 0:2].astype(f32)
    gwh = gt_xywh[..., 2:4].astype(f32)
    cell = jnp.clip(jnp.floor(gxy * s), 0, s - 1)
    n_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, g))
    slot = cell[..., 1].astype(jnp.int32) * s + cell[..., 0].astype(jnp.int32)
    keep_gt = _mask_duplicate_slots(
        jnp.where(gt_valid, slot, s * s), gt_valid)
    ci = jnp.where(keep_gt, cell[..., 0].astype(jnp.int32), 2 * s)
    cj = jnp.where(keep_gt, cell[..., 1].astype(jnp.int32), 2 * s)

    def scat(values, depth):
        buf = jnp.zeros((n, s, s) + ((depth,) if depth else ()), f32)
        return buf.at[n_idx, cj, ci].set(values, mode="drop")

    has_obj = scat(keep_gt.astype(f32), 0)  # (N,S,S)
    cell_xy = scat(gxy, 2)
    cell_wh = scat(gwh, 2)
    cell_cls = scat(jax.nn.one_hot(gt_class, c) * keep_gt[..., None], c)

    # ---- decode predictions to normalized boxes ---------------------------
    cxg = jax.lax.broadcasted_iota(f32, (s, s), 1)[None, :, :, None]
    cyg = jax.lax.broadcasted_iota(f32, (s, s), 0)[None, :, :, None]
    px = (raw[..., 0] + cxg) / s
    py = (raw[..., 1] + cyg) / s
    pwh = jnp.square(raw[..., 2:4]) if cfg.sqrt else raw[..., 2:4]
    pred_corners = xywh_to_corners(jnp.stack([px, py], -1), pwh)  # (N,S,S,B,4)

    gt_corners = xywh_to_corners(cell_xy, cell_wh)[..., None, :]  # (N,S,S,1,4)
    iou = iou_pairwise(pred_corners, jnp.broadcast_to(gt_corners,
                                                      pred_corners.shape))
    # responsible box = argmax IoU among the B predictors (N,S,S)
    resp = jax.nn.one_hot(jnp.argmax(iou, axis=-1), b)  # (N,S,S,B)
    resp = resp * has_obj[..., None]

    # ---- targets in prediction space --------------------------------------
    t_xy = cell_xy * s - jnp.floor(cell_xy * s)  # offset within cell (N,S,S,2)
    t_wh = jnp.sqrt(jnp.maximum(cell_wh, 0.0)) if cfg.sqrt else cell_wh

    per_img = lambda x: jnp.sum(x.reshape(n, -1), axis=-1)
    xy_err = jnp.square(raw[..., 0:2] - t_xy[..., None, :]).sum(-1)  # (N,S,S,B)
    wh_err = jnp.square(raw[..., 2:4] - t_wh[..., None, :]).sum(-1)
    coord = cfg.coord_scale * per_img(resp * (xy_err + wh_err))

    conf_target = jax.lax.stop_gradient(iou) if cfg.rescore else 1.0
    obj = cfg.object_scale * per_img(resp * jnp.square(conf - conf_target))
    noobj = cfg.noobject_scale * per_img((1.0 - resp) * jnp.square(conf))
    cls = cfg.class_scale * per_img(
        has_obj[..., None] * jnp.square(probs - cell_cls)
    )
    terms = {
        "coord": jnp.mean(coord),
        "object": jnp.mean(obj),
        "noobject": jnp.mean(noobj),
        "class": jnp.mean(cls),
    }
    terms["total"] = sum(terms.values())
    return terms
