"""Detection post-processing: confidence threshold + per-class greedy NMS.

Replaces the reference's ``utils/postprocess.non_max_suppress`` (SURVEY.md
§2) which called ``tf.image.non_max_suppression`` — a per-image CPU C++
kernel. Here the whole pipeline is batched and on-device:

  decode -> top-K candidate select -> class-offset trick -> greedy NMS

The greedy sweep exists twice with identical semantics:
  * :func:`nms_greedy_lax` — pure ``lax.fori_loop`` reference (any backend)
  * :func:`yolojax.postprocess.pallas_nms.nms_greedy_pallas` — Pallas TPU
    kernel (north-star requirement: detect output never leaves chip)

Per-class NMS in one pass: each surviving (box, class) candidate's corners
are shifted by ``class_id * OFFSET`` so boxes of different classes can never
overlap; one class-agnostic greedy sweep then equals per-class NMS — same
result as the reference's per-class loop.

Candidates are pre-sorted by descending score (jnp.top_k), which fixes the
tie-breaking order; the numpy oracle in tests replicates it.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

CLASS_OFFSET = 4.0  # > any normalized box extent


def nms_greedy_lax(
    boxes: jax.Array, valid: jax.Array, iou_thresh: float
) -> jax.Array:
    """Greedy NMS sweep over score-sorted candidates. Returns keep mask.

    boxes: (K, 4) corner boxes sorted by descending score.
    valid: (K,) bool — candidates already below the score threshold.
    """
    k = boxes.shape[0]
    from yolojax.ops.boxes import iou_matrix

    iou = iou_matrix(boxes, boxes)  # (K, K)
    idx = jnp.arange(k)

    def body(i, keep):
        # suppressed if any earlier kept box overlaps > thresh
        earlier = (idx < i) & keep
        sup = jnp.any(earlier & (iou[i] > iou_thresh))
        return keep.at[i].set(valid[i] & ~sup)

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return keep


def batched_nms(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    *,
    use_pallas: str = "auto",
) -> jax.Array:
    """vmapped greedy NMS over a batch. boxes (N,K,4), valid (N,K) -> (N,K).

    ``use_pallas``: "auto" (TPU only), "never", "always".
    """
    if use_pallas == "auto":
        use_pallas = (
            "always" if jax.default_backend() == "tpu" else "never"
        )
    if use_pallas == "always":
        from yolojax.postprocess.pallas_nms import nms_greedy_pallas

        return nms_greedy_pallas(boxes, valid, iou_thresh)
    return jax.vmap(lambda b, v: nms_greedy_lax(b, v, iou_thresh))(boxes, valid)


def _select_candidates(
    corners: jax.Array,  # (N, M, 4)
    scores: jax.Array,  # (N, M, C) conf * class prob
    score_thresh: float,
    top_k: int,
    candidates: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Top-K (box, class) candidates per image, sorted by descending score.

    ``candidates``: "exact" uses lax.top_k (full sort — the TPU TopK
    custom-call costs ~3 ms at (128, 17k), pure latency, ~0.03% of its
    bandwidth); "approx" uses lax.approx_max_k (TPU PartialReduce,
    recall ~0.95 on the tail of the K candidates — the misses are the
    lowest-scored pre-NMS candidates, overwhelmingly below the score
    threshold anyway); "auto" = approx on TPU, exact elsewhere.
    """
    n, m, c = scores.shape
    flat = scores.reshape(n, m * c)
    # small grids (low input dim) can have fewer candidates than top_k;
    # clamp — downstream handles any K (the Pallas kernel pads to 128)
    top_k = min(top_k, m * c)
    if candidates == "auto":
        candidates = "approx" if jax.default_backend() == "tpu" else "exact"
    if candidates == "approx":
        # aggregate_to_topk=True returns the collected candidates reduced
        # to an exact, descending-sorted top-k — NMS order is deterministic
        top_scores, top_idx = jax.lax.approx_max_k(
            flat, top_k, recall_target=0.95)
    else:
        top_scores, top_idx = jax.lax.top_k(flat, top_k)  # (N, K)
    box_idx = top_idx // c
    cls_idx = top_idx % c
    top_boxes = jnp.take_along_axis(corners, box_idx[..., None], axis=1)
    valid = top_scores > score_thresh
    return top_boxes, top_scores, cls_idx, valid


def _run_nms(
    corners, scores, score_thresh, iou_thresh, top_k, use_pallas,
    candidates="auto",
) -> Dict[str, jax.Array]:
    boxes, top_scores, classes, valid = _select_candidates(
        corners, scores, score_thresh, top_k, candidates
    )
    shifted = boxes + (classes.astype(jnp.float32) * CLASS_OFFSET)[..., None]
    keep = batched_nms(shifted, valid, iou_thresh, use_pallas=use_pallas)
    return {
        "boxes": boxes,  # (N, K, 4) normalized corners
        "scores": top_scores,  # (N, K)
        "classes": classes,  # (N, K) int
        "keep": keep,  # (N, K) bool
    }


@functools.partial(
    jax.jit,
    static_argnames=("anchors", "score_thresh", "iou_thresh", "top_k",
                     "use_pallas", "candidates"),
)
def postprocess_v2(
    head: jax.Array,
    anchors: Tuple[Tuple[float, float], ...],
    score_thresh: float = 0.3,
    iou_thresh: float = 0.4,
    top_k: int = 256,
    use_pallas: str = "auto",
    candidates: str = "auto",
) -> Dict[str, jax.Array]:
    """Full v2 detect postprocess: raw head (N,H,W,A,5+C) -> detections."""
    from yolojax.ops.boxes import decode_v2

    dec = decode_v2(head, anchors)
    n = head.shape[0]
    m = head.shape[1] * head.shape[2] * head.shape[3]
    corners = dec["corners"].reshape(n, m, 4)
    scores = dec["scores"].reshape(n, m, -1)
    return _run_nms(corners, scores, score_thresh, iou_thresh, top_k,
                    use_pallas, candidates)


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "boxes_per_cell", "num_classes", "score_thresh",
        "iou_thresh", "top_k", "use_pallas", "sqrt", "candidates",
    ),
)
def postprocess_v1(
    flat: jax.Array,
    grid: int,
    boxes_per_cell: int,
    num_classes: int,
    score_thresh: float = 0.2,
    iou_thresh: float = 0.4,
    # 128, not 64: the Pallas kernel requires K % 128 == 0, and on TPU
    # use_pallas="auto" resolves to the kernel — a 64 default would raise.
    top_k: int = 128,
    use_pallas: str = "auto",
    sqrt: bool = True,
    candidates: str = "auto",
) -> Dict[str, jax.Array]:
    """v1 detect postprocess: flat FC head (N, S*S*(C+5B)) -> detections."""
    from yolojax.ops.boxes import decode_v1

    dec = decode_v1(flat, grid, boxes_per_cell, num_classes, sqrt=sqrt)
    n = flat.shape[0]
    m = grid * grid * boxes_per_cell
    corners = dec["corners"].reshape(n, m, 4)
    scores = dec["scores"].reshape(n, m, num_classes)
    return _run_nms(corners, scores, score_thresh, iou_thresh, top_k,
                    use_pallas, candidates)
