"""Box geometry + YOLO head decode, pure JAX (vectorized, jit/shard safe).

Replaces the reference's ``utils/postprocess.py`` IoU helpers and the decode
math in ``detect.py`` / ``model/*/function.py`` (SURVEY.md §2, §3.3). All
functions are shape-polymorphic over leading batch dims and contain no
Python control flow, so they trace once and fuse.

Coordinate convention: normalized image coordinates in [0, 1];
corner boxes are (ymin, xmin, ymax, xmax) — matching
``tf.image.non_max_suppression``'s convention that the reference used.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def xywh_to_corners(xy: jax.Array, wh: jax.Array) -> jax.Array:
    """(cx, cy), (w, h) -> (ymin, xmin, ymax, xmax), stacked on last axis."""
    half = wh * 0.5
    return jnp.stack(
        [
            xy[..., 1] - half[..., 1],
            xy[..., 0] - half[..., 0],
            xy[..., 1] + half[..., 1],
            xy[..., 0] + half[..., 0],
        ],
        axis=-1,
    )


def corners_to_xywh(boxes: jax.Array) -> Tuple[jax.Array, jax.Array]:
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    xy = jnp.concatenate([(xmin + xmax) * 0.5, (ymin + ymax) * 0.5], axis=-1)
    wh = jnp.concatenate([xmax - xmin, ymax - ymin], axis=-1)
    return xy, wh


def _area(b: jax.Array) -> jax.Array:
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(
        b[..., 3] - b[..., 1], 0
    )


def iou_pairwise(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU of corner boxes, broadcasting over leading dims. (..., 4) -> (...)."""
    lo = jnp.maximum(a[..., :2], b[..., :2])
    hi = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0), axis=-1)
    union = _area(a) + _area(b) - inter
    return inter / jnp.maximum(union, 1e-10)


def iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """All-pairs IoU: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    return iou_pairwise(a[..., :, None, :], b[..., None, :, :])


# ---------------------------------------------------------------------------
# YOLOv2 decode (arXiv:1612.08242 §2; SURVEY.md §3.3 [H])
# ---------------------------------------------------------------------------


def decode_v2(
    head: jax.Array,
    anchors: Sequence[Tuple[float, float]],
) -> Dict[str, jax.Array]:
    """Decode a raw v2 head (N, H, W, A, 5+C) to normalized boxes.

    bx = (sigma(tx) + cx) / W,  by = (sigma(ty) + cy) / H
    bw = pw * exp(tw) / W,      bh = ph * exp(th) / H
    conf = sigma(to),           probs = softmax(tc)

    Returns dict with xy (N,H,W,A,2), wh (N,H,W,A,2), corners (N,H,W,A,4),
    conf (N,H,W,A), probs (N,H,W,A,C), scores = conf*probs.
    """
    h, w = head.shape[-4], head.shape[-3]
    anc = jnp.asarray(anchors, jnp.float32)  # (A, 2) in grid units
    cx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    grid = jnp.stack([cx, cy], axis=-1)[..., None, :]  # (H, W, 1, 2)
    scale = jnp.asarray([w, h], jnp.float32)

    txy = head[..., 0:2]
    twh = head[..., 2:4]
    to = head[..., 4]
    tc = head[..., 5:]

    xy = (jax.nn.sigmoid(txy) + grid) / scale
    wh = anc * jnp.exp(twh) / scale
    conf = jax.nn.sigmoid(to)
    probs = jax.nn.softmax(tc, axis=-1)
    corners = xywh_to_corners(xy, wh)
    return {
        "xy": xy,
        "wh": wh,
        "corners": corners,
        "conf": conf,
        "probs": probs,
        "scores": conf[..., None] * probs,
    }


# ---------------------------------------------------------------------------
# YOLOv1 head split + decode (arXiv:1506.02640 §2; Darknet detection layer)
# ---------------------------------------------------------------------------


def split_v1_head(
    flat: jax.Array, grid: int, boxes_per_cell: int, num_classes: int
) -> Dict[str, jax.Array]:
    """Split the flat v1 FC output into Darknet detection-layer order:
    [S*S*C class probs, S*S*B confidences, S*S*B*4 boxes].

    Returns probs (N,S,S,C), conf (N,S,S,B), boxes_raw (N,S,S,B,4).
    """
    s, b, c = grid, boxes_per_cell, num_classes
    n = flat.shape[0]
    probs = flat[:, : s * s * c].reshape(n, s, s, c)
    conf = flat[:, s * s * c : s * s * (c + b)].reshape(n, s, s, b)
    boxes = flat[:, s * s * (c + b) :].reshape(n, s, s, b, 4)
    return {"probs": probs, "conf": conf, "boxes_raw": boxes}


def decode_v1(
    flat: jax.Array,
    grid: int,
    boxes_per_cell: int,
    num_classes: int,
    *,
    sqrt: bool = True,
) -> Dict[str, jax.Array]:
    """Decode v1: x,y are cell-relative offsets; w,h are sqrt-space when
    ``sqrt`` (Darknet yolov1 cfg sqrt=1), normalized to the image.
    """
    parts = split_v1_head(flat, grid, boxes_per_cell, num_classes)
    raw = parts["boxes_raw"]
    s = grid
    cx = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)[None, :, :, None]
    cy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)[None, :, :, None]
    x = (raw[..., 0] + cx) / s
    y = (raw[..., 1] + cy) / s
    if sqrt:
        wh = jnp.square(raw[..., 2:4])
    else:
        wh = raw[..., 2:4]
    xy = jnp.stack([x, y], axis=-1)
    corners = xywh_to_corners(xy, wh)
    scores = parts["conf"][..., None] * parts["probs"][..., None, :]
    return {
        "xy": xy,
        "wh": wh,
        "corners": corners,
        "conf": parts["conf"],
        "probs": parts["probs"],
        "scores": scores,  # (N, S, S, B, C)
    }
