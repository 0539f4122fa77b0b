"""Batched greedy NMS as a Pallas TPU kernel.

North-star requirement (BASELINE.json): detect-time output never leaves the
chip — the reference ran ``tf.image.non_max_suppression`` per image on the
host CPU (SURVEY.md §2 native-capability table).

Algorithm (identical semantics to :func:`yolojax.postprocess.nms.nms_greedy_lax`
and the numpy oracle in tests): candidates arrive score-sorted; box ``i`` is
kept iff it is valid and no earlier *kept* box overlaps it with IoU >
threshold. Greedy suppression is inherently sequential in ``i``, so the
kernel keeps the O(K^2) IoU matrix in VMEM and runs one K-step sweep — but
sweeps a whole *chunk* of images per grid program simultaneously (the
dependence is only along K, never along batch), so every VPU op in the inner
loop works on (CHUNK, K) lanes instead of (K,).

VMEM budget per program: IoU tensor (CHUNK, K, K) f32 = 8*256*256*4 = 2 MB,
well under the ~16 MB budget.

Layout notes: boxes are passed transposed as (N, 4, K) so each coordinate
row is a clean (CHUNK, K) lane vector; K must be a multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 16  # 16x256x256 f32 overlap = 4MB VMEM; halves sweep programs vs 8


def _nms_kernel(iou_thresh: float, k: int, boxes_ref, valid_ref, keep_ref,
                overlap_ref):
    """One grid program: greedy sweep for a (CHUNK, K) slab of candidates.

    boxes_ref:   (C, 4, K) f32 corner boxes (ymin, xmin, ymax, xmax rows),
                 already class-offset and score-sorted (descending).
    valid_ref:   (C, K) f32 0/1 score-threshold mask.
    keep_ref:    (C, K) f32 output keep mask.
    overlap_ref: (C, K, K) f32 VMEM scratch — the O(K^2) overlap matrix.
                 Mosaic has no dynamic_slice on *values*, so the sweep
                 indexes this ref (and valid/keep refs) with pl.ds instead.
    """
    c = boxes_ref.shape[0]
    y0 = boxes_ref[:, 0, :]  # (C, K)
    x0 = boxes_ref[:, 1, :]
    y1 = boxes_ref[:, 2, :]
    x1 = boxes_ref[:, 3, :]

    def col(v):  # (C, K) -> (C, K, 1)
        return v.reshape(c, k, 1)

    def row(v):  # (C, K) -> (C, 1, K)
        return v.reshape(c, 1, k)

    ih = jnp.maximum(
        jnp.minimum(col(y1), row(y1)) - jnp.maximum(col(y0), row(y0)), 0.0
    )
    iw = jnp.maximum(
        jnp.minimum(col(x1), row(x1)) - jnp.maximum(col(x0), row(x0)), 0.0
    )
    inter = ih * iw  # (C, K, K)
    area = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)  # (C, K)
    union = col(area) + row(area) - inter
    iou = inter / jnp.maximum(union, 1e-10)
    overlap_ref[:, :, :] = (iou > iou_thresh).astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1, K)
    valid = valid_ref[:, :]  # (C, K)

    def body(i, keep):
        # Row i of the overlap matrix for every image in the chunk. The
        # sublane dim (axis 1) supports dynamic pl.ds slicing; the lane dim
        # does NOT support dynamic scalar loads/stores on TPU, so the
        # column-i select/update below uses lane==i masks instead.
        orow = overlap_ref[:, pl.ds(i, 1), :].reshape(c, k)
        earlier = (lane < i).astype(jnp.float32)  # (1, K)
        sup = jnp.sum(keep * orow * earlier, axis=1, keepdims=True)  # (C, 1)
        is_i = (lane == i).astype(jnp.float32)  # (1, K)
        valid_i = jnp.sum(valid * is_i, axis=1, keepdims=True)  # (C, 1)
        keep_i = valid_i * (1.0 - jnp.minimum(sup, 1.0))
        return keep + is_i * keep_i  # column i was 0 until now

    keep = lax.fori_loop(0, k, body, jnp.zeros((c, k), jnp.float32))
    keep_ref[:, :] = keep


@functools.partial(jax.jit, static_argnames=("iou_thresh", "chunk"))
def nms_greedy_pallas(
    boxes: jax.Array,
    valid: jax.Array,
    iou_thresh: float,
    *,
    chunk: int = DEFAULT_CHUNK,
) -> jax.Array:
    """Batched greedy NMS. boxes (N, K, 4) score-sorted, valid (N, K) bool.

    Returns keep mask (N, K) bool. K is padded up to a multiple of 128
    internally (appended candidates are invalid and score-last, so they
    cannot suppress real ones); N is padded up to a multiple of ``chunk``.
    """
    n, k_in, _ = boxes.shape
    k_pad = (-k_in) % 128
    if k_pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, k_pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, k_pad)))
    k = k_in + k_pad
    c = min(chunk, n) if n > 0 else 1
    n_pad = (-n) % c
    boxes_t = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (N, 4, K)
    valid_f = valid.astype(jnp.float32)
    if n_pad:
        boxes_t = jnp.pad(boxes_t, ((0, n_pad), (0, 0), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, n_pad), (0, 0)))
    total = boxes_t.shape[0]

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thresh, k),
        out_shape=jax.ShapeDtypeStruct((total, k), jnp.float32),
        grid=(total // c,),
        in_specs=[
            pl.BlockSpec((c, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, k, k), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=total * (7 * k * k + 6 * k * k),
            bytes_accessed=total * k * (4 * 4 + 4 + 4),
            transcendentals=0,
        ),
    )(boxes_t, valid_f)
    return keep[:n, :k_in] > 0.5
