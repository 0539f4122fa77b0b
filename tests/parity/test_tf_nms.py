"""NMS parity against ``tf.image.non_max_suppression`` — the EXACT kernel
the reference called (SURVEY.md §2 native-capability table: its per-image
CPU C++ NMS is the op our batched on-device sweep replaces).

Both implementations suppress on strict ``IoU > threshold`` over
descending-score candidates, so on tie-free random inputs the kept sets
must agree exactly — kernel-level (nms_greedy_lax on pre-sorted boxes vs
one TF call) and pipeline-level (class-offset single-pass per-class NMS vs
the reference's per-class TF loop).
"""

import numpy as np
import jax.numpy as jnp

import tensorflow as tf

from yolojax.postprocess.nms import _run_nms, nms_greedy_lax


def _random_corners(rng, m):
    """Well-formed (ymin, xmin, ymax, xmax) boxes in [0, 1]."""
    cy = rng.uniform(0.1, 0.9, m)
    cx = rng.uniform(0.1, 0.9, m)
    h = rng.uniform(0.05, 0.4, m)
    w = rng.uniform(0.05, 0.4, m)
    return np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2],
                    axis=-1).astype(np.float32)


def test_greedy_sweep_matches_tf_kernel():
    """Single-class: our lax sweep on sorted candidates == one TF NMS call."""
    for seed in range(5):
        rng = np.random.RandomState(seed)
        m = 120
        boxes = _random_corners(rng, m)
        scores = rng.uniform(0.01, 1.0, m).astype(np.float32)  # tie-free
        for iou_thresh in (0.3, 0.5):
            order = np.argsort(-scores)
            keep = np.asarray(nms_greedy_lax(
                jnp.asarray(boxes[order]), jnp.ones(m, bool), iou_thresh))
            ours = sorted(order[keep].tolist())

            sel = tf.image.non_max_suppression(
                boxes, scores, max_output_size=m, iou_threshold=iou_thresh
            ).numpy()
            assert ours == sorted(sel.tolist()), (seed, iou_thresh)


def test_pipeline_matches_reference_per_class_tf_loop():
    """Full batched pipeline (top-k, class offset, one sweep) == the
    reference's per-class threshold + tf.image.non_max_suppression loop."""
    n, m, c = 3, 150, 4
    score_thresh, iou_thresh = 0.25, 0.4
    rng = np.random.RandomState(7)
    corners = np.stack([_random_corners(rng, m) for _ in range(n)])
    scores = rng.uniform(0.0, 1.0, (n, m, c)).astype(np.float32)

    out = _run_nms(jnp.asarray(corners), jnp.asarray(scores),
                   score_thresh, iou_thresh, top_k=m * c,
                   use_pallas="never", candidates="exact")
    keep = np.asarray(out["keep"])
    ours = {
        (img, int(out["classes"][img, k]),
         round(float(out["scores"][img, k]), 6))
        for img in range(n) for k in range(keep.shape[1]) if keep[img, k]
    }

    want = set()
    for img in range(n):
        for cls in range(c):
            cand = np.where(scores[img, :, cls] > score_thresh)[0]
            if not len(cand):
                continue
            sel = tf.image.non_max_suppression(
                corners[img, cand], scores[img, cand, cls],
                max_output_size=m, iou_threshold=iou_thresh).numpy()
            for i in cand[sel]:
                want.add((img, cls, round(float(scores[img, i, cls]), 6)))
    assert ours == want
