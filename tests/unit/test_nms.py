"""NMS correctness: lax reference and Pallas kernel vs a numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from yolojax.postprocess.nms import (
    CLASS_OFFSET,
    batched_nms,
    nms_greedy_lax,
    postprocess_v2,
)


def numpy_nms_oracle(boxes, valid, iou_thresh):
    """Greedy NMS over score-sorted corner boxes; keep[i] iff valid and not
    suppressed by an earlier kept box."""
    k = boxes.shape[0]
    keep = np.zeros(k, bool)

    def iou(a, b):
        lo = np.maximum(a[:2], b[:2])
        hi = np.minimum(a[2:], b[2:])
        inter = np.prod(np.maximum(hi - lo, 0))
        area = lambda x: max(x[2] - x[0], 0) * max(x[3] - x[1], 0)
        u = area(a) + area(b) - inter
        return inter / max(u, 1e-10)

    for i in range(k):
        if not valid[i]:
            continue
        sup = any(keep[j] and iou(boxes[j], boxes[i]) > iou_thresh for j in range(i))
        keep[i] = not sup
    return keep


def _random_case(rng, n, k):
    xy = rng.uniform(0, 1, (n, k, 2))
    wh = rng.uniform(0.02, 0.4, (n, k, 2))
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32)
    valid = rng.uniform(size=(n, k)) > 0.2
    return boxes, valid


@pytest.mark.parametrize("iou_thresh", [0.3, 0.5])
def test_lax_nms_matches_oracle(iou_thresh):
    rng = np.random.RandomState(0)
    boxes, valid = _random_case(rng, 4, 128)
    got = np.asarray(
        batched_nms(jnp.asarray(boxes), jnp.asarray(valid), iou_thresh,
                    use_pallas="never")
    )
    for i in range(boxes.shape[0]):
        want = numpy_nms_oracle(boxes[i], valid[i], iou_thresh)
        np.testing.assert_array_equal(got[i], want)


def test_pallas_nms_matches_lax_interpret():
    # Pallas kernel in interpreter mode on CPU vs the lax reference.
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(1)
    boxes, valid = _random_case(rng, 10, 128)  # N=10 exercises chunk padding
    jb, jv = jnp.asarray(boxes), jnp.asarray(valid)
    want = np.asarray(batched_nms(jb, jv, 0.45, use_pallas="never"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(batched_nms(jb, jv, 0.45, use_pallas="always"))
    np.testing.assert_array_equal(got, want)


def test_pallas_nms_pads_non_multiple_of_128_k():
    # K=100 (postprocess default-ish values must not crash on TPU); the
    # kernel pads K up to 128 internally with invalid candidates.
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(7)
    boxes, valid = _random_case(rng, 3, 100)
    jb, jv = jnp.asarray(boxes), jnp.asarray(valid)
    want = np.asarray(batched_nms(jb, jv, 0.45, use_pallas="never"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(batched_nms(jb, jv, 0.45, use_pallas="always"))
    assert got.shape == (3, 100)
    np.testing.assert_array_equal(got, want)


def test_all_identical_boxes_keeps_first():
    boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.5, 0.5]], jnp.float32), (128, 1))
    valid = jnp.ones((128,), bool)
    keep = nms_greedy_lax(boxes, valid, 0.5)
    keep = np.asarray(keep)
    assert keep[0] and not keep[1:].any()


def test_postprocess_v2_end_to_end():
    # Construct a head whose decode yields one dominant box per image.
    n, h, w, a, c = 2, 13, 13, 5, 20
    head = np.full((n, h, w, a, 5 + c), -10.0, np.float32)
    # strong detection at cell (6, 6), anchor 0, class 3
    head[:, 6, 6, 0, 0:2] = 0.0  # sigma(0)=0.5 -> center (6.5/13, 6.5/13)
    head[:, 6, 6, 0, 4] = 10.0  # objectness
    head[:, 6, 6, 0, 5 + 3] = 10.0  # class logit
    anchors = ((1.32, 1.73), (3.19, 4.0), (5.05, 8.1), (9.47, 4.84), (11.2, 10.0))
    out = postprocess_v2(
        jnp.asarray(head), anchors, score_thresh=0.5, iou_thresh=0.4,
        top_k=128, use_pallas="never",
    )
    keep = np.asarray(out["keep"])
    classes = np.asarray(out["classes"])
    boxes = np.asarray(out["boxes"])
    for i in range(n):
        kept = np.where(keep[i])[0]
        assert len(kept) == 1
        assert classes[i, kept[0]] == 3
        y0, x0, y1, x1 = boxes[i, kept[0]]
        # center should be at cell (6,6) + 0.5 -> 6.5/13 = 0.5
        assert abs((y0 + y1) / 2 - 0.5) < 1e-3
        assert abs((x0 + x1) / 2 - 0.5) < 1e-3


def test_class_offset_separates_classes():
    # Two perfectly overlapping boxes of different classes must both survive.
    box = np.asarray([0.2, 0.2, 0.6, 0.6], np.float32)
    k = 128
    boxes = np.zeros((1, k, 4), np.float32)
    boxes[0, 0] = box
    boxes[0, 1] = box + 1 * CLASS_OFFSET  # class 1 shifted
    valid = np.zeros((1, k), bool)
    valid[0, :2] = True
    keep = np.asarray(batched_nms(jnp.asarray(boxes), jnp.asarray(valid), 0.5,
                                  use_pallas="never"))
    assert keep[0, 0] and keep[0, 1]


def test_postprocess_v1_end_to_end():
    """v1 flat head with one strong box -> postprocess recovers it."""
    from yolojax.postprocess.nms import postprocess_v1

    s, b, c = 7, 2, 20
    probs = np.zeros((1, s, s, c), np.float32)
    conf = np.zeros((1, s, s, b), np.float32)
    raw = np.zeros((1, s, s, b, 4), np.float32)
    # box at cell (3, 2), predictor 1: center offset (.5, .5), sqrt-wh .5
    probs[0, 3, 2, 5] = 1.0
    conf[0, 3, 2, 1] = 0.9
    raw[0, 3, 2, 1] = [0.5, 0.5, 0.5, 0.5]
    flat = np.concatenate(
        [probs.reshape(1, -1), conf.reshape(1, -1), raw.reshape(1, -1)], -1)
    out = postprocess_v1(jnp.asarray(flat), s, b, c, score_thresh=0.5,
                         iou_thresh=0.4, top_k=128, use_pallas="never")
    keep = np.asarray(out["keep"][0])
    kept = np.where(keep)[0]
    assert len(kept) == 1
    assert int(out["classes"][0, kept[0]]) == 5
    y0, x0, y1, x1 = np.asarray(out["boxes"][0, kept[0]])
    np.testing.assert_allclose((x0 + x1) / 2, 2.5 / 7, atol=1e-5)
    np.testing.assert_allclose((y0 + y1) / 2, 3.5 / 7, atol=1e-5)
    np.testing.assert_allclose(x1 - x0, 0.25, atol=1e-5)  # (0.5)^2 sqrt-space
