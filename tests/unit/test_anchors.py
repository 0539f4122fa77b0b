"""IoU k-means anchor estimation (yolojax/data/anchors)."""

import numpy as np
import pytest

from yolojax.data.anchors import _iou_wh, cache_box_shapes, kmeans_anchors


def test_iou_wh_golden():
    wh = np.array([[2.0, 2.0]])
    cents = np.array([[2.0, 2.0], [1.0, 1.0], [4.0, 2.0]])
    got = _iou_wh(wh, cents)[0]
    # identical -> 1; quarter-area contained -> 1/4; half-overlap -> 1/2
    np.testing.assert_allclose(got, [1.0, 0.25, 0.5])


def test_kmeans_recovers_planted_clusters():
    rng = np.random.RandomState(0)
    truth = np.array([[1.0, 1.5], [4.0, 3.0], [9.0, 8.0]])
    wh = np.concatenate([
        t + rng.uniform(-0.05, 0.05, (200, 2)) for t in truth
    ])
    anchors, mean_iou = kmeans_anchors(wh, 3, seed=1)
    # sorted by area ascending, so aligned with truth's order
    np.testing.assert_allclose(anchors, truth, atol=0.1)
    assert mean_iou > 0.95


def test_kmeans_deterministic_per_seed():
    rng = np.random.RandomState(2)
    wh = rng.uniform(0.5, 10.0, (300, 2))
    a1, m1 = kmeans_anchors(wh, 5, seed=7)
    a2, m2 = kmeans_anchors(wh, 5, seed=7)
    np.testing.assert_array_equal(a1, a2)
    assert m1 == m2


def test_kmeans_rejects_too_few_boxes():
    with pytest.raises(ValueError, match="at least k"):
        kmeans_anchors(np.ones((2, 2)), 5)
    with pytest.raises(ValueError, match="must be"):
        kmeans_anchors(np.ones((4, 3)), 2)


def test_cache_box_shapes_letterbox_vs_stretch():
    class FakeCache:
        # one 200x100 image with one normalized box (w=0.5, h=0.5)
        sizes = np.array([[200, 100]])
        offsets = np.array([0, 1])
        boxes = np.array([[0.5, 0.5, 0.5, 0.5]], np.float32)
        difficult = np.zeros(1, bool)

        def __len__(self):
            return 1

    dim = 416
    # stretch: wh_norm * grid = 0.5 * 13 on both axes
    s = cache_box_shapes(FakeCache(), dim, stretch=True)
    np.testing.assert_allclose(s, [[6.5, 6.5]])
    # letterbox: scale = 416/200 = 2.08 -> w = 0.5*200*2.08/32,
    # h = 0.5*100*2.08/32 (aspect preserved, so h is half of w)
    lb = cache_box_shapes(FakeCache(), dim, stretch=False)
    np.testing.assert_allclose(lb, [[6.5, 3.25]])


def test_kmeans_degenerate_identical_boxes():
    # all boxes identical: k-means++ distances are all zero; must not
    # crash, and every centroid collapses onto the single shape
    wh = np.tile([[3.0, 4.0]], (10, 1))
    anchors, mean_iou = kmeans_anchors(wh, 3, seed=0)
    np.testing.assert_allclose(anchors, [[3, 4]] * 3)
    assert mean_iou == 1.0
