"""Analytic FLOP counter vs the published Darknet BFLOPs numbers."""

import numpy as np

from yolojax.models import get_model
from yolojax.utils.flops import (
    PEAK_BF16, mfu, model_flops_per_image, train_flops_per_image,
)


def test_darknet19_416_matches_published_bflops():
    m = get_model("yolo2", "darknet", num_classes=20)
    g = model_flops_per_image(m, 416) / 1e9
    # Darknet reports ~29.4 BFLOPs for YOLOv2-416 (PERF.md roofline row)
    assert 28.0 < g < 31.0, g


def test_flops_scale_quadratically_with_dim():
    m = get_model("yolo2", "darknet", num_classes=20)
    g416 = model_flops_per_image(m, 416)
    g544 = model_flops_per_image(m, 544)
    np.testing.assert_allclose(g544 / g416, (544 / 416) ** 2, rtol=0.02)


def test_class_count_moves_only_the_head():
    m20 = get_model("yolo2", "darknet", num_classes=20)
    m80 = get_model("yolo2", "darknet", num_classes=80)
    d = model_flops_per_image(m80, 416) - model_flops_per_image(m20, 416)
    # head conv is 1x1 1024 -> 5*(5+C) on a 13x13 grid
    want = 2.0 * 13 * 13 * 1024 * 5 * 60
    np.testing.assert_allclose(d, want, rtol=1e-6)


def test_v1_dense_head_counted():
    m = get_model("yolo", "tiny", num_classes=20)
    # FC layers dominate tiny-v1's tail; the count must include them
    assert model_flops_per_image(m, 448) > 1e9


def test_train_and_mfu_helpers():
    m = get_model("yolo2", "darknet", num_classes=20)
    f = model_flops_per_image(m, 416)
    assert train_flops_per_image(m, 416) == 3.0 * f
    # 4384 img/s at 29.4 GF ≈ 65% of the published bf16 peak
    assert 0.5 < mfu(4384.0, f, PEAK_BF16) < 0.75
