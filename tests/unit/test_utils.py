"""Unit coverage for small utils: per-class colors, StepTimer semantics."""

import math

import numpy as np

from yolojax.utils.draw import class_color, draw_detection
from yolojax.utils.profiling import StepTimer


def test_class_colors_stable_and_distinct():
    colors = [class_color(i) for i in range(20)]
    assert colors == [class_color(i) for i in range(20)]  # deterministic
    assert len(set(colors)) == 20  # VOC classes all get distinct colors
    for c in colors:
        assert all(0 <= v <= 255 for v in c)


def test_draw_detection_writes_pixels():
    img = np.zeros((64, 64, 3), np.uint8)
    draw_detection(img, 8, 8, 40, 40, "cat 0.9", 3)
    assert img.any()
    # box edge carries the class color (BGR)
    b, g, r = class_color(3)
    assert (img[8, 8:40] == (b, g, r)).all(axis=-1).any()


def test_steptimer_zero_steps_is_nan():
    t = StepTimer()
    assert math.isnan(t.mean) and math.isnan(t.last)


def test_steptimer_warmup_mean():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            pass
    assert t.count == 3
    assert not math.isnan(t.mean) and t.mean >= 0
    assert not math.isnan(t.last)
