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


def test_eval_data_parallel_flag_strict():
    import pytest

    from yolojax.config import EvalConfig

    assert EvalConfig(data_parallel="auto").data_parallel_flag() is None
    assert EvalConfig(data_parallel="on").data_parallel_flag() is True
    assert EvalConfig(data_parallel="0").data_parallel_flag() is False
    with pytest.raises(ValueError, match="data_parallel"):
        EvalConfig(data_parallel="enabled").data_parallel_flag()


def test_loader_shard_lengths_exact():
    """__len__ must match what epoch() actually yields, per shard."""
    from yolojax.data.cache import DatasetCache
    from yolojax.data.loader import Loader, LoaderConfig

    import numpy as np

    n = 10
    cache = DatasetCache(
        paths=np.asarray([f"/nope/{i}.jpg" for i in range(n)]),
        sizes=np.tile([[32, 32]], (n, 1)),
        offsets=np.zeros(n + 1, np.int64),
        boxes=np.zeros((0, 4), np.float32),
        classes=np.zeros((0,), np.int32),
        names=("a",),
    )
    for count in (1, 2, 3, 4):
        for idx in range(count):
            for drop in (False, True):
                cfg = LoaderConfig(batch_size=2, canvas_dim=32, max_boxes=4,
                                   shard_index=idx, shard_count=count,
                                   drop_remainder=drop, use_native=False)
                ld = Loader(cache, cfg)
                shard = len(range(idx, n, count))
                want = shard // 2 if drop else (shard + 1) // 2
                assert len(ld) == want, (count, idx, drop, len(ld), want)
