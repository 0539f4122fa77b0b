"""COCO JSON parser unit test (synthetic instances file)."""

import json
import os

import numpy as np

from yolojax.data.cache import build_cache, load_cache, parse_coco


def _write_coco(tmp_path):
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 200, "height": 100},
            {"id": 2, "file_name": "b.jpg", "width": 100, "height": 100},
        ],
        "categories": [
            {"id": 7, "name": "car"},
            {"id": 3, "name": "cat"},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 7, "bbox": [50, 25, 100, 50],
             "iscrowd": 0},
            {"image_id": 1, "category_id": 3, "bbox": [0, 0, 20, 20],
             "iscrowd": 0},
            {"image_id": 1, "category_id": 3, "bbox": [0, 0, 9, 9],
             "iscrowd": 1},  # crowd: skipped
            # image 2 has no annotations
        ],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(ann))
    return str(p)


def test_parse_coco(tmp_path):
    ann = _write_coco(tmp_path)
    examples, names = parse_coco(ann, "/imgs")
    assert names == ("cat", "car")  # sorted by category id (3, 7)
    by_path = {os.path.basename(p): objs for p, _, objs in examples}
    a = by_path["a.jpg"]
    assert len(a) == 2  # crowd skipped
    cls, cx, cy, w, h, diff = a[0]
    assert cls == 1  # car is index 1
    assert diff == 0  # COCO objects are never 'difficult'
    np.testing.assert_allclose([cx, cy, w, h], [0.5, 0.5, 0.5, 0.5])
    assert by_path["b.jpg"] == []


def test_build_cache_coco(tmp_path):
    ann = _write_coco(tmp_path)
    out = str(tmp_path / "cache")
    cache = build_cache(out, "train",
                        [{"kind": "coco", "ann_json": ann,
                          "image_dir": "/imgs"}], names=None)
    assert len(cache) == 2
    assert cache.names == ("cat", "car")
    loaded = load_cache(out, "train")
    assert len(loaded.classes) == 2


def test_parse_coco_honors_provided_names(tmp_path):
    """Caller-provided names ordering wins (regression: indices used to map
    by sorted category id, disagreeing with the names.txt written)."""
    import pytest

    ann = _write_coco(tmp_path)
    examples, names = parse_coco(ann, "/imgs", names=("car", "dog", "cat"))
    assert names == ("car", "dog", "cat")
    by_path = {os.path.basename(p): objs for p, _, objs in examples}
    a = by_path["a.jpg"]
    assert a[0][0] == 0  # car -> index 0 in the provided list
    assert a[1][0] == 2  # cat -> index 2

    with pytest.raises(ValueError, match="car"):
        parse_coco(ann, "/imgs", names=("cat", "bus"))
