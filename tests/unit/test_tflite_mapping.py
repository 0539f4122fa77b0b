"""Unit tests for the TFLite output mapping (yolojax/serve/tflite.py):
the serving quartet is identified by (dtype, rank) because the TFLite
converter mangles tensor names — mis-assignment or silently dropped
outputs must fail loudly."""

import numpy as np
import pytest

from yolojax.serve.tflite import _signature_outputs


def _d(name, dtype, shape, index):
    return {"name": name, "dtype": dtype, "shape": np.asarray(shape),
            "index": index}


def test_maps_quartet_by_dtype_and_rank():
    outs = [
        _d("Identity", np.float32, [1, 16, 4], 7),     # boxes
        _d("Identity_1", np.float32, [1, 16], 3),      # scores
        _d("Identity_2", np.int32, [1, 16], 5),        # classes
        _d("Identity_3", np.bool_, [1, 16], 9),        # keep
    ]
    m = _signature_outputs(outs, batch=1, top_k=16)
    assert m == {"boxes": 7, "scores": 3, "classes": 5, "keep": 9}


def test_int64_classes_accepted():
    outs = [
        _d("a", np.float32, [1, 8, 4], 0),
        _d("b", np.float32, [1, 8], 1),
        _d("c", np.int64, [1, 8], 2),
        _d("d", np.bool_, [1, 8], 3),
    ]
    assert _signature_outputs(outs, 1, 8)["classes"] == 2


def test_missing_output_fails_loudly():
    outs = [
        _d("a", np.float32, [1, 8, 4], 0),
        _d("b", np.float32, [1, 8], 1),
        _d("c", np.int32, [1, 8], 2),
    ]
    with pytest.raises(ValueError, match="missing outputs.*keep"):
        _signature_outputs(outs, 1, 8)


def test_duplicate_output_fails_loudly():
    outs = [
        _d("a", np.float32, [1, 8], 0),
        _d("b", np.float32, [1, 8], 1),
    ]
    with pytest.raises(ValueError, match="duplicate"):
        _signature_outputs(outs, 1, 8)


def test_unexpected_dtype_fails_loudly():
    outs = [_d("a", np.float64, [1, 8], 0)]
    with pytest.raises(ValueError, match="unexpected"):
        _signature_outputs(outs, 1, 8)
