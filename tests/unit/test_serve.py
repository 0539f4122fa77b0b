"""AOT serving artifacts (yolojax/serve): exact roundtrip, header
integrity, platform gating. The CLI surface (cli/export.py +
cli/detect.py --artifact) is covered by tests/e2e/test_cli.py::test_27."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.convert.fold import fold_bn
from yolojax.eval.evaluator import make_infer_fn
from yolojax.models import get_model
from yolojax.serve import MAGIC, load_artifact, save_artifact


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    model = get_model("yolo2", "tiny", num_classes=3,
                      anchors=((1.0, 1.0), (2.0, 2.0)))
    params, state = model.init(jax.random.PRNGKey(0), 64)
    model, params, state = fold_bn(model, params, state)
    infer_fn = make_infer_fn(model, score_thresh=0.001, iou_thresh=0.45,
                             top_k=32, compute_dtype=jnp.float32)
    path = str(tmp_path_factory.mktemp("art") / "m.yjsa")
    meta = save_artifact(path, infer_fn, params, state, batch=2, dim=64,
                        meta={"names": ["a", "b", "c"], "stretch": False})
    return path, meta, infer_fn, params, state


def test_roundtrip_exact(exported):
    path, meta, infer_fn, params, state = exported
    assert meta["platforms"] == ["cpu"] and meta["payload_bytes"] > 1e6
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                           jnp.float32)
    want = jax.device_get(infer_fn(params, state, x))
    art = load_artifact(path)
    assert art.meta["names"] == ["a", "b", "c"]
    got = jax.device_get(art(x))
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]))


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.yjsa"
    p.write_bytes(b"not an artifact at all")
    with pytest.raises(ValueError, match="bad magic"):
        load_artifact(str(p))


def test_corrupt_metadata_rejected(tmp_path):
    p = tmp_path / "trunc.yjsa"
    blob = b'{"truncated'
    p.write_bytes(MAGIC + len(blob).to_bytes(4, "little") + blob)
    with pytest.raises(ValueError, match="corrupt artifact metadata"):
        load_artifact(str(p))


def test_platform_mismatch_rejected(exported, tmp_path):
    path = exported[0]
    raw = open(path, "rb").read()
    n = int.from_bytes(raw[len(MAGIC):len(MAGIC) + 4], "little")
    meta = json.loads(raw[len(MAGIC) + 4:len(MAGIC) + 4 + n])
    meta["platforms"] = ["tpu"]  # pretend it was exported elsewhere
    blob = json.dumps(meta).encode()
    p = tmp_path / "tpu.yjsa"
    p.write_bytes(MAGIC + len(blob).to_bytes(4, "little") + blob
                  + raw[len(MAGIC) + 4 + n:])
    with pytest.raises(ValueError, match="exported for"):
        load_artifact(str(p))


def test_directory_rejected(tmp_path):
    # a SavedModel export dir passed to --artifact must get the friendly
    # error, not an IsADirectoryError traceback
    from yolojax.serve import load_artifact

    with pytest.raises(ValueError, match="directory"):
        load_artifact(str(tmp_path))


def test_tflite_handed_to_artifact_gets_a_hint(tmp_path):
    p = tmp_path / "model.tflite"
    p.write_bytes(b"TFL3 flatbuffer bytes")
    with pytest.raises(ValueError, match="TFLite interpreter"):
        load_artifact(str(p))
