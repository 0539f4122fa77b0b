"""TF SavedModel export (yolojax/serve/savedmodel): the jax2tf bridge to
the reference's own serving runtime. Verifies the exported graph matches
the live jitted portable path exactly, carries names/meta, and enforces
the fixed input signature. The CLI surface (cli/export.py
--format savedmodel) is covered by tests/e2e/test_cli.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.convert.fold import fold_bn
from yolojax.eval.evaluator import make_infer_fn
from yolojax.models import get_model

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    model = get_model("yolo2", "tiny", num_classes=3,
                      anchors=((1.0, 1.0), (2.0, 2.0)))
    params, state = model.init(jax.random.PRNGKey(0), 64)
    model, params, state = fold_bn(model, params, state)
    # the portable serving build: f32, lax NMS, exact top-k
    infer_fn = make_infer_fn(model, score_thresh=0.001, iou_thresh=0.45,
                             top_k=32, use_pallas="never",
                             candidates="exact", compute_dtype=jnp.float32)
    from yolojax.serve.savedmodel import save_savedmodel

    path = str(tmp_path_factory.mktemp("sm") / "model")
    meta = save_savedmodel(path, infer_fn, params, state, batch=2, dim=64,
                           meta={"names": ["a", "b", "c"],
                                 "stretch": False})
    return path, meta, infer_fn, params, state


def test_savedmodel_matches_live_path(exported):
    path, meta, infer_fn, params, state = exported
    assert meta["format"] == "savedmodel"
    assert meta["platforms"] == ["cpu"]
    from yolojax.serve.savedmodel import load_savedmodel

    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                      (2, 64, 64, 3), jnp.float32))
    want = jax.device_get(infer_fn(params, state, jnp.asarray(x)))
    loaded_meta, serve_fn = load_savedmodel(path)
    assert loaded_meta["names"] == ["a", "b", "c"]
    got = serve_fn(x)
    assert sorted(got) == sorted(want)
    # same StableHLO, but TF's XLA:CPU session may fuse/order float ops
    # slightly differently than the live JAX run — tight allclose, and
    # bit-exact on the discrete outputs
    np.testing.assert_allclose(got["boxes"], np.asarray(want["boxes"]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(got["scores"], np.asarray(want["scores"]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(got["classes"],
                                  np.asarray(want["classes"]))
    np.testing.assert_array_equal(got["keep"], np.asarray(want["keep"]))


def test_savedmodel_serves_under_plain_tf(exported):
    """A TF host with no yolojax imports: signatures + class_names work."""
    path = exported[0]
    mod = tf.saved_model.load(path)
    sig = mod.signatures["serving_default"]
    x = tf.zeros((2, 64, 64, 3), tf.float32)
    out = sig(images=x)
    assert {"boxes", "scores", "classes", "keep"} <= set(out)
    # dim 64 tiny-v2: 2x2 grid x 2 anchors x 3 classes = 24 candidates
    # (top_k=32 clamps to the candidate count)
    assert out["boxes"].shape == (2, 24, 4)
    names = mod.class_names()["names"].numpy()
    assert [n.decode() for n in names] == ["a", "b", "c"]


def test_savedmodel_rejects_wrong_shape(exported):
    path = exported[0]
    mod = tf.saved_model.load(path)
    with pytest.raises((TypeError, ValueError,
                        tf.errors.InvalidArgumentError)):
        mod.serve(tf.zeros((1, 64, 64, 3), tf.float32))


def test_savedmodel_int8_trunk(tmp_path):
    """The PTQ int8 conv trunk lowers portably through jax2tf: a
    quantized SavedModel serves the same keeps as the live int8 path."""
    from yolojax.quantize.ptq import quantize_model
    from yolojax.serve.savedmodel import load_savedmodel, save_savedmodel

    model = get_model("yolo2", "tiny", num_classes=3,
                      anchors=((1.0, 1.0), (2.0, 2.0)))
    params, state = model.init(jax.random.PRNGKey(0), 64)
    model, params, state = fold_bn(model, params, state)
    calib = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3),
                               jnp.float32)
    qm = quantize_model(model, jax.device_get(params), calib)
    infer_fn = make_infer_fn(model, score_thresh=0.001, iou_thresh=0.45,
                             top_k=32, use_pallas="never",
                             candidates="exact",
                             compute_dtype=jnp.float32, qm=qm)
    path = str(tmp_path / "int8")
    meta = save_savedmodel(path, infer_fn, params, state, batch=1, dim=64,
                           meta={"names": ["a", "b", "c"], "int8": True})
    assert meta["int8"] is True
    _, serve_fn = load_savedmodel(path)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(2),
                                      (1, 64, 64, 3), jnp.float32))
    got = serve_fn(x)
    want = jax.device_get(infer_fn(params, state, jnp.asarray(x)))
    np.testing.assert_array_equal(got["keep"], np.asarray(want["keep"]))
    np.testing.assert_allclose(got["boxes"], np.asarray(want["boxes"]),
                               atol=1e-5, rtol=1e-4)
