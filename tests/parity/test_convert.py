"""Converter parity tests (SURVEY.md §4.2).

- Darknet .weights: export -> import roundtrip must be bit-exact.
- Forward parity: our conv+BN+leaky stack vs a TF 2.21 re-execution of the
  same weights on the same input ("bit-for-bit within fp tolerance").
- TF1 checkpoint: slim-style named variables saved with compat.v1 Saver,
  read back through load_tf1_checkpoint.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolojax.models import Model
from yolojax.nn.layers import (
    ConvSpec,
    DenseSpec,
    FlattenSpec,
    MaxPoolSpec,
)
from yolojax.convert.darknet import load_darknet_weights, save_darknet_weights
from yolojax.convert.store import load_params_npz, save_params_npz

tf = pytest.importorskip("tensorflow")


def micro_v2():
    specs = (
        ConvSpec(8, 3),
        MaxPoolSpec(),
        ConvSpec(12, 3),
        ConvSpec(10, 1, bn=False, act="linear"),
    )
    return Model("yolo2", "micro", "v2", specs, 0, 4,
                 anchors=((1.0, 1.0), (2.0, 2.0)))


def micro_v1():
    specs = (
        ConvSpec(8, 3, bn=False),
        MaxPoolSpec(),
        FlattenSpec(),
        DenseSpec(16, act="leaky"),
        DenseSpec(10, act="linear"),
    )
    return Model("yolo", "micro", "v1", specs, 1, 2, boxes_per_cell=1, grid=1)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("maker,dim", [(micro_v2, 32), (micro_v1, 16)])
def test_darknet_roundtrip(tmp_path, maker, dim):
    model = maker()
    params, state = model.init(jax.random.PRNGKey(0), dim)
    # make BN stats non-trivial
    state = jax.tree_util.tree_map(
        lambda x: x + jax.random.uniform(jax.random.PRNGKey(1), x.shape),
        state,
    )
    path = str(tmp_path / "m.weights")
    save_darknet_weights(model, params, state, path, seen=123)
    p2, s2 = load_darknet_weights(model, path, input_dim=dim)
    _tree_equal(params, p2)
    _tree_equal(state, s2)


def test_npz_store_roundtrip(tmp_path, ):
    model = micro_v2()
    params, state = model.init(jax.random.PRNGKey(0), 32)
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params, state)
    p2, s2 = load_params_npz(path)
    _tree_equal(params, p2)
    _tree_equal(state, s2)


def test_forward_parity_vs_tf():
    """Same weights, same input: yolojax (f32) vs TF Keras re-execution."""
    model = micro_v2()
    params, state = model.init(jax.random.PRNGKey(3), 32)
    x = np.random.RandomState(0).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)

    ours, _ = model.apply(params, state, jnp.asarray(x),
                          compute_dtype=jnp.float32)
    ours = np.asarray(ours).reshape(2, 16, 16, -1)  # one pool: 32 -> 16

    # TF re-execution (NHWC, SAME padding == darknet padding for stride 1)
    t = tf.constant(x)
    # conv_0 + BN + leaky
    w0 = tf.constant(np.asarray(params["conv_0"]["w"]))
    t = tf.nn.conv2d(t, w0, strides=1, padding="SAME")
    st = state["conv_0"]
    t = tf.nn.batch_normalization(
        t,
        mean=np.asarray(st["mean"]),
        variance=np.asarray(st["var"]),
        offset=np.asarray(params["conv_0"]["bias"]),
        scale=np.asarray(params["conv_0"]["scale"]),
        variance_epsilon=1e-5,
    )
    t = tf.nn.leaky_relu(t, alpha=0.1)
    t = tf.nn.max_pool2d(t, 2, 2, padding="SAME")
    w1 = tf.constant(np.asarray(params["conv_2"]["w"]))
    t = tf.nn.conv2d(t, w1, strides=1, padding="SAME")
    st = state["conv_2"]
    t = tf.nn.batch_normalization(
        t, mean=np.asarray(st["mean"]), variance=np.asarray(st["var"]),
        offset=np.asarray(params["conv_2"]["bias"]),
        scale=np.asarray(params["conv_2"]["scale"]),
        variance_epsilon=1e-5,
    )
    t = tf.nn.leaky_relu(t, alpha=0.1)
    w2 = tf.constant(np.asarray(params["conv_3"]["w"]))
    t = tf.nn.conv2d(t, w2, strides=1, padding="SAME")
    t = t + np.asarray(params["conv_3"]["b"])
    theirs = t.numpy()

    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


def test_tf1_checkpoint_conversion(tmp_path):
    """slim-style TF1 checkpoint -> yolojax params."""
    model = micro_v2()
    tmpl_params, tmpl_state = model.init(jax.random.PRNGKey(0), 32)
    rng = np.random.RandomState(7)

    g = tf.Graph()
    with g.as_default():
        vals = {}

        def v1var(name, shape):
            vals[name] = rng.normal(size=shape).astype(np.float32)
            return tf.compat.v1.get_variable(
                name, initializer=tf.constant(vals[name])
            )

        # slim naming: Conv, Conv_1, Conv_2 (+ BatchNorm subscopes)
        v1var("net/Conv/weights", np.asarray(tmpl_params["conv_0"]["w"]).shape)
        v1var("net/Conv/BatchNorm/gamma", (8,))
        v1var("net/Conv/BatchNorm/beta", (8,))
        v1var("net/Conv/BatchNorm/moving_mean", (8,))
        v1var("net/Conv/BatchNorm/moving_variance", (8,))
        v1var("net/Conv_1/weights", np.asarray(tmpl_params["conv_2"]["w"]).shape)
        v1var("net/Conv_1/BatchNorm/gamma", (12,))
        v1var("net/Conv_1/BatchNorm/beta", (12,))
        v1var("net/Conv_1/BatchNorm/moving_mean", (12,))
        v1var("net/Conv_1/BatchNorm/moving_variance", (12,))
        v1var("net/Conv_2/weights", np.asarray(tmpl_params["conv_3"]["w"]).shape)
        v1var("net/Conv_2/biases", (10,))
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "model.ckpt"))

    from yolojax.convert.tf1 import load_tf1_checkpoint

    params, state = load_tf1_checkpoint(model, ckpt, input_dim=32)
    np.testing.assert_array_equal(params["conv_0"]["w"],
                                  vals["net/Conv/weights"])
    np.testing.assert_array_equal(params["conv_0"]["scale"],
                                  vals["net/Conv/BatchNorm/gamma"])
    np.testing.assert_array_equal(state["conv_2"]["var"],
                                  vals["net/Conv_1/BatchNorm/moving_variance"])
    np.testing.assert_array_equal(params["conv_3"]["b"],
                                  vals["net/Conv_2/biases"])


def test_fold_bn_preserves_forward():
    from yolojax.convert.fold import fold_bn

    model = micro_v2()
    params, state = model.init(jax.random.PRNGKey(5), 32)
    # non-trivial running stats
    state = jax.tree_util.tree_map(
        lambda x: x + 0.3 * jax.random.uniform(jax.random.PRNGKey(6), x.shape),
        state,
    )
    x = jnp.asarray(
        np.random.RandomState(1).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    )
    ref, _ = model.apply(params, state, x, compute_dtype=jnp.float32)

    fmodel, fparams, fstate = fold_bn(model, params, state)
    assert fstate == {}
    got, _ = fmodel.apply(fparams, fstate, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
