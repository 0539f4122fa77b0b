"""Shape/parameter-count golden tests for the model zoo.

CPU tests run the conv stacks at reduced input dims (the nets are fully
convolutional / dim-parameterized) and in float32 (bf16 is emulated and
slow on host CPU); param counts are checked at the real dims via init only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.models import get_model
from yolojax.nn.layers import space_to_depth

F32 = jnp.float32


def _n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def test_yolo2_darknet_shapes():
    m = get_model("yolo2", "darknet", num_classes=20)
    params, state = m.init(jax.random.PRNGKey(0), 128)
    x = jnp.zeros((2, 128, 128, 3), F32)
    out, _ = jax.jit(lambda p, s, x: m.apply(p, s, x, compute_dtype=F32))(
        params, state, x
    )
    assert out.shape == (2, 4, 4, 5, 25)
    # Darknet-19 YOLOv2-VOC has ~50.6M params (yolo-voc.weights ≈ 203MB/4).
    assert 49e6 < _n_params(params) < 52e6


def test_yolo2_tiny_shapes():
    m = get_model("yolo2", "tiny", num_classes=20)
    params, state = m.init(jax.random.PRNGKey(0), 160)
    x = jnp.zeros((1, 160, 160, 3), F32)
    out, _ = m.apply(params, state, x, compute_dtype=F32)
    assert out.shape == (1, 5, 5, 5, 25)
    # tiny-yolo-voc.weights ≈ 63MB → ~15.8M params.
    assert 15e6 < _n_params(params) < 17e6


@pytest.mark.parametrize("dim", [96, 224])
def test_yolo2_multiscale(dim):
    m = get_model("yolo2", "tiny", num_classes=20)
    params, state = m.init(jax.random.PRNGKey(0), dim)
    x = jnp.zeros((1, dim, dim, 3), F32)
    out, _ = m.apply(params, state, x, compute_dtype=F32)
    g = dim // 32
    assert out.shape == (1, g, g, 5, 25)


def test_pad_input_channels_bitwise_exact():
    """pad_input_channels zero-pads the image + first-conv kernel rows: the
    head AND the parameter gradients must be bitwise identical to the
    unpadded forward (zero channels contribute exact +0.0 terms; the
    kernel-pad VJP is a slice)."""
    m = get_model("yolo2", "tiny", num_classes=4)
    params, state = m.init(jax.random.PRNGKey(0), 64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), F32)

    def head_sum(p, pad):
        out, _ = m.apply(p, state, x, train=True, compute_dtype=F32,
                         pad_input_channels=pad)
        return (out ** 2).sum()

    for pad in (4, 8):
        a, ga = jax.value_and_grad(lambda p: head_sum(p, 0))(params)
        b, gb = jax.value_and_grad(lambda p: head_sum(p, pad))(params)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for la, lb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_yolo1_tiny_shapes():
    # Reduced dim 192 -> 3x3 pre-flatten grid mirrors 448 -> 7x7 structure.
    m = get_model("yolo", "tiny", num_classes=20, grid=7)
    params, state = m.init(jax.random.PRNGKey(0), 448)
    # init at the real 448 so the FC fan-in (7*7*1024 in NCHW order) is real
    assert params["dense_16"]["w"].shape == (1024 * 7 * 7, 256)
    x = jnp.zeros((1, 448, 448, 3), F32)
    out, _ = m.apply(params, state, x, compute_dtype=F32)
    assert out.shape == (1, 7 * 7 * (20 + 2 * 5))


def test_yolo1_full_param_count():
    m = get_model("yolo", "yolo", num_classes=20)
    params, _ = m.init(jax.random.PRNGKey(0), 448)
    # YOLOv1 full ≈ 270M params (dominated by the 50176x4096 FC).
    assert 2.5e8 < _n_params(params) < 2.9e8


def test_space_to_depth_matches_tf_semantics():
    # golden: tf.space_to_depth block ordering on a tiny example
    x = jnp.arange(2 * 4 * 4 * 1, dtype=F32).reshape(2, 4, 4, 1)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 2, 2, 4)
    # block (0,0) of image 0: rows 0-1, cols 0-1 -> [0, 1, 4, 5]
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0]), [0, 1, 4, 5])
    np.testing.assert_array_equal(np.asarray(y[0, 1, 1]), [10, 11, 14, 15])


def test_bn_train_updates_running_stats():
    m = get_model("yolo2", "tiny", num_classes=3)
    params, state = m.init(jax.random.PRNGKey(0), 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _, new_state = m.apply(params, state, x, train=True, compute_dtype=F32)
    before = state["conv_0"]["mean"]
    after = new_state["conv_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_max_pool22_gradient_semantics():
    """Whatever backs max_pool, its 2x2/2 gradient must be BITWISE
    select-and-scatter's (first-max tie routing), including on tie-heavy
    inputs like the 0.5-gray letterbox/augmentation fill regions. Gates any
    future fast-path experiment (two have been measured and rejected —
    see the NOTE in layers.py and PERF.md)."""
    from jax import lax

    from yolojax.nn.layers import max_pool

    def pool_raw(x):  # the general reduce_window path (s&s backward)
        return lax.reduce_window(
            x, jnp.dtype(x.dtype).type(-jnp.inf), lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), ((0, 0),) * 4)

    key = jax.random.PRNGKey(0)
    rand = jax.random.uniform(key, (2, 8, 8, 3), jnp.float32)
    # quantize to force plenty of exact ties, plus a constant gray block
    tied = jnp.round(rand * 4) / 4
    tied = tied.at[:, :4, :4, :].set(0.5)
    for x in (rand, tied, tied.astype(jnp.bfloat16)):
        dy = jax.random.normal(
            jax.random.PRNGKey(1), (2, 4, 4, 3)).astype(x.dtype)
        g_fast = jax.grad(
            lambda x: (max_pool(x, 2, 2) * dy).astype(jnp.float32).sum())(x)
        g_raw = jax.grad(
            lambda x: (pool_raw(x) * dy).astype(jnp.float32).sum())(x)
        np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_raw))
        np.testing.assert_array_equal(
            np.asarray(max_pool(x, 2, 2)), np.asarray(pool_raw(x)))
