"""Full-backbone forward parity vs a TensorFlow re-execution.

Round-1 parity covered only a 3-conv stride-1 micro stack — the one regime
where Darknet padding and TF SAME coincide. These tests run EVERY backbone
(YOLOv2 Darknet-19 @416 with reorg+route, Tiny-YOLOv2 @416 with its
stride-1 pool, YOLOv1 full @448 with the stride-2 7x7 conv where Darknet
padding deliberately differs from SAME, and Tiny-YOLOv1 @448 with the
FC-flatten ordering) end to end against a generic TF re-execution of the
same weights on the same input, then compare the post-decode box outputs
(the north-star "bit-for-bit within fp tolerance" contract is on boxes,
not logits).

The TF executor mirrors Darknet semantics explicitly:
  * convs: tf.pad with the exact Darknet (lo, hi) padding, then VALID conv
    (NOT padding="SAME" — SAME pads low=0 for even overhang, Darknet pads
    k//2 low; they differ on strided convs);
  * max-pool: SAME (ceil) semantics, matching Darknet's pool arithmetic;
  * reorg: tf.nn.space_to_depth (golden ordering);
  * flatten: NHWC -> NCHW -> flat, Darknet's CHW flatten order.

Golden output fingerprints (PRNGKey(0) weights, fixed input) are checked in
below so a semantic drift in our own stack fails even without TF installed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolojax.models import get_model
from yolojax.nn.layers import (
    ConvSpec,
    DenseSpec,
    DropoutSpec,
    FlattenSpec,
    MaxPoolSpec,
    ReorgSpec,
    RouteSpec,
    _conv_name,
    _dense_name,
    _darknet_padding,
)

tf = pytest.importorskip("tensorflow")


def tf_apply(specs, params, state, x, *, leaky_alpha=0.1, bn_eps=1e-5):
    """Generic TF (eval-mode) re-execution of a yolojax spec list."""
    t = tf.constant(np.asarray(x, np.float32))
    outputs = []
    for i, spec in enumerate(specs):
        if isinstance(spec, ConvSpec):
            layer = params[_conv_name(i)]
            k = spec.ksize
            pad_h = _darknet_padding(int(t.shape[1]), k, spec.stride)
            pad_w = _darknet_padding(int(t.shape[2]), k, spec.stride)
            t = tf.pad(t, [[0, 0], list(pad_h), list(pad_w), [0, 0]])
            t = tf.nn.conv2d(
                t, np.asarray(layer["w"]), strides=spec.stride, padding="VALID"
            )
            if spec.bn:
                st = state[_conv_name(i)]
                t = tf.nn.batch_normalization(
                    t,
                    mean=np.asarray(st["mean"]),
                    variance=np.asarray(st["var"]),
                    offset=np.asarray(layer["bias"]),
                    scale=np.asarray(layer["scale"]),
                    variance_epsilon=bn_eps,
                )
            else:
                t = t + np.asarray(layer["b"])
            if spec.act == "leaky":
                t = tf.nn.leaky_relu(t, alpha=leaky_alpha)
        elif isinstance(spec, MaxPoolSpec):
            t = tf.nn.max_pool2d(t, spec.size, spec.stride, padding="SAME")
        elif isinstance(spec, ReorgSpec):
            t = tf.nn.space_to_depth(t, spec.stride)
        elif isinstance(spec, RouteSpec):
            parts = [outputs[r if r >= 0 else i + r] for r in spec.layers]
            t = tf.concat(parts, axis=-1)
        elif isinstance(spec, FlattenSpec):
            t = tf.reshape(tf.transpose(t, (0, 3, 1, 2)), (int(t.shape[0]), -1))
        elif isinstance(spec, DenseSpec):
            layer = params[_dense_name(i)]
            t = tf.matmul(t, np.asarray(layer["w"])) + np.asarray(layer["b"])
            if spec.act == "leaky":
                t = tf.nn.leaky_relu(t, alpha=leaky_alpha)
        elif isinstance(spec, DropoutSpec):
            pass  # eval mode
        else:
            raise TypeError(spec)
        outputs.append(t)
    return t.numpy()


def _init_with_stats(model, dim, seed=0):
    params, state = model.init(jax.random.PRNGKey(seed), dim)
    # non-trivial BN running stats so BN parity is actually exercised
    state = jax.tree_util.tree_map(
        lambda s: s + 0.25 * jax.random.uniform(jax.random.PRNGKey(9), s.shape),
        state,
    )
    # non-trivial BN scale/bias too (init is ones/zeros)
    def jitter(path_leaf):
        key = jax.random.PRNGKey(11)
        return jax.tree_util.tree_map(
            lambda p: p + 0.05 * jax.random.normal(key, p.shape, p.dtype)
            if p.ndim == 1 else p,
            path_leaf,
        )
    params = jitter(params)
    return params, state


def _input(dim, batch=1, seed=0):
    return np.random.RandomState(seed).uniform(
        0, 1, (batch, dim, dim, 3)
    ).astype(np.float32)


CASES = [
    ("yolo2", "darknet", 416),
    ("yolo2", "tiny", 416),
    ("yolo", "yolo", 448),
    ("yolo", "tiny", 448),
]

# Golden head fingerprints: (mean, std, first, middle, last) of the flat
# f32 head output for PRNGKey(0)-initialized weights (via _init_with_stats)
# on _input(dim). Recorded on CPU f32; guards semantic drift in our stack
# even when TF is absent. Regenerate with scripts in the file history if an
# *intentional* semantic change lands.
GOLDEN = {
    ("yolo2", "darknet", 416): (0.003070, 0.055280, 0.004015, -0.058897, 0.018910),
    ("yolo2", "tiny", 416): (0.014933, 0.671928, 0.421745, -0.007070, 0.538179),
    ("yolo", "yolo", 448): (0.033813, 1.381278, 1.026572, -0.739270, -0.427569),
    ("yolo", "tiny", 448): (-0.101147, 2.695339, -3.873369, -1.814553, -1.989916),
}


@pytest.mark.parametrize("name,inference,dim", CASES)
def test_full_graph_golden_fingerprint(name, inference, dim):
    model = get_model(name, inference, num_classes=20)
    params, state = _init_with_stats(model, dim)
    x = _input(dim)
    out, _ = model.apply(params, state, jnp.asarray(x),
                         compute_dtype=jnp.float32)
    out = np.asarray(out).ravel()
    got = (out.mean(), out.std(), out[0], out[len(out) // 2], out[-1])
    want = GOLDEN[(name, inference, dim)]
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("name,inference,dim", CASES)
def test_full_graph_parity_vs_tf(name, inference, dim):
    model = get_model(name, inference, num_classes=20)
    params, state = _init_with_stats(model, dim)
    x = _input(dim)

    ours, _ = model.apply(params, state, jnp.asarray(x),
                          compute_dtype=jnp.float32)
    ours = np.asarray(ours)
    theirs = tf_apply(model.specs, params, state, x)
    theirs = theirs.reshape(ours.shape)

    # head parity: fp32 accumulation-order differences only
    scale = max(np.abs(theirs).max(), 1.0)
    np.testing.assert_allclose(ours, theirs, atol=2e-4 * scale, rtol=2e-4)

    # post-decode BOX parity — the north-star contract surface
    if model.kind == "v2":
        from yolojax.ops.boxes import decode_v2

        da = jax.tree_util.tree_map(
            np.asarray, decode_v2(jnp.asarray(ours), model.anchors))
        db = jax.tree_util.tree_map(
            np.asarray, decode_v2(jnp.asarray(theirs), model.anchors))
    else:
        from yolojax.ops.boxes import decode_v1

        flat = ours.reshape(ours.shape[0], -1)
        flat_tf = theirs.reshape(theirs.shape[0], -1)
        da = jax.tree_util.tree_map(
            np.asarray,
            decode_v1(jnp.asarray(flat), model.grid, model.boxes_per_cell,
                      model.num_classes))
        db = jax.tree_util.tree_map(
            np.asarray,
            decode_v1(jnp.asarray(flat_tf), model.grid, model.boxes_per_cell,
                      model.num_classes))
    # atol 5e-4 in normalized box coords: fp32 accumulation-order noise
    # through the 50k-wide v1 FC reductions reaches ~2e-4; anything beyond
    # ~1e-3 would be a semantic (padding/flatten/decode) drift.
    np.testing.assert_allclose(da["corners"], db["corners"],
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(da["scores"], db["scores"],
                               atol=5e-4, rtol=5e-4)


def test_strided_conv_padding_differs_from_same():
    """Regression guard for the one case round-1 never covered: on the
    stride-2 7x7 opening conv of YOLOv1 @448, Darknet padding (lo=hi=3)
    must NOT equal TF SAME (lo=2, hi=3 for even input) — if this ever
    passes with SAME the explicit-padding code has silently degraded."""
    rng = np.random.RandomState(3)
    x = rng.uniform(0, 1, (1, 448, 448, 3)).astype(np.float32)
    w = rng.normal(0, 0.05, (7, 7, 3, 8)).astype(np.float32)

    pad = _darknet_padding(448, 7, 2)
    assert pad == (3, 2), pad  # darknet: lo=k//2=3, out=224 -> hi=2

    from yolojax.nn.layers import conv2d

    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), 2,
                             compute_dtype=jnp.float32))
    t_same = tf.nn.conv2d(x, w, strides=2, padding="SAME").numpy()
    t_explicit = tf.nn.conv2d(
        tf.pad(x, [[0, 0], [3, 2], [3, 2], [0, 0]]), w,
        strides=2, padding="VALID").numpy()
    np.testing.assert_allclose(ours, t_explicit, atol=1e-4, rtol=1e-4)
    # darknet anchors windows at -k//2; SAME at -(k//2 - 1) for even sizes:
    # the two grids are shifted, outputs must differ
    assert np.abs(ours - t_same).max() > 1e-3
