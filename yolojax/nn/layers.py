"""Core functional NN layers for TPU (NHWC, XLA-first).

A network is a flat tuple of layer *specs* (dataclasses below). The same
spec list drives three things:

  * parameter initialization (``init_network``),
  * the jitted forward pass (``apply_network``),
  * the Darknet ``.weights`` / TF1-checkpoint converters, which walk conv
    and dense layers in spec order (yolojax/convert/).

This mirrors the role of the reference's per-model ``inference.py`` builder
functions (SURVEY.md §2: ``model/yolo2/inference.py`` — slim conv+BN+leaky
stacks), but as data instead of code: TPU-idiomatic because the whole
forward pass stays one traced function with static shapes that XLA can fuse
and tile onto the MXU.

Conventions:
  * activations NHWC, conv kernels HWIO (``lax.conv_general_dilated``).
  * trainable params and BN running statistics are separate pytrees
    (``params`` / ``state``) so optax only ever sees trainables.
  * Darknet-compatible explicit padding (pad_lo = k//2) so converted
    ``.weights`` reproduce reference box outputs within fp tolerance.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Layer specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """2-D convolution, optionally fused with BN + activation."""

    out: int
    ksize: int
    stride: int = 1
    bn: bool = True
    act: str = "leaky"  # "leaky" | "linear"


@dataclasses.dataclass(frozen=True)
class MaxPoolSpec:
    size: int = 2
    stride: int = 2


@dataclasses.dataclass(frozen=True)
class RouteSpec:
    """Concatenate earlier layer outputs along channels (Darknet 'route').

    ``layers`` holds relative (negative) or absolute indices into the
    per-spec output list, exactly like a Darknet cfg route layer.
    """

    layers: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class ReorgSpec:
    """Space-to-depth passthrough (YOLOv2 'reorg', stride 2)."""

    stride: int = 2


@dataclasses.dataclass(frozen=True)
class FlattenSpec:
    """Flatten NHWC -> (N, C*H*W) in NCHW order (Darknet 'connected' input
    order, so imported FC weights line up)."""


@dataclasses.dataclass(frozen=True)
class DenseSpec:
    out: int
    act: str = "leaky"


@dataclasses.dataclass(frozen=True)
class DropoutSpec:
    rate: float = 0.5


LayerSpec = Any  # union of the dataclasses above


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------


def _darknet_padding(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """Explicit (lo, hi) padding reproducing Darknet's conv arithmetic.

    Darknet pads ``k // 2`` then floors: out = (H + 2*(k//2) - k)//s + 1 with
    windows anchored at ``-k//2``. For stride 1 this equals SAME; for the
    strided convs in YOLOv1 it differs from XLA SAME (which pads low=0), so
    we always emit explicit padding.
    """
    pad_lo = kernel // 2
    out = (size + 2 * pad_lo - kernel) // stride + 1
    pad_hi = max((out - 1) * stride + kernel - size - pad_lo, 0)
    return pad_lo, pad_hi


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    in_layout: str = "NHWC",
) -> jax.Array:
    """NHWC x HWIO conv with Darknet-compatible explicit padding.

    Inputs are cast to ``compute_dtype`` (bf16 by default — MXU native) and
    the OUTPUT stays in ``compute_dtype``: the BN/bias epilogue upcasts to
    fp32 per-element inside XLA fusions (register-resident), so no fp32
    activation tensor ever materializes in HBM. Accumulation stays fp32
    inside the MXU regardless of the bf16 output dtype; we do NOT use
    ``preferred_element_type`` because a fp32-out/bf16-in conv breaks
    JAX's conv transpose (VJP) with a dtype mismatch.
    """
    k = w.shape[0]
    # in_layout "NHCW" consumes the fused Pallas stem's channels-on-sublanes
    # output without a relayout pass; output is always NHWC
    h_axis, w_axis = (1, 2) if in_layout == "NHWC" else (1, 3)
    pad_h = _darknet_padding(x.shape[h_axis], k, stride)
    pad_w = _darknet_padding(x.shape[w_axis], w.shape[1], stride)
    return lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        dimension_numbers=(in_layout, "HWIO", "NHWC"),
    )


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """Inference-form BN: y = scale * (x - mean) * rsqrt(var + eps) + bias.

    Folded into two fused multiplies/adds; XLA fuses this into the conv
    epilogue, matching what cuDNN fused BN did for the reference.
    """
    inv = lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(jnp.float32)
    return x.astype(jnp.float32) * inv + (
        bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    )


def leaky_relu(x: jax.Array, alpha: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, alpha * x)


def max_pool(x: jax.Array, size: int, stride: int) -> jax.Array:
    """Max pool with Darknet-compatible padding (SAME-style, -inf pads)."""
    # NOTE (round-2, both measured and rejected): two 2x2/2 fast paths
    # LOSE to reduce_window on v5e inside the real train graph, where the
    # activations carry batch-minor tiled layouts:
    #   1. reshape+jnp.max forward: its VJP lowers to two full 6-D
    #      broadcasts (+5.7 ms/step at b64/416);
    #   2. custom_vjp with elementwise first-max phase routing: 2-3x
    #      faster than select-and-scatter standalone (bench/
    #      explore_pool.py), but in-graph every (N,H/2,2,W/2,2,C)
    #      reshape materializes as a "data formatting" copy against the
    #      {0,3,2,1} conv layouts: 87 -> 154 ms/step.
    # select-and-scatter runs at ~450 GB/s (~72% of its HBM floor) and is
    # the keeper. tests/unit/test_models.py gates gradient semantics
    # (first-max ties) for any future attempt.
    total = max((math.ceil(x.shape[1] / stride) - 1) * stride + size - x.shape[1], 0)
    pad_h = (total // 2, total - total // 2)
    total_w = max((math.ceil(x.shape[2] / stride) - 1) * stride + size - x.shape[2], 0)
    pad_w = (total_w // 2, total_w - total_w // 2)
    # init must be a CONCRETE dtype-matched scalar: a traced array breaks
    # the reduce_window VJP ("Linearization failed"), a bare python int
    # defaults to int32 and trips the int8 dtype check.
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = jnp.dtype(x.dtype).type(-jnp.inf)
    else:
        init = jnp.dtype(x.dtype).type(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )


def space_to_depth(x: jax.Array, stride: int = 2) -> jax.Array:
    """Darknet 'reorg' passthrough (tf.space_to_depth semantics).

    (N, H, W, C) -> (N, H/s, W/s, C*s*s). Pure reshape/transpose — XLA
    compiles it to a layout change fused with neighbours, no Pallas needed
    (SURVEY.md §2 native-capability table).
    """
    n, h, w, c = x.shape
    s = stride
    x = x.reshape(n, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // s, w // s, c * s * s)


# ---------------------------------------------------------------------------
# Network init / apply
# ---------------------------------------------------------------------------


def _conv_name(i: int) -> str:
    return f"conv_{i}"


def _dense_name(i: int) -> str:
    return f"dense_{i}"


def init_network(
    key: jax.Array,
    specs: Sequence[LayerSpec],
    in_channels: int,
    input_hw: Tuple[int, int],
    *,
    param_dtype: jnp.dtype = jnp.float32,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Initialize (params, state) pytrees for a spec list.

    Uses He-normal init for conv/dense kernels (leaky-ReLU gain). ``state``
    holds BN running statistics only.
    """
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    # Track (h, w, c) through the net to size dense layers / shape checks.
    h, w = input_hw
    c = in_channels
    channel_hist = []  # per-spec output channels for RouteSpec
    hw_hist = []
    for i, spec in enumerate(specs):
        if isinstance(spec, ConvSpec):
            key, sub = jax.random.split(key)
            fan_in = spec.ksize * spec.ksize * c
            std = math.sqrt(2.0 / fan_in)
            layer = {
                "w": (
                    jax.random.normal(
                        sub, (spec.ksize, spec.ksize, c, spec.out), param_dtype
                    )
                    * std
                )
            }
            if spec.bn:
                layer["scale"] = jnp.ones((spec.out,), param_dtype)
                layer["bias"] = jnp.zeros((spec.out,), param_dtype)
                state[_conv_name(i)] = {
                    "mean": jnp.zeros((spec.out,), jnp.float32),
                    "var": jnp.ones((spec.out,), jnp.float32),
                }
            else:
                layer["b"] = jnp.zeros((spec.out,), param_dtype)
            params[_conv_name(i)] = layer
            c = spec.out
            h = (h + 2 * (spec.ksize // 2) - spec.ksize) // spec.stride + 1
            w = (w + 2 * (spec.ksize // 2) - spec.ksize) // spec.stride + 1
        elif isinstance(spec, MaxPoolSpec):
            h = math.ceil(h / spec.stride)
            w = math.ceil(w / spec.stride)
        elif isinstance(spec, ReorgSpec):
            c = c * spec.stride * spec.stride
            h //= spec.stride
            w //= spec.stride
        elif isinstance(spec, RouteSpec):
            c = 0
            for ref in spec.layers:
                j = ref if ref >= 0 else i + ref
                c += channel_hist[j]
            h, w = hw_hist[
                spec.layers[0] if spec.layers[0] >= 0 else i + spec.layers[0]
            ]
        elif isinstance(spec, FlattenSpec):
            c = c * h * w
            h = w = 1
        elif isinstance(spec, DenseSpec):
            key, sub = jax.random.split(key)
            std = math.sqrt(2.0 / c)
            params[_dense_name(i)] = {
                "w": jax.random.normal(sub, (c, spec.out), param_dtype) * std,
                "b": jnp.zeros((spec.out,), param_dtype),
            }
            c = spec.out
        elif isinstance(spec, DropoutSpec):
            pass
        else:
            raise TypeError(f"unknown layer spec: {spec!r}")
        channel_hist.append(c)
        hw_hist.append((h, w))
    return params, state


def apply_network(
    specs: Sequence[LayerSpec],
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_momentum: float = 0.99,
    bn_eps: float = 1e-5,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    leaky_alpha: float = 0.1,
    pad_input_channels: int = 0,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Run the network. Returns (output, new_state).

    In ``train`` mode BN uses batch statistics and returns updated running
    stats; in eval mode it uses ``state`` and returns it unchanged. The whole
    function is trace-friendly: no data-dependent Python control flow.

    ``pad_input_channels``: zero-pad the RGB input (and the first conv
    kernel's input-channel rows) up to this count. Bitwise-exact — the zero
    channels contribute exact +0.0 terms to the MXU accumulation and the
    kernel-pad VJP is a slice, so gradients to the real kernel rows are
    unchanged. Built to test whether C=3 lane waste explains conv0's
    weight-gradient cost; measured NO effect on v5e at pad 4/8 (train and
    forward within noise, PERF.md round-4 — XLA's conv packing already
    handles the 3-channel case), kept for other TPU generations. Off (0)
    by default.
    """
    new_state = dict(state)
    if (
        pad_input_channels
        and specs
        and isinstance(specs[0], ConvSpec)
        and x.shape[-1] < pad_input_channels
    ):
        x = jnp.pad(
            x, ((0, 0),) * (x.ndim - 1)
            + ((0, pad_input_channels - x.shape[-1]),)
        )
    outputs = []  # per-spec outputs for RouteSpec
    layout = "NHWC"  # the Pallas stem emits "NHCW"; the next conv restores
    for i, spec in enumerate(specs):
        tname = type(spec).__name__
        if tname == "StemSpec":  # fused conv0+pool (yolojax/nn/stem.py)
            layer = params[_conv_name(i)]
            p = x.shape[1] // 2
            if (
                spec.impl == "pallas"
                or (spec.impl == "auto" and jax.default_backend() == "tpu"
                    and p % 8 == 0 and p <= 256)
            ):
                from yolojax.nn.pallas_stem import stem_forward_pallas

                x = stem_forward_pallas(x, layer["wp"], layer["b"])
                layout = "NHCW"
            else:
                from yolojax.nn.stem import stem_forward

                x = stem_forward(x, layer["wp"], layer["b"],
                                 compute_dtype=compute_dtype)
            outputs.append(x)
            continue
        if tname == "NoOpSpec":
            outputs.append(x)
            continue
        if isinstance(spec, ConvSpec):
            layer = params[_conv_name(i)]
            w = layer["w"]
            if i == 0 and x.shape[-1] > w.shape[2] and layout == "NHWC":
                # input was channel-padded above: pad the kernel's input
                # rows with zeros to match (VJP = slice; grads unchanged)
                w = jnp.concatenate(
                    [w, jnp.zeros(w.shape[:2]
                                  + (x.shape[-1] - w.shape[2], w.shape[3]),
                                  w.dtype)], axis=2)
            y = conv2d(x, w, spec.stride, compute_dtype=compute_dtype,
                       in_layout=layout)
            layout = "NHWC"
            # upcast per-element for the epilogue math; XLA fuses the cast
            # into its consumers, so only the compute_dtype tensor is stored
            yf = y.astype(jnp.float32)
            if spec.bn:
                if train:
                    # two-pass mean/var: measured FASTER than the one-pass
                    # sum/sumsq form on v5e (XLA fuses the second pass into
                    # neighbours; the fused sumsq fusion doubled in cost)
                    # and more stable under DP reduction reordering
                    m = jnp.mean(yf, axis=(0, 1, 2))
                    v = jnp.var(yf, axis=(0, 1, 2))
                    run = state[_conv_name(i)]
                    new_state[_conv_name(i)] = {
                        "mean": run["mean"] * bn_momentum + m * (1 - bn_momentum),
                        "var": run["var"] * bn_momentum + v * (1 - bn_momentum),
                    }
                else:
                    run = state[_conv_name(i)]
                    m, v = run["mean"], run["var"]
                y = batch_norm(yf, layer["scale"], layer["bias"], m, v,
                               eps=bn_eps)
            else:
                y = yf + layer["b"].astype(jnp.float32)
            if spec.act == "leaky":
                y = leaky_relu(y, leaky_alpha)
            x = y.astype(compute_dtype)
        elif isinstance(spec, MaxPoolSpec):
            x = max_pool(x, spec.size, spec.stride)
        elif isinstance(spec, ReorgSpec):
            x = space_to_depth(x, spec.stride)
        elif isinstance(spec, RouteSpec):
            parts = [outputs[r if r >= 0 else i + r] for r in spec.layers]
            x = jnp.concatenate(parts, axis=-1)
        elif isinstance(spec, FlattenSpec):
            n, h, w, c = x.shape
            x = x.transpose(0, 3, 1, 2).reshape(n, c * h * w)
        elif isinstance(spec, DenseSpec):
            layer = params[_dense_name(i)]
            y = jnp.dot(
                x.astype(compute_dtype),
                layer["w"].astype(compute_dtype),
            ).astype(jnp.float32)
            y = y + layer["b"].astype(jnp.float32)
            if spec.act == "leaky":
                y = leaky_relu(y, leaky_alpha)
            x = y.astype(compute_dtype)
        elif isinstance(spec, DropoutSpec):
            if train:
                if rng is None:
                    raise ValueError("dropout in train mode needs an rng")
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - spec.rate, x.shape)
                x = jnp.where(keep, x / (1.0 - spec.rate), 0.0).astype(x.dtype)
        else:
            raise TypeError(f"unknown layer spec: {spec!r}")
        outputs.append(x)
    return x.astype(jnp.float32), new_state
