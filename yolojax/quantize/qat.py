"""Quantization-aware fine-tuning (QAT) for the int8 serving path.

PTQ (ptq.py) rounds a finished network onto the int8 grid after the fact;
whatever accuracy the rounding costs is baked in. QAT recovers it: starting
from trained, BN-folded weights, fine-tune for a few hundred steps with
*fake-quant* ops inserted at exactly the points ``apply_int8`` quantizes —
the input, every non-head conv/dense weight (per-output-channel), and every
layer output (per-layer scale) — so the optimizer sees the deployment
numerics and moves the weights to minimize the loss *under* them.
Straight-through estimators carry gradients through the rounding.

Scale handling follows standard QAT practice:
  * activation scales are FROZEN from an initial :func:`ptq.calibrate`
    pass (the deployment pipeline re-derives the same scales at export);
  * weight scales track the live ``max|w|`` each step (the same formula
    :func:`ptq.quantize_model` applies at export), with the gradient
    stopped through the scale itself.

TPU shape: the fake-quant graph is ordinary f32 conv + fused elementwise
rounding — XLA folds the quant/dequant pairs into the conv epilogues, no
int8 kernels appear in training. Export is unchanged PTQ machinery
(:func:`ptq.quantize_model` on the tuned params); :func:`reembed_folded`
re-embeds the folded result as an identity-BN checkpoint so every existing
surface (detect / eval / serve / export CLIs, the .npz store) consumes it
with no new code path.

The reference had no quantization at all (SURVEY.md §2 — its deploy story
stopped at TF1 ``Saver`` checkpoints); this extends the TPU-native int8
path that PERF.md validates as the >5000 img/s serving configuration.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from yolojax.models import Model
from yolojax.nn.layers import (
    ConvSpec,
    DenseSpec,
    DropoutSpec,
    FlattenSpec,
    MaxPoolSpec,
    ReorgSpec,
    RouteSpec,
    _darknet_padding,
    leaky_relu,
    max_pool,
    space_to_depth,
)
from yolojax.quantize.ptq import _quantizable_layers


def fake_quant(x: jax.Array, scale, qmax: float = 127.0) -> jax.Array:
    """Quantize-dequantize onto the symmetric ``qmax``-code grid with a
    straight-through estimator: forward value is
    ``clip(round(x/scale), -qmax, qmax) * scale``; the gradient passes
    through as identity (the classic ``x + stop_grad(q - x)`` form —
    pass-through everywhere, including the clipped tail, which keeps
    saturated activations trainable). ``qmax`` mirrors
    :class:`ptq.QuantizedModel.qmax` (127 for int8; 2^(b-1)-1 for the
    narrower ``bits`` grids)."""
    scale = lax.stop_gradient(jnp.asarray(scale, jnp.float32))
    q = jnp.clip(jnp.round(x / scale), -float(qmax), float(qmax)) * scale
    return x + lax.stop_gradient(q - x)


def weight_scale(w: jax.Array, qmax: float = 127.0) -> jax.Array:
    """Per-output-channel scale, the exact formula
    :func:`ptq.quantize_model` applies at export (conv HWIO: out is the
    last axis; dense: the out column)."""
    reduce_axes = tuple(range(w.ndim - 1))
    return jnp.maximum(jnp.abs(w).max(axis=reduce_axes), 1e-8) / float(qmax)


def fake_quant_weight(w: jax.Array, qmax: float = 127.0) -> jax.Array:
    """Fake-quantize a conv/dense kernel per output channel. The scale is
    recomputed from the LIVE weights each step (stop-gradient), so weights
    are free to migrate across grid cells during fine-tuning and the
    export-time quantization sees the same scale they trained under."""
    return fake_quant(w, weight_scale(w, qmax), qmax)


def qat_forward(
    model: Model,
    params: Dict[str, Any],
    images: jax.Array,
    input_scale: float,
    act_scales: Sequence[float],
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    qmax: float = 127.0,
) -> jax.Array:
    """Fake-quant forward of a BN-FOLDED network, mirroring
    :func:`ptq.apply_int8` point for point: input requant, int8 conv/dense
    with per-channel weight scales, per-layer output requant, route concat
    requanted at a fresh scale, head (last conv/dense) kept full-precision.
    Runs in f32 — quantized values are exact small multiples of the scale,
    which bf16's 8-bit mantissa would corrupt. Returns the head shaped like
    ``Model.apply`` (v2: (N, H, W, A, 5+C); v1: flat)."""
    q_idx = _quantizable_layers(model)
    head_index = q_idx[-1]
    x = fake_quant(images.astype(jnp.float32), input_scale, qmax)
    outputs: List[jax.Array] = []
    head = None
    for i, spec in enumerate(model.specs):
        if isinstance(spec, ConvSpec):
            if spec.bn:
                raise ValueError(
                    "qat_forward needs a BN-folded model (fold_bn first); "
                    f"spec {i} still has bn=True"
                )
            layer = params[f"conv_{i}"]
            w = layer["w"].astype(jnp.float32)
            if i != head_index:
                w = fake_quant_weight(w, qmax)
            k = w.shape[0]
            pad_h = _darknet_padding(x.shape[1], k, spec.stride)
            pad_w = _darknet_padding(x.shape[2], k, spec.stride)
            y = lax.conv_general_dilated(
                x, w, (spec.stride, spec.stride), (pad_h, pad_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + layer["b"].astype(jnp.float32)
            if spec.act == "leaky":
                y = leaky_relu(y)
            if i == head_index:
                head = y
            x = fake_quant(y, act_scales[i], qmax)
        elif isinstance(spec, MaxPoolSpec):
            # order-preserving on fake-quantized values, same as the int8
            # path pooling raw int8 codes
            x = max_pool(x, spec.size, spec.stride)
        elif isinstance(spec, ReorgSpec):
            x = space_to_depth(x, spec.stride)
        elif isinstance(spec, RouteSpec):
            parts = [outputs[r if r >= 0 else i + r] for r in spec.layers]
            # parts are already dequantized (fake-quant keeps real scale);
            # the int8 path dequantizes then requants at a fresh scale
            x = fake_quant(jnp.concatenate(parts, -1), act_scales[i], qmax)
        elif isinstance(spec, FlattenSpec):
            n_, h_, w_, c_ = x.shape
            x = x.transpose(0, 3, 1, 2).reshape(n_, c_ * h_ * w_)
        elif isinstance(spec, DenseSpec):
            layer = params[f"dense_{i}"]
            w = layer["w"].astype(jnp.float32)
            if i != head_index:
                w = fake_quant_weight(w, qmax)
            y = jnp.dot(x, w) + layer["b"].astype(jnp.float32)
            if spec.act == "leaky":
                y = leaky_relu(y)
            if i == head_index:
                head = y
            x = fake_quant(y, act_scales[i], qmax)
        elif isinstance(spec, DropoutSpec):
            if train:
                if rng is None:
                    raise ValueError("dropout in train mode needs an rng")
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - spec.rate, x.shape)
                x = jnp.where(keep, x / (1.0 - spec.rate), 0.0)
        else:
            raise NotImplementedError(f"qat path: unsupported layer {spec}")
        outputs.append(x)
    if model.kind == "v2":
        n, h, w_, _ = head.shape
        return head.reshape(n, h, w_, model.num_anchors,
                            5 + model.num_classes)
    return head


class QatState(NamedTuple):
    step: jax.Array  # scalar int32
    params: Any      # folded (bias-conv) param tree
    opt_state: Any


def make_qat_step(
    model: Model,
    tx: optax.GradientTransformation,
    input_scale: float,
    act_scales: Sequence[float],
    *,
    loss_cfg=None,
    aug_cfg=None,
    augment: bool = True,
    qmax: float = 127.0,
):
    """Jitted QAT fine-tune step ``fn(state, batch, rng, dim) -> (state,
    metrics)`` over a folded model. Same batch contract as
    :func:`yolojax.train.step.make_train_step` (canvas images + padded GT);
    augmentation reuses the on-device pipeline so the fine-tune sees the
    same input distribution training did."""
    from yolojax.data.augment import AugmentConfig
    from yolojax.train.step import (
        default_loss_cfg,
        make_head_loss,
        prepare_images,
    )

    if loss_cfg is None:
        loss_cfg = default_loss_cfg(model)
    if aug_cfg is None:
        aug_cfg = AugmentConfig()
    act_scales = tuple(float(s) for s in act_scales)
    input_scale = float(input_scale)
    loss_from_head = make_head_loss(model, loss_cfg)

    @partial(jax.jit, static_argnames=("dim",), donate_argnums=(0,))
    def qat_step(st: QatState, batch, rng: jax.Array, dim: int):
        images, gt_xywh, gt_class, gt_valid = batch
        rng = jax.random.fold_in(rng, st.step)
        rng_aug, rng_drop = jax.random.split(rng)
        # f32 throughout: fake-quant values are exact scale multiples
        images, gt_xywh, gt_valid = prepare_images(
            rng_aug, images.astype(jnp.float32), gt_xywh, gt_valid, dim,
            aug_cfg, augment,
        )

        def loss_fn(params):
            head = qat_forward(
                model, params, images, input_scale, act_scales,
                train=True, rng=rng_drop, qmax=qmax,
            )
            terms = loss_from_head(head, gt_xywh, gt_class, gt_valid)
            return terms["total"], terms

        grads, terms = jax.grad(loss_fn, has_aux=True)(st.params)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        metrics = dict(terms)
        metrics["grad_norm"] = optax.global_norm(grads)
        return QatState(st.step + 1, new_params, new_opt), metrics

    return qat_step


def make_qat_distill_step(
    model: Model,
    tx: optax.GradientTransformation,
    input_scale: float,
    act_scales: Sequence[float],
    *,
    aug_cfg=None,
    augment: bool = True,
    qmax: float = 127.0,
):
    """Distillation-mode QAT step: instead of the detection objective,
    minimize MSE between the fake-quant head and the FROZEN f32 teacher's
    head on the same (augmented) batch.

    Why it exists (PERF.md round 5 hardware record): on the 23-conv
    Darknet-19 at 5 bits, detection-loss QAT plateaus at a partial
    repair — the sparse detection loss only pushes gradients through
    cells with objects, while the quantization error it must undo lives
    in EVERY activation. The teacher-matching objective is dense (every
    head element carries signal), needs no labels beyond the images, and
    its optimum is exactly "the quantized net computes what the f32 net
    computed". Returns ``fn(state, batch, teacher_params, rng, dim) ->
    (state, metrics)`` with a ``distill_mse`` metric (no loss terms).
    The state is donated: ``teacher_params`` must hold buffers DISTINCT
    from ``state.params`` (copy through ``jax.device_get`` first, as
    cli/qat.py does) or XLA rejects the aliased execute."""
    from yolojax.data.augment import AugmentConfig
    from yolojax.nn.layers import apply_network
    from yolojax.train.step import prepare_images

    if aug_cfg is None:
        aug_cfg = AugmentConfig()
    act_scales = tuple(float(s) for s in act_scales)
    input_scale = float(input_scale)

    @partial(jax.jit, static_argnames=("dim",), donate_argnums=(0,))
    def distill_step(st: QatState, batch, teacher_params, rng: jax.Array,
                     dim: int):
        images, gt_xywh, gt_class, gt_valid = batch
        rng = jax.random.fold_in(rng, st.step)
        rng_aug, rng_drop = jax.random.split(rng)
        images, _, _ = prepare_images(
            rng_aug, images.astype(jnp.float32), gt_xywh, gt_valid, dim,
            aug_cfg, augment,
        )
        teacher, _ = apply_network(
            model.specs, teacher_params, {}, images,
            compute_dtype=jnp.float32,
        )
        teacher = lax.stop_gradient(teacher)

        def loss_fn(params):
            head = qat_forward(
                model, params, images, input_scale, act_scales,
                train=True, rng=rng_drop, qmax=qmax,
            )
            flat = head.reshape(head.shape[0], -1)
            return jnp.mean((flat - teacher.reshape(flat.shape)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        metrics = {"total": loss, "distill_mse": loss,
                   "grad_norm": optax.global_norm(grads)}
        return QatState(st.step + 1, new_params, new_opt), metrics

    return distill_step


def reembed_folded(
    registry_model: Model,
    folded_params: Dict[str, Any],
    *,
    eps: float = 1e-5,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Re-embed a BN-folded param tree as an UNFOLDED (params, bn_state)
    pair for ``registry_model`` (the bn=True spec list ``get_model``
    returns), using identity BN: scale=1, bias=b, mean=0, var=1-eps, so
    ``fold_bn`` and the eval-mode BN epilogue both reproduce the folded
    (w, b) to within 1 f32 ulp. This lets QAT output ride the standard
    ``.npz`` store — detect/eval/serve/export consume it with zero new
    loading code."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for i, spec in enumerate(registry_model.specs):
        name = f"conv_{i}"
        if isinstance(spec, ConvSpec) and name in folded_params:
            layer = folded_params[name]
            w = np.asarray(layer["w"], np.float32)
            b = np.asarray(layer["b"], np.float32)
            if spec.bn:
                out = w.shape[-1]
                params[name] = {
                    "w": w,
                    "scale": np.ones((out,), np.float32),
                    "bias": b,
                }
                state[name] = {
                    "mean": np.zeros((out,), np.float32),
                    # var + eps == 1.0 (to f32/f64 rounding) -> inv == 1
                    "var": np.full((out,), 1.0 - eps, np.float32),
                }
            else:
                params[name] = {"w": w, "b": b}
        dname = f"dense_{i}"
        if dname in folded_params:
            layer = folded_params[dname]
            params[dname] = {
                "w": np.asarray(layer["w"], np.float32),
                "b": np.asarray(layer["b"], np.float32),
            }
    return params, state


@dataclasses.dataclass(frozen=True)
class QatConfig:
    """Fine-tune hyperparameters (CLI flags on ``cli/qat.py``). Small LR,
    short horizon: QAT is a repair pass, not training."""

    steps: int = 200
    learning_rate: float = 1e-5
    grad_clip_norm: float = 1.0
    calib_batches: int = 1  # loader batches used for activation calibration


def make_qat_optimizer(cfg: QatConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(optax.adam(cfg.learning_rate))
    return optax.chain(*chain)
