"""Training step: fused augment -> forward -> loss -> grad -> update.

Replaces the reference's ``train.py`` graph build + ``sess.run(train_op)``
loop (SURVEY.md §3.2). One jitted function per input dim carries the whole
step; under a sharded-batch jit, XLA inserts the gradient all-reduce over
ICI automatically (no explicit psum needed — GSPMD derives it from the
replicated-param / sharded-batch layout).

Multi-scale training (BASELINE config 4) is handled by compiling one step
variant per input dim (bucketed static shapes, SURVEY.md §5 long-axis note);
``MultiScaleSchedule`` cycles dims the way Darknet resized every 10 batches.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from yolojax.data.augment import AugmentConfig, augment_batch
from yolojax.models import Model
from yolojax.train.losses import (
    YoloV1LossConfig,
    YoloV2LossConfig,
    yolo_v1_loss,
    yolo_v2_loss,
)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors the reference's [train] INI section (SURVEY.md §2: optimizer
    selection Adam/momentum/RMSProp, learning rate, gradient clipping)."""

    optimizer: str = "momentum"  # adam | momentum | rmsprop | sgd | adamw
    learning_rate: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    grad_clip_norm: float = 0.0  # 0 disables
    # schedule: constant | exponential | cosine | steps
    schedule: str = "constant"
    decay_steps: int = 100_000
    decay_rate: float = 0.1
    warmup_steps: int = 0
    # warmup ramp shape: lr * (step/warmup)^power. 1 = linear; 4 = Darknet's
    # burn_in curve (region-training recipe the reference's models assume)
    warmup_power: float = 1.0
    # "steps" schedule: scale lr by gamma at each boundary (Darknet-style)
    boundaries: Tuple[int, ...] = ()
    gamma: float = 0.1
    # Polyak-averaged eval weights (tf.train.ExponentialMovingAverage
    # analogue); 0 disables. The averaged copy lives inside opt_state and
    # rides checkpoints; detect/eval select it with use_ema=1.
    ema_decay: float = 0.0
    # average gradients over k mini-steps before one optimizer update
    # (large effective batches past the per-step HBM envelope); 1 disables
    grad_accum: int = 1


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    base = cfg.learning_rate
    if cfg.schedule == "constant":
        sched = optax.constant_schedule(base)
    elif cfg.schedule == "exponential":
        sched = optax.exponential_decay(base, cfg.decay_steps, cfg.decay_rate)
    elif cfg.schedule == "cosine":
        sched = optax.cosine_decay_schedule(base, cfg.decay_steps)
    elif cfg.schedule == "steps":
        sched = optax.piecewise_constant_schedule(
            base, {int(b): cfg.gamma for b in cfg.boundaries}
        )
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    if cfg.warmup_steps > 0:
        # lr * (step/warmup)^power — Darknet's burn_in curve (power 4 there;
        # optax.polynomial_schedule curves the other way, 1-(1-x)^p)
        def warm(count, _n=float(cfg.warmup_steps), _p=cfg.warmup_power):
            frac = jnp.clip(count / _n, 0.0, 1.0)
            return base * frac ** _p

        sched = optax.join_schedules([warm, sched], [cfg.warmup_steps])
    return sched


def decay_mask(params: Any) -> Any:
    """L2/weight decay applies to conv/dense kernels only (ndim >= 2),
    never to BN scale/bias or conv biases — the Darknet convention the
    reference's TF1 slim regularizers followed."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


class EmaState(NamedTuple):
    """State of :func:`ema_transform`. The field name ``ema_params`` is the
    stable lookup key :func:`extract_ema` uses to find the averaged weights
    inside a (possibly raw-restored) opt_state tree — don't rename."""

    ema_params: Any


def ema_transform(decay: float) -> optax.GradientTransformation:
    """Maintain an exponential moving average of the PARAMETERS (not the
    updates — unlike ``optax.ema``). Appended as the LAST link of the chain
    so the incoming ``updates`` are exactly what ``optax.apply_updates``
    will add; ``params + updates`` is therefore the post-step weights.
    TF1 frameworks of the reference's era did the same thing with
    ``tf.train.ExponentialMovingAverage`` after the train op."""

    def init(params):
        # copy=True: e_0 must be a DISTINCT buffer from the live params —
        # the jitted train step donates both, and an aliased leaf trips
        # XLA's "donate the same buffer twice" check
        return EmaState(ema_params=jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("ema_transform needs params")
        new_ema = jax.tree_util.tree_map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema_params, params, updates,
        )
        return updates, EmaState(ema_params=new_ema)

    return optax.GradientTransformation(init, update)


def extract_ema(opt_state: Any) -> Any:
    """Find the EMA param tree inside an opt_state — either a live optax
    state (EmaState namedtuple) or an Orbax raw restore (nested dicts with
    namedtuple fields as keys). Returns None when training ran without
    ``ema_decay``."""
    found = []

    def walk(node):
        if isinstance(node, EmaState):
            found.append(node.ema_params)
            return
        if isinstance(node, dict):
            if "ema_params" in node:
                found.append(node["ema_params"])
                return
            for v in node.values():
                walk(v)
            return
        if isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(opt_state)
    return found[0] if found else None


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    name = cfg.optimizer.lower()
    if name == "adam":
        tx = optax.adam(sched)
    elif name == "adamw":
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay,
                         mask=decay_mask)
    elif name == "momentum":
        tx = optax.sgd(sched, momentum=cfg.momentum)
    elif name == "sgd":
        tx = optax.sgd(sched)
    elif name == "rmsprop":
        tx = optax.rmsprop(sched, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0 and name in ("momentum", "sgd", "rmsprop"):
        chain.append(
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask)
        )
    chain.append(tx)
    if cfg.ema_decay > 0:
        if not (0.0 < cfg.ema_decay < 1.0):
            raise ValueError(f"ema_decay must be in (0,1), got {cfg.ema_decay}")
        # last link: sees the final updates, so it tracks post-step params
        chain.append(ema_transform(cfg.ema_decay))
    out = optax.chain(*chain)
    if cfg.grad_accum > 1:
        # inner chain (incl. schedules and the EMA) advances once per k
        # mini-steps, on the k-mean gradient; intermediate mini-steps emit
        # zero updates so the step loop stays shape-identical
        out = optax.MultiSteps(out, every_k_schedule=int(cfg.grad_accum))
    return out


def default_loss_cfg(model: Model):
    return YoloV2LossConfig() if model.kind == "v2" else YoloV1LossConfig()


def make_head_loss(model: Model, loss_cfg):
    """Head->loss-terms dispatch shared by the train step and the QAT
    fine-tune step (yolojax/quantize/qat.py) so the v1/v2 objective wiring
    lives in exactly one place."""

    def loss_from_head(head, gt_xywh, gt_class, gt_valid):
        if model.kind == "v2":
            return yolo_v2_loss(
                head, model.anchors, gt_xywh, gt_class, gt_valid, loss_cfg
            )
        return yolo_v1_loss(
            head, model.grid, model.boxes_per_cell, model.num_classes,
            gt_xywh, gt_class, gt_valid, loss_cfg,
        )

    return loss_from_head


def prepare_images(rng_aug, images, gt_xywh, gt_valid, dim, aug_cfg,
                   augment: bool):
    """Augment-or-resize front shared by the train and QAT steps. Returns
    (images, gt_xywh, gt_valid) at the step's static ``dim``; ``images``
    should already carry the step's compute dtype (the resample/HSV ops
    are bandwidth-bound and dtype-following)."""
    if augment:
        return augment_batch(rng_aug, images, gt_xywh, gt_valid, dim,
                             aug_cfg)
    if images.shape[1] != dim:
        images = jax.image.resize(
            images, (images.shape[0], dim, dim, 3), "linear"
        )
    return images, gt_xywh, gt_valid


class TrainState(NamedTuple):
    step: jax.Array  # scalar int32
    params: Any
    bn_state: Any
    opt_state: Any


def init_train_state(
    model: Model, tx: optax.GradientTransformation, key: jax.Array, input_dim: int
) -> TrainState:
    params, bn_state = model.init(key, input_dim)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
    )


def make_train_step(
    model: Model,
    tx: optax.GradientTransformation,
    *,
    loss_cfg=None,
    aug_cfg: AugmentConfig = AugmentConfig(),
    augment: bool = True,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    pad_input_channels: int = 0,
):
    """Build the fused train step fn(state, batch, rng, dim) -> (state, metrics).

    ``batch`` = (canvas_images, gt_xywh, gt_class, gt_valid); ``dim`` is the
    static input dim for this compiled variant (multi-scale bucketing).
    ``remat`` wraps the forward pass in ``jax.checkpoint`` — trades FLOPs
    for activation memory (lets batch/dim grow past HBM on big configs).
    """
    if loss_cfg is None:
        loss_cfg = default_loss_cfg(model)
    loss_from_head = make_head_loss(model, loss_cfg)

    @partial(jax.jit, static_argnames=("dim", "with_grads"),
             donate_argnums=(0,))
    def train_step(ts: TrainState, batch, rng: jax.Array, dim: int,
                   with_grads: bool = False):
        images, gt_xywh, gt_class, gt_valid = batch
        rng = jax.random.fold_in(rng, ts.step)
        rng_aug, rng_drop = jax.random.split(rng)
        # cast BEFORE augmentation: bf16 halves the resample/HSV traffic
        # (box math stays f32 inside augment_batch)
        images, gt_xywh, gt_valid = prepare_images(
            rng_aug, images.astype(compute_dtype), gt_xywh, gt_valid, dim,
            aug_cfg, augment,
        )

        def forward(params, images):
            return model.apply(
                params, ts.bn_state, images, train=True, rng=rng_drop,
                compute_dtype=compute_dtype,
                pad_input_channels=pad_input_channels,
            )

        fwd = jax.checkpoint(forward) if remat else forward

        def loss_fn(params):
            head, new_bn = fwd(params, images)
            terms = loss_from_head(head, gt_xywh, gt_class, gt_valid)
            return terms["total"], (terms, new_bn)

        grads, (terms, new_bn) = jax.grad(loss_fn, has_aux=True)(ts.params)
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        metrics = {k: v for k, v in terms.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        if with_grads:
            # full gradient tree for histogram summaries (SURVEY §2
            # "histograms of vars/grads"); a separate compiled variant so
            # the common path never materializes this extra output
            metrics["grads"] = grads
        return (
            TrainState(ts.step + 1, new_params, new_bn, new_opt),
            metrics,
        )

    return train_step


@dataclasses.dataclass
class MultiScaleSchedule:
    """Darknet-style multi-scale input schedule: cycle through dims every
    ``every`` steps, pseudo-randomly but deterministically (BASELINE cfg 4).
    Static-shape friendly: callers pre-compile one step per dim."""

    dims: Tuple[int, ...] = tuple(range(320, 609, 32))
    every: int = 10
    seed: int = 0

    def dim_at(self, step: int) -> int:
        period = step // self.every
        # cheap deterministic LCG so dims don't just cycle in order
        h = (period * 2654435761 + self.seed) & 0xFFFFFFFF
        return self.dims[h % len(self.dims)]
