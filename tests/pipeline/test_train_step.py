"""Train-step tests: overfit descent, DP/TP sharding equivalence on the
virtual 8-device CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp

from yolojax.models import Model
from yolojax.nn.layers import ConvSpec, MaxPoolSpec
from yolojax.parallel.mesh import (
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from yolojax.train.step import (
    MultiScaleSchedule,
    OptimizerConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)

ANCHORS = ((1.0, 1.0), (2.5, 2.5))


def micro_model(num_classes=3):
    """4-downsample micro YOLOv2 for fast CPU tests."""
    a = len(ANCHORS)
    specs = (
        ConvSpec(8, 3),
        MaxPoolSpec(),
        ConvSpec(16, 3),
        MaxPoolSpec(),
        ConvSpec(a * (5 + num_classes), 1, bn=False, act="linear"),
    )
    return Model(
        "yolo2", "micro", "v2", specs, num_classes, 4, anchors=ANCHORS
    )


def _batch(n=8, canvas=32, g=4, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.uniform(0, 1, (n, canvas, canvas, 3)).astype(np.float32)
    boxes = np.zeros((n, g, 4), np.float32)
    boxes[:, 0] = [0.4, 0.5, 0.3, 0.3]
    boxes[:, 1] = [0.7, 0.3, 0.2, 0.2]
    cls = rng.randint(0, 3, (n, g)).astype(np.int32)
    valid = np.zeros((n, g), bool)
    valid[:, :2] = True
    return (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(cls),
            jnp.asarray(valid))


def test_overfit_loss_decreases():
    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="adam", learning_rate=3e-3,
                                        weight_decay=0.0))
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    step = make_train_step(model, tx, augment=False,
                           compute_dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        ts, metrics = step(ts, batch, rng, dim=32)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0] * 0.5, losses[::5]
    assert np.isfinite(losses).all()


def test_train_step_with_augmentation_runs():
    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="momentum",
                                        learning_rate=1e-3))
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    step = make_train_step(model, tx, augment=True,
                           compute_dtype=jnp.float32)
    ts, metrics = step(ts, _batch(), jax.random.PRNGKey(1), dim=32)
    assert np.isfinite(float(metrics["total"]))
    assert int(ts.step) == 1


def _run_steps(ts, step, batch, rng, n, dim=32):
    ms = None
    for _ in range(n):
        ts, ms = step(ts, batch, rng, dim=dim)
    return ts, ms


def test_dp_sharding_matches_single_device():
    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="sgd", learning_rate=1e-2,
                                        weight_decay=0.0))
    step = make_train_step(model, tx, augment=False,
                           compute_dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(1)

    # single device (fresh state: the step donates its input state)
    ts_a = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    ts_a, m_a = _run_steps(ts_a, step, batch, rng, 3)

    # 8-way data parallel: replicate state, shard batch
    mesh = make_mesh(data=8, model=1)
    rep = replicated(mesh)
    ts_b = jax.device_put(init_train_state(model, tx, jax.random.PRNGKey(0), 32), rep)
    sharded = shard_batch(mesh, batch)
    ts_b, m_b = _run_steps(ts_b, step, sharded, rng, 3)

    np.testing.assert_allclose(float(m_a["total"]), float(m_b["total"]),
                               rtol=1e-5)
    la = jax.tree_util.tree_leaves(ts_a.params)
    lb = jax.tree_util.tree_leaves(ts_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_param_sharding_runs_and_matches():
    # 4x2 mesh: data parallel + tensor-parallel conv channels
    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="sgd", learning_rate=1e-2,
                                        weight_decay=0.0))
    step = make_train_step(model, tx, augment=False,
                           compute_dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    ts_a = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    ts_a, m_a = _run_steps(ts_a, step, batch, rng, 2)

    ts0 = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    mesh = make_mesh(data=4, model=2)
    pshard = param_shardings(mesh, ts0.params, tp_threshold=16)
    params = jax.tree_util.tree_map(jax.device_put, ts0.params, pshard)
    # sanity: at least one leaf actually sharded over "model"
    kinds = {
        str(s.spec) for s in jax.tree_util.tree_leaves(
            param_shardings(mesh, ts0.params, tp_threshold=16),
            is_leaf=lambda x: hasattr(x, "spec"))
    }
    assert any("model" in k for k in kinds), kinds
    ts_b = TrainState(
        jax.device_put(ts0.step, replicated(mesh)),
        params,
        jax.device_put(ts0.bn_state, replicated(mesh)),
        jax.device_put(ts0.opt_state, replicated(mesh)),
    )
    ts_b, m_b = _run_steps(ts_b, step, shard_batch(mesh, batch), rng, 2)
    np.testing.assert_allclose(float(m_a["total"]), float(m_b["total"]),
                               rtol=1e-4)


def test_zero1_opt_sharding_matches_replicated():
    """train.zero: ZeRO-1 optimizer-state sharding over the data axis is a
    LAYOUT choice — training must land on the same params as the fully
    replicated run, while each chip addresses only 1/N of the momentum/EMA
    buffers."""
    from yolojax.parallel.mesh import opt_state_shardings

    model = micro_model()
    mk = lambda: make_optimizer(OptimizerConfig(
        optimizer="momentum", learning_rate=1e-2, weight_decay=0.0,
        ema_decay=0.9))
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    mesh = make_mesh(data=8, model=1)

    tx = mk()
    step = make_train_step(model, tx, augment=False,
                           compute_dtype=jnp.float32)
    ts_a = jax.device_put(
        init_train_state(model, tx, jax.random.PRNGKey(0), 32),
        replicated(mesh))
    ts_a, _ = _run_steps(ts_a, step, shard_batch(mesh, batch), rng, 3)

    tx2 = mk()
    step2 = make_train_step(model, tx2, augment=False,
                            compute_dtype=jnp.float32)
    ts0 = init_train_state(model, tx2, jax.random.PRNGKey(0), 32)
    opt = jax.tree_util.tree_map(
        jax.device_put, ts0.opt_state,
        opt_state_shardings(mesh, ts0.opt_state))
    # the layout really is distributed: some leaf's local shard < global
    shard_frac = [
        l.addressable_shards[0].data.size / l.size
        for l in jax.tree_util.tree_leaves(opt) if l.size >= 8
    ]
    assert min(shard_frac) == 1 / 8, shard_frac
    ts_b = TrainState(
        jax.device_put(ts0.step, replicated(mesh)),
        jax.device_put(ts0.params, replicated(mesh)),
        jax.device_put(ts0.bn_state, replicated(mesh)),
        opt,
    )
    ts_b, _ = _run_steps(ts_b, step2, shard_batch(mesh, batch), rng, 3)

    for a, b in zip(jax.tree_util.tree_leaves(ts_a.params),
                    jax.tree_util.tree_leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # the EMA inside the sharded opt_state matches too (device_get gathers)
    from yolojax.train.step import extract_ema

    ea = jax.device_get(extract_ema(ts_a.opt_state))
    eb = jax.device_get(extract_ema(ts_b.opt_state))
    for a, b in zip(jax.tree_util.tree_leaves(ea),
                    jax.tree_util.tree_leaves(eb)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_zero1_with_tp_composed_layout_matches_single():
    """The composed ZeRO-1 x TP optimizer-state layout (model axis kept from
    the param, data axis on another dim) is still pure layout: a 4x2 DP x TP
    mesh with both param AND opt-state sharding lands on the same params as
    the single-device run."""
    from yolojax.parallel.mesh import opt_state_shardings

    model = micro_model()
    mk = lambda: make_optimizer(OptimizerConfig(
        optimizer="momentum", learning_rate=1e-2, weight_decay=0.0,
        ema_decay=0.9))
    batch = _batch()
    rng = jax.random.PRNGKey(1)

    tx = mk()
    step = make_train_step(model, tx, augment=False,
                           compute_dtype=jnp.float32)
    ts_a = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    ts_a, _ = _run_steps(ts_a, step, batch, rng, 3)

    mesh = make_mesh(data=4, model=2)
    tx2 = mk()
    step2 = make_train_step(model, tx2, augment=False,
                            compute_dtype=jnp.float32)
    ts0 = init_train_state(model, tx2, jax.random.PRNGKey(0), 32)
    pshard = param_shardings(mesh, ts0.params, tp_threshold=16)
    params = jax.tree_util.tree_map(jax.device_put, ts0.params, pshard)
    oshard = opt_state_shardings(mesh, ts0.opt_state, tp_threshold=16)
    opt = jax.tree_util.tree_map(jax.device_put, ts0.opt_state, oshard)
    # at least one buffer really landed on the composed model+data layout
    specs = {str(s.spec) for s in jax.tree_util.tree_leaves(
        oshard, is_leaf=lambda x: hasattr(x, "spec"))}
    assert any("model" in sp and "data" in sp for sp in specs), specs
    ts_b = TrainState(
        jax.device_put(ts0.step, replicated(mesh)),
        params,
        jax.device_put(ts0.bn_state, replicated(mesh)),
        opt,
    )
    ts_b, _ = _run_steps(ts_b, step2, shard_batch(mesh, batch), rng, 3)
    for a, b in zip(jax.tree_util.tree_leaves(ts_a.params),
                    jax.tree_util.tree_leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_zero1_opt_sharding_composes_with_tp():
    """Buffers of TP-sharded params keep the param's "model"-axis dim and
    take the ZeRO data shard on ANOTHER dim (or compose both axes on the one
    dim for 1-D BN buffers) — a data-only spec on the model-sharded dim would
    force GSPMD to reshard those buffers against the gradient layout every
    step (ADVICE r3)."""
    from jax.sharding import PartitionSpec as P

    from yolojax.parallel.mesh import opt_state_shardings

    mesh = make_mesh(data=4, model=2)
    fake = {
        "fat_kernel": jnp.zeros((3, 3, 512, 1024)),   # TP dim 3
        "fat_bn": jnp.zeros((1024,)),                 # TP dim 0 (only dim)
        "thin_kernel": jnp.zeros((3, 3, 3, 32)),      # replicated over model
        "scalar": jnp.zeros(()),
    }
    sh = opt_state_shardings(mesh, fake)
    assert sh["fat_kernel"].spec == P(None, None, "data", "model")
    assert sh["fat_bn"].spec == P(("model", "data"))
    assert sh["thin_kernel"].spec == P(None, None, None, "data")
    assert sh["scalar"].spec == P()


def test_multiscale_schedule_deterministic():
    sched = MultiScaleSchedule(dims=(320, 352, 384), every=10, seed=1)
    dims = [sched.dim_at(s) for s in range(40)]
    assert dims == [sched.dim_at(s) for s in range(40)]
    assert all(d in (320, 352, 384) for d in dims)
    # constant within a period, changes across periods somewhere
    assert len(set(dims[:10])) == 1
    assert len(set(dims)) > 1


def test_optimizer_schedules():
    for sch in ("constant", "exponential", "cosine", "steps"):
        cfg = OptimizerConfig(schedule=sch, boundaries=(5, 10),
                              warmup_steps=2)
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones((3,))}
        st = tx.init(params)
        up, _ = tx.update({"w": jnp.ones((3,))}, st, params)
        assert np.isfinite(np.asarray(up["w"])).all()


def test_warmup_power_burn_in_curve():
    """warmup_power=4 reproduces Darknet's burn_in ramp lr*(t/N)^4; the
    default stays linear, and both hand off to the base schedule at N."""
    from yolojax.train.step import make_schedule

    base = 1e-2
    for p in (1.0, 4.0):
        sched = make_schedule(OptimizerConfig(
            learning_rate=base, schedule="constant",
            warmup_steps=100, warmup_power=p))
        np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
        np.testing.assert_allclose(float(sched(50)), base * 0.5 ** p,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sched(100)), base, rtol=1e-6)
        np.testing.assert_allclose(float(sched(5000)), base, rtol=1e-6)


def test_train_step_bf16_compute():
    """Mixed-precision path must be differentiable (regression: fp32-out
    bf16-in conv broke the VJP with a dtype mismatch)."""
    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="sgd", learning_rate=1e-3,
                                        weight_decay=0.0))
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    step = make_train_step(model, tx, augment=True,
                           compute_dtype=jnp.bfloat16)
    ts, m = step(ts, _batch(), jax.random.PRNGKey(1), dim=32)
    assert np.isfinite(float(m["total"]))


def test_train_step_remat_matches_no_remat():
    """jax.checkpoint changes memory, not math."""
    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="sgd", learning_rate=1e-2,
                                        weight_decay=0.0))
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    outs = []
    for remat in (False, True):
        ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
        step = make_train_step(model, tx, augment=False,
                               compute_dtype=jnp.float32, remat=remat)
        ts, m = step(ts, batch, rng, dim=32)
        outs.append((float(m["total"]), ts.params))
    assert np.isclose(outs[0][0], outs[1][0], rtol=1e-6)
    la = jax.tree_util.tree_leaves(outs[0][1])
    lb = jax.tree_util.tree_leaves(outs[1][1])
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_weight_decay_masks_bn_and_biases():
    """L2 decay applies to conv/dense kernels only; BN scale/bias and conv
    biases must see a zero decay contribution (Darknet convention)."""
    from yolojax.train.step import decay_mask

    wd = 0.1
    tx = make_optimizer(OptimizerConfig(optimizer="sgd", learning_rate=1.0,
                                        weight_decay=wd))
    params = {
        "conv": {"w": jnp.ones((3, 3, 4, 8)), "b": jnp.ones((8,))},
        "bn": {"scale": jnp.ones((8,)), "bias": jnp.ones((8,))},
        "dense": {"w": jnp.ones((16, 4))},
    }
    mask = decay_mask(params)
    assert mask["conv"]["w"] and mask["dense"]["w"]
    assert not (mask["conv"]["b"] or mask["bn"]["scale"] or mask["bn"]["bias"])

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    st = tx.init(params)
    up, _ = tx.update(zeros, st, params)  # zero grads isolate the decay term
    # sgd(lr=1.0): update = -(grad + wd*mask*param) = -wd on kernels, 0 else
    np.testing.assert_allclose(np.asarray(up["conv"]["w"]), -wd, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(up["dense"]["w"]), -wd, rtol=1e-6)
    assert not np.asarray(up["conv"]["b"]).any()
    assert not np.asarray(up["bn"]["scale"]).any()
    assert not np.asarray(up["bn"]["bias"]).any()


def test_ema_tracks_polyak_average():
    """[train] ema_decay keeps e_t = d*e_{t-1} + (1-d)*p_t inside opt_state
    (tf.train.ExponentialMovingAverage analogue), without perturbing the
    parameter trajectory itself."""
    from yolojax.train.step import extract_ema

    d = 0.5  # large (1-d) so drift is visible in 3 steps
    base = OptimizerConfig(optimizer="sgd", learning_rate=1e-2,
                           weight_decay=0.0)
    tx_plain = make_optimizer(base)
    tx_ema = make_optimizer(
        OptimizerConfig(**{**base.__dict__, "ema_decay": d}))
    batch = _batch()
    rng = jax.random.PRNGKey(1)

    ts_p = init_train_state(micro_model(), tx_plain, jax.random.PRNGKey(0), 32)
    step_p = make_train_step(micro_model(), tx_plain, augment=False,
                             compute_dtype=jnp.float32)
    ts_e = init_train_state(micro_model(), tx_ema, jax.random.PRNGKey(0), 32)
    step_e = make_train_step(micro_model(), tx_ema, augment=False,
                             compute_dtype=jnp.float32)

    expect = jax.device_get(ts_e.params)  # e_0 = p_0
    for _ in range(3):
        ts_p, _ = step_p(ts_p, batch, rng, dim=32)
        ts_e, _ = step_e(ts_e, batch, rng, dim=32)
        # EMA must not change the updates: trajectories stay identical
        for a, b in zip(jax.tree_util.tree_leaves(ts_p.params),
                        jax.tree_util.tree_leaves(ts_e.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)
        expect = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            expect, jax.device_get(ts_e.params))
    ema = extract_ema(ts_e.opt_state)
    assert ema is not None
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(jax.device_get(ema))):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)
    # EMA differs from the live params (it lags the trajectory)
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ema)),
                             jax.tree_util.tree_leaves(
                                 jax.device_get(ts_e.params)))]
    assert max(diffs) > 0

    assert extract_ema(ts_p.opt_state) is None  # plain run has no EMA


def test_grad_accum_matches_full_batch_update():
    """grad_accum=k averages k mini-step gradients into one optimizer
    update: feeding the SAME batch k times must land exactly where one
    un-accumulated step on that batch lands, with params frozen on the
    intermediate mini-steps."""
    base = OptimizerConfig(optimizer="momentum", learning_rate=1e-2,
                           weight_decay=0.0)
    batch = _batch()
    rng = jax.random.PRNGKey(1)

    tx1 = make_optimizer(base)
    ts1 = init_train_state(micro_model(), tx1, jax.random.PRNGKey(0), 32)
    step1 = make_train_step(micro_model(), tx1, augment=False,
                            compute_dtype=jnp.float32)
    ts1, _ = step1(ts1, batch, rng, dim=32)

    txk = make_optimizer(
        OptimizerConfig(**{**base.__dict__, "grad_accum": 2}))
    tsk = init_train_state(micro_model(), txk, jax.random.PRNGKey(0), 32)
    stepk = make_train_step(micro_model(), txk, augment=False,
                            compute_dtype=jnp.float32)
    p0 = jax.device_get(tsk.params)
    tsk, _ = stepk(tsk, batch, rng, dim=32)
    # mini-step 1: gradients accumulated, params untouched
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(jax.device_get(tsk.params))):
        np.testing.assert_array_equal(a, b)
    tsk, _ = stepk(tsk, batch, rng, dim=32)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ts1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tsk.params))):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_ema_survives_checkpoint_and_feeds_inference(tmp_path):
    """The EMA tree rides Orbax inside opt_state; load_weights(use_ema=True)
    serves it to detect/eval, and refuses sources that can't carry it."""
    import pytest

    from yolojax.train.checkpoint import Checkpointer
    from yolojax.train.step import extract_ema
    from yolojax.utils.restore import load_weights

    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="sgd", learning_rate=1e-2,
                                        weight_decay=0.0, ema_decay=0.9))
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    step = make_train_step(model, tx, augment=False,
                           compute_dtype=jnp.float32)
    for _ in range(2):
        ts, _ = step(ts, _batch(), jax.random.PRNGKey(1), dim=32)
    live_ema = jax.device_get(extract_ema(ts.opt_state))

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(2, jax.device_get(ts), force=True)
    ckpt.wait()
    ckpt.close()

    params, bn_state = load_weights(str(tmp_path), model, 32, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(live_ema),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7)
    assert set(bn_state) == set(ts.bn_state)

    with pytest.raises(ValueError, match="Orbax checkpoint dir"):
        load_weights("weights.npz", model, 32, use_ema=True)

    # a run without ema_decay: explicit error, not silent live weights
    tx2 = make_optimizer(OptimizerConfig(optimizer="sgd"))
    ts2 = init_train_state(model, tx2, jax.random.PRNGKey(0), 32)
    ckpt2 = Checkpointer(str(tmp_path / "plain" / "ckpt"))
    ckpt2.save(1, jax.device_get(ts2), force=True)
    ckpt2.wait()
    ckpt2.close()
    with pytest.raises(ValueError, match="no EMA"):
        load_weights(str(tmp_path / "plain"), model, 32, use_ema=True)


def test_train_step_with_grads_returns_grad_tree(tmp_path):
    """Gradient histogram path (SURVEY §2 summaries row "vars/grads"):
    the with_grads step variant returns the full gradient tree, and
    MetricsLogger emits hist/grad/... rows from it."""
    import json

    from yolojax.utils.metrics import MetricsLogger

    model = micro_model()
    tx = make_optimizer(OptimizerConfig(optimizer="sgd", learning_rate=1e-3))
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    step = make_train_step(model, tx, augment=False,
                           compute_dtype=jnp.float32)
    batch = _batch()
    ts, m = step(ts, batch, jax.random.PRNGKey(1), dim=32)
    assert "grads" not in m  # common path stays lean
    ts, m = step(ts, batch, jax.random.PRNGKey(1), dim=32, with_grads=True)
    grads = m.pop("grads")
    assert set(grads) == set(ts.params)
    assert float(jnp.abs(grads["conv_0"]["w"]).sum()) > 0

    logger = MetricsLogger(str(tmp_path))
    logger.log_histograms(5, jax.device_get(grads), prefix="hist/grad/")
    logger.close()
    rows = [json.loads(l) for l in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    keys = {k for r in rows for k in r}
    assert any(k.startswith("hist/grad/conv_0/w") for k in keys), keys
    (rec,) = rows
    stats = rec["hist/grad/conv_0/w"]
    assert stats["min"] <= stats["p50"] <= stats["max"]
