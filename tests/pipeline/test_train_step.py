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
