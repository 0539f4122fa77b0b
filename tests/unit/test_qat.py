"""QAT: fake-quant forward must simulate the int8 deployment graph, the
straight-through estimator must pass gradients, fine-tuning must beat PTQ
on the quantized objective, and the identity-BN re-embedding must round-trip
through fold_bn exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from yolojax.convert.fold import fold_bn
from yolojax.models import get_model
from yolojax.quantize.ptq import apply_int8, calibrate, quantize_model
from yolojax.quantize.qat import (
    QatState,
    fake_quant,
    make_qat_step,
    qat_forward,
    reembed_folded,
    weight_scale,
)


def test_fake_quant_value_and_ste_gradient():
    x = jnp.asarray([-300.0, -1.05, -0.5, 0.0, 0.49, 1.0, 250.0])
    scale = 1.0
    got = fake_quant(x, scale)
    want = np.clip(np.round(np.asarray(x) / scale), -127, 127) * scale
    np.testing.assert_allclose(np.asarray(got), want)
    # straight-through: gradient is identity everywhere (incl. the
    # clipped tail, by design — saturated activations stay trainable)
    g = jax.grad(lambda t: jnp.sum(fake_quant(t, scale) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * want, rtol=1e-6)


def test_weight_scale_matches_ptq_export_formula():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    s = np.asarray(weight_scale(w))
    want = np.maximum(np.abs(np.asarray(w)).max(axis=(0, 1, 2)), 1e-8) / 127.0
    np.testing.assert_allclose(s, want, rtol=1e-6)
    assert s.shape == (16,)


@pytest.fixture(scope="module")
def folded_darknet():
    model = get_model("yolo2", "darknet", num_classes=4)
    params, state = model.init(jax.random.PRNGKey(0), 64)
    return fold_bn(model, params, state)


def test_qat_forward_tracks_real_int8_graph(folded_darknet):
    """The fake-quant training graph and the deployed int8 graph must agree
    given the same scales — otherwise QAT optimizes the wrong numerics.
    Differences left: int32 vs f32 accumulation and the bf16 head."""
    model, params, _ = folded_darknet
    rng = np.random.RandomState(0)
    calib = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    qm = quantize_model(model, params, calib)

    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    sim = np.asarray(qat_forward(
        model, params, x, qm.input_scale, qm.act_scales)).ravel()
    real = np.asarray(apply_int8(qm, x)).ravel()
    cos = float(np.dot(sim, real)
                / (np.linalg.norm(sim) * np.linalg.norm(real)))
    assert cos > 0.999, cos
    rel = np.abs(sim - real).mean() / (np.abs(real).mean() + 1e-9)
    assert rel < 0.05, rel


def test_qat_forward_tracks_int8_v1_dense_stack():
    model = get_model("yolo", "tiny", num_classes=3)
    params, state = model.init(jax.random.PRNGKey(1), 64)
    model, params, state = fold_bn(model, params, state)
    rng = np.random.RandomState(1)
    calib = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    qm = quantize_model(model, params, calib)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    sim = np.asarray(qat_forward(
        model, params, x, qm.input_scale, qm.act_scales)).ravel()
    real = np.asarray(apply_int8(qm, x)).ravel()
    cos = float(np.dot(sim, real)
                / (np.linalg.norm(sim) * np.linalg.norm(real)))
    assert cos > 0.999, cos


def test_qat_forward_rejects_unfolded_model():
    model = get_model("yolo2", "tiny", num_classes=2)
    params, _ = model.init(jax.random.PRNGKey(0), 32)
    with pytest.raises(ValueError, match="fold_bn"):
        qat_forward(model, params, jnp.zeros((1, 32, 32, 3)), 1.0,
                    [1.0] * len(model.specs))


def test_qat_fine_tune_beats_ptq_on_quantized_objective():
    """The mechanism test: distill a folded conv stack toward its own f32
    outputs under fake-quant. After a few adam steps the REAL int8 graph
    (re-exported from the tuned weights) must track the f32 target better
    than straight PTQ of the original weights."""
    model = get_model("yolo2", "tiny", num_classes=2)
    params, state = model.init(jax.random.PRNGKey(7), 32)
    model, params, _ = fold_bn(model, params, state)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    target, _ = model.apply(params, {}, x, compute_dtype=jnp.float32)
    in_scale, act_scales = calibrate(model, params, x)

    def int8_err(p):
        qm = quantize_model(model, jax.device_get(p), x)
        out = apply_int8(qm, x)
        return float(jnp.mean((out - target) ** 2))

    err_ptq = int8_err(params)

    tx = optax.adam(1e-4)

    @jax.jit
    def step(p, opt):
        def loss_fn(q):
            out = qat_forward(model, q, x, in_scale, act_scales)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    p, opt = params, tx.init(params)
    first = last = None
    for _ in range(60):
        p, opt, loss = step(p, opt)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first  # the STE actually descends
    err_qat = int8_err(p)
    assert err_qat < err_ptq, (err_qat, err_ptq)


def test_qat_step_descends_detection_loss():
    """make_qat_step wires the real YOLO objective + augmentation; the loss
    must fall over a short overfit on one synthetic batch."""
    model = get_model("yolo2", "tiny", num_classes=2)
    params, state = model.init(jax.random.PRNGKey(3), 32)
    model, params, _ = fold_bn(model, params, state)

    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    gt_xywh = jnp.tile(jnp.asarray([[0.5, 0.5, 0.4, 0.4]], jnp.float32),
                       (4, 1))[:, None, :]
    gt_class = jnp.zeros((4, 1), jnp.int32)
    gt_valid = jnp.ones((4, 1), jnp.bool_)
    batch = (images, gt_xywh, gt_class, gt_valid)

    in_scale, act_scales = calibrate(model, params, images)
    tx = optax.adam(1e-3)
    step = make_qat_step(model, tx, in_scale, act_scales, augment=False)
    st = QatState(jnp.zeros((), jnp.int32), params, tx.init(params))
    key = jax.random.PRNGKey(0)
    first = last = None
    for _ in range(25):
        st, m = step(st, batch, key, dim=32)
        if first is None:
            first = float(m["total"])
        last = float(m["total"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert int(st.step) == 25


def test_reembed_roundtrips_through_fold():
    """identity-BN re-embedding: fold_bn(reembed(folded)) == folded to
    1 f32 ulp, and the registry model's eval forward on the re-embedded
    checkpoint matches the folded forward."""
    registry = get_model("yolo2", "tiny", num_classes=2)
    params0, state0 = registry.init(jax.random.PRNGKey(5), 32)
    folded_model, folded_params, _ = fold_bn(registry, params0, state0)

    re_params, re_state = reembed_folded(registry, folded_params)
    # structure matches a fresh registry init (so the .npz loads anywhere)
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, re_params)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, params0))
    assert set(re_state) == set(state0)

    _, refolded, _ = fold_bn(registry, re_params, re_state)
    for name, layer in folded_params.items():
        for k, v in layer.items():
            got = np.asarray(refolded[name][k], np.float32)
            want = np.asarray(v, np.float32)
            np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-7,
                                       err_msg=f"{name}/{k}")

    x = jnp.asarray(np.random.RandomState(5)
                    .uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    want, _ = folded_model.apply(folded_params, {}, x,
                                 compute_dtype=jnp.float32)
    got, _ = registry.apply(re_params, re_state, x,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_low_bit_grid_codes_and_graph_agreement(folded_darknet):
    """detect.quant_bits < 8: codes must stay within ±(2^(b-1)-1), the
    grid must be measurably coarser than int8, and the fake-quant
    training graph must track the deployed low-bit graph (what
    cli/qat.py --bits fine-tunes under)."""
    model, params, _ = folded_darknet
    rng = np.random.RandomState(3)
    calib = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    qm4 = quantize_model(model, params, calib, bits=4)
    assert qm4.qmax == 7
    for name, lp in qm4.qparams.items():
        if "w_q" in lp:
            assert np.abs(lp["w_q"]).max() <= 7
    qm8 = quantize_model(model, params, calib)
    assert qm8.qmax == 127
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    out4 = np.asarray(apply_int8(qm4, x)).ravel()
    out8 = np.asarray(apply_int8(qm8, x)).ravel()
    # the 4-bit head output must differ materially from int8 (real error)
    assert np.abs(out4 - out8).mean() > 1e-3
    sim = np.asarray(qat_forward(
        model, params, x, qm4.input_scale, qm4.act_scales,
        qmax=qm4.qmax)).ravel()
    cos = float(np.dot(sim, out4)
                / (np.linalg.norm(sim) * np.linalg.norm(out4)))
    assert cos > 0.99, cos


def test_quantize_model_rejects_bad_bits():
    model = get_model("yolo2", "tiny", num_classes=2)
    params, state = model.init(jax.random.PRNGKey(0), 32)
    model, params, _ = fold_bn(model, params, state)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="bits"):
        quantize_model(model, params, x, bits=9)
    with pytest.raises(ValueError, match="bits"):
        quantize_model(model, params, x, bits=1)


def test_low_bit_qat_repairs_ptq_regression():
    """The repair claim at the grid where PTQ genuinely hurts: at 4 bits
    the PTQ output error vs f32 is large; fine-tuning under the 4-bit
    fake-quant graph must recover a substantial fraction of it (the
    mAP-level version is gated in tests/e2e/test_real_backbone_quality.py)."""
    model = get_model("yolo2", "tiny", num_classes=2)
    params, state = model.init(jax.random.PRNGKey(9), 32)
    model, params, _ = fold_bn(model, params, state)
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    target, _ = model.apply(params, {}, x, compute_dtype=jnp.float32)
    in_scale, act_scales = calibrate(model, params, x, qmax=7)

    def int8_err(p):
        qm = quantize_model(model, jax.device_get(p), x, bits=4)
        return float(jnp.mean((apply_int8(qm, x) - target) ** 2))

    err_ptq = int8_err(params)
    tx = optax.adam(3e-4)

    @jax.jit
    def step(p, opt):
        def loss_fn(q):
            out = qat_forward(model, q, x, in_scale, act_scales, qmax=7.0)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    p, opt = params, tx.init(params)
    for _ in range(80):
        p, opt, _ = step(p, opt)
    err_qat = int8_err(p)
    # recovers at least 30% of the 4-bit PTQ error on this objective
    assert err_qat < 0.7 * err_ptq, (err_qat, err_ptq)


def test_distill_step_descends_and_beats_ptq():
    """make_qat_distill_step: teacher-matching MSE must fall, and the
    re-exported int8 graph must track the f32 teacher better than PTQ
    of the original weights (the dense-objective variant behind
    cli/qat.py --distill)."""
    from yolojax.quantize.qat import QatState, make_qat_distill_step

    model = get_model("yolo2", "tiny", num_classes=2)
    params, state = model.init(jax.random.PRNGKey(3), 32)
    model, params, _ = fold_bn(model, params, state)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(0, 1, (4, 48, 48, 3)).astype(np.float32))
    calib = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    in_scale, act_scales = calibrate(model, params, calib, qmax=15)

    def err_vs_teacher(p):
        qm = quantize_model(model, jax.device_get(p), calib, bits=5)
        out = apply_int8(qm, jax.image.resize(x, (4, 32, 32, 3), "linear"))
        t, _ = model.apply(params, {},
                           jax.image.resize(x, (4, 32, 32, 3), "linear"),
                           compute_dtype=jnp.float32)
        return float(jnp.mean((out - t) ** 2))

    err_ptq = err_vs_teacher(params)

    tx = optax.adam(2e-4)
    step = make_qat_distill_step(model, tx, in_scale, act_scales,
                                 augment=False, qmax=15.0)
    st = QatState(jnp.zeros((), jnp.int32), params, tx.init(params))
    # the step donates its state; the teacher must be distinct buffers
    teacher = jax.tree_util.tree_map(
        jnp.asarray, jax.device_get(params))
    boxes = jnp.zeros((4, 4, 4), jnp.float32)
    cls = jnp.zeros((4, 4), jnp.int32)
    valid = jnp.zeros((4, 4), bool)
    key = jax.random.PRNGKey(0)
    first = last = None
    for _ in range(40):
        st, m = step(st, (x, boxes, cls, valid), teacher, key, dim=32)
        if first is None:
            first = float(m["distill_mse"])
        last = float(m["distill_mse"])
    assert last < first, (first, last)
    err_qat = err_vs_teacher(st.params)
    assert err_qat < err_ptq, (err_qat, err_ptq)
