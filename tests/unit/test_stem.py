"""Fused stem (packed conv0 + pool) exactness vs the unfused graph."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolojax.convert.fold import fold_bn
from yolojax.models import get_model
from yolojax.nn.stem import fuse_stem, pack_stem_kernel, stem_forward
from yolojax.nn.layers import conv2d, leaky_relu, max_pool


@pytest.mark.parametrize("dim", [32, 64])
def test_stem_forward_matches_unfused(dim):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, dim, dim, 3)).astype(np.float32))
    w0 = rng.normal(0, 0.2, (3, 3, 3, 32)).astype(np.float32)
    b = rng.normal(0, 0.1, (32,)).astype(np.float32)

    ref = conv2d(x, jnp.asarray(w0), 1, compute_dtype=jnp.float32)
    ref = leaky_relu(ref + b)
    ref = max_pool(ref, 2, 2)

    wp = pack_stem_kernel(w0)
    got = stem_forward(x, jnp.asarray(wp), jnp.asarray(b),
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fuse_stem_full_model_matches():
    """fold_bn + fuse_stem on Darknet-19 must not change the head output."""
    model = get_model("yolo2", "darknet", num_classes=4)
    params, state = model.init(jax.random.PRNGKey(0), 64)
    state = jax.tree_util.tree_map(
        lambda s: s + 0.2 * jax.random.uniform(jax.random.PRNGKey(1), s.shape),
        state,
    )
    x = jnp.asarray(
        np.random.RandomState(1).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    fm, fp, fs = fold_bn(model, params, state)
    ref, _ = fm.apply(fp, fs, x, compute_dtype=jnp.float32)

    sm, sp, ss = fuse_stem(fm, fp, fs, impl="xla")
    assert type(sm.specs[0]).__name__ == "StemSpec"
    got, _ = sm.apply(sp, ss, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fuse_stem_pallas_full_model_matches():
    """Pallas stem (interpret mode) through the full model, incl. the NHCW
    layout handoff to the next conv."""
    from jax.experimental.pallas import tpu as pltpu

    model = get_model("yolo2", "tiny", num_classes=4)
    params, state = model.init(jax.random.PRNGKey(2), 64)
    x = jnp.asarray(
        np.random.RandomState(2).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    )
    fm, fp, fs = fold_bn(model, params, state)
    ref, _ = fm.apply(fp, fs, x, compute_dtype=jnp.float32)
    sm, sp, ss = fuse_stem(fm, fp, fs, impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        got, _ = sm.apply(sp, ss, x, compute_dtype=jnp.float32)
    # the Pallas stem computes in bf16 (its design point); tolerance is
    # bf16-ulp scale on the head output
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_fuse_stem_default_off():
    model = get_model("yolo2", "tiny", num_classes=4)
    params, state = model.init(jax.random.PRNGKey(0), 64)
    fm, fp, fs = fold_bn(model, params, state)
    m2, p2, s2 = fuse_stem(fm, fp, fs)  # default impl="off"
    assert m2 is fm and p2 is fp


def test_fuse_stem_skips_non_matching_models():
    """v1 opens with a 7x7 stride-2 conv — fusion must decline, not break."""
    model = get_model("yolo", "yolo", num_classes=3)
    params, state = model.init(jax.random.PRNGKey(0), 64)
    fm, fp, fs = fuse_stem(model, params, state, impl="auto")
    assert fm is model and fp is params
