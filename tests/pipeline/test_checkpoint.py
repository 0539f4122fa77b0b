"""Checkpoint save/restore-latest roundtrip (SURVEY.md §5 contract)."""

import numpy as np
import jax
import jax.numpy as jnp

from yolojax.train.checkpoint import Checkpointer
from yolojax.train.step import (
    OptimizerConfig,
    init_train_state,
    make_optimizer,
)
from tests.pipeline.test_train_step import micro_model


def test_checkpoint_roundtrip(tmp_path):
    model = micro_model()
    tx = make_optimizer(OptimizerConfig())
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    ts = ts._replace(step=jnp.asarray(7, jnp.int32))

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    assert ckpt.latest_step() is None
    step, restored = ckpt.restore_latest(ts)
    assert step is None  # no checkpoint yet -> template returned

    ckpt.save(7, ts, force=True)
    ckpt.wait()
    assert ckpt.latest_step() == 7

    # restore into a freshly-initialized template
    template = init_train_state(model, tx, jax.random.PRNGKey(99), 32)
    step, restored = ckpt.restore_latest(template)
    assert step == 7
    la = jax.tree_util.tree_leaves(ts.params)
    lb = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 7
    ckpt.close()


def test_checkpoint_layout_mismatch_names_the_cause(tmp_path):
    """Resuming with a different optimizer-state layout (e.g. EMA enabled
    after the run started) must fail with a message naming the flag-layout
    mismatch, not an opaque Orbax tree-structure error (ADVICE r3)."""
    import pytest

    model = micro_model()
    tx = make_optimizer(OptimizerConfig())
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(5, ts, force=True)
    ckpt.wait()

    tx_ema = make_optimizer(OptimizerConfig(ema_decay=0.99))
    template = init_train_state(model, tx_ema, jax.random.PRNGKey(0), 32)
    with pytest.raises(RuntimeError, match="ema_decay"):
        ckpt.restore_latest(template)
    ckpt.close()


def test_checkpoint_keeps_latest(tmp_path):
    model = micro_model()
    tx = make_optimizer(OptimizerConfig())
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 32)
    ckpt = Checkpointer(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        ckpt.save(s, ts._replace(step=jnp.asarray(s, jnp.int32)), force=True)
    ckpt.wait()
    assert ckpt.latest_step() == 3
    step, restored = ckpt.restore_latest(ts)
    assert step == 3 and int(restored.step) == 3
    ckpt.close()
