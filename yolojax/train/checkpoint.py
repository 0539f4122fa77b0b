"""Checkpoint / resume via Orbax (step-numbered dirs, restore-latest).

Replaces the reference's ``tf.train.Saver`` periodic save + automatic
``latest_checkpoint`` restore on train.py restart (SURVEY.md §5 checkpoint/
resume). Same failure-recovery contract: a crash means restart; restart is
idempotent from the latest step.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, directory: str, *, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        import os

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, train_state: Any, *, force: bool = False) -> bool:
        saved = self._mgr.save(
            int(step),
            args=ocp.args.StandardSave(train_state),
            force=force,
        )
        if saved:
            log.info("saved checkpoint step=%d -> %s", int(step), self._dir)
        return saved

    def should_save(self, step: int) -> bool:
        """True iff ``save(step)`` would actually write. Callers use this
        to skip the device->host transfer of the full train state on
        non-save steps (the manager's interval gating happens after the
        caller has already materialized the state otherwise)."""
        return bool(self._mgr.should_save(int(step)))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> Tuple[Optional[int], Any]:
        """Restore the newest checkpoint into the shape/sharding of
        ``template`` (an abstract or concrete train state). Returns
        (step, state) or (None, template) when no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None, template
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          template)
        try:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract)
            )
        except Exception as e:
            # The most common cause is a changed optimizer-state layout:
            # enabling/disabling train.ema_decay or train.grad_accum adds/
            # removes optax wrapper states, so the checkpointed tree no
            # longer matches the template and Orbax raises an opaque
            # structure mismatch. Name the likely cause instead.
            raise RuntimeError(
                f"failed to restore checkpoint step {step} from {self._dir} "
                f"into the current train-state layout. If optimizer flags "
                f"changed since this logdir was created (train.ema_decay / "
                f"train.grad_accum add or remove optimizer-state wrappers), "
                f"resume with the original flags or start a fresh logdir. "
                f"Original error: {type(e).__name__}: {e}"
            ) from e
        log.info("restored checkpoint step=%d from %s", step, self._dir)
        # Return HOST leaves: Orbax hands back process-local jax.Arrays
        # (the saved state was host numpy, so there is no sharding
        # metadata), and under a multi-process runtime a later
        # jax.device_put of such an array into a global (replicated/
        # sharded) NamedSharding demands a cross-host device transfer the
        # backend refuses. From host numpy, placement takes the same
        # every-process-provides-the-value path a fresh init does.
        import numpy as np

        state = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), state)
        return step, state

    def restore_latest_raw(self) -> Tuple[Optional[int], Any]:
        """Template-free restore: returns (step, nested dict with the
        TrainState fields as keys). Used by detect/eval, which need only
        params + bn_state and must not depend on the optimizer config."""
        step = self._mgr.latest_step()
        if step is None:
            return None, None
        return step, self._mgr.restore(step)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
