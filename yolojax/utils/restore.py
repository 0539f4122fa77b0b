"""Unified weight loading for inference CLIs.

Accepts, by extension/shape:
  * ``*.npz``      — converted param store (yolojax/convert/store.py)
  * ``*.weights``  — raw Darknet binary (converted on the fly)
  * directory      — Orbax checkpoint dir (``<logdir>/ckpt``), restores the
                     latest step's params + bn_state
  * TF1 checkpoint prefix (``*.ckpt*`` / has a matching ``.index`` file)
"""

from __future__ import annotations

import logging
import os
from typing import Any, Tuple

from yolojax.models import Model

log = logging.getLogger(__name__)


def load_weights(
    path: str, model: Model, input_dim: int, *, use_ema: bool = False
) -> Tuple[Any, Any]:
    """Return (params, bn_state) for ``model`` from any supported source.

    ``use_ema``: for Orbax checkpoint dirs, substitute the Polyak-averaged
    weights maintained by ``[train] ema_decay`` (stored inside opt_state;
    tf.train.ExponentialMovingAverage analogue). Errors if the run trained
    without EMA; meaningless (and rejected) for weight-file sources, which
    carry no optimizer state."""
    if use_ema and not (os.path.isdir(path)):
        raise ValueError(
            f"use_ema needs an Orbax checkpoint dir (got {path!r}): only "
            "training checkpoints carry the averaged weights")
    if path.endswith(".npz"):
        from yolojax.convert.store import load_params_npz

        log.info("loading npz params: %s", path)
        return load_params_npz(path)
    if path.endswith(".weights"):
        from yolojax.convert.darknet import load_darknet_weights

        log.info("loading darknet weights: %s", path)
        return load_darknet_weights(model, path, input_dim=input_dim)
    if os.path.isdir(path):
        from yolojax.train.checkpoint import Checkpointer

        # accept either the ckpt dir itself or a logdir containing ckpt/
        ckpt_dir = path
        if os.path.isdir(os.path.join(path, "ckpt")):
            ckpt_dir = os.path.join(path, "ckpt")
        ckpt = Checkpointer(ckpt_dir)
        step, raw = ckpt.restore_latest_raw()
        ckpt.close()
        if raw is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
        log.info("loading orbax checkpoint step %s from %s", step, ckpt_dir)
        if use_ema:
            from yolojax.train.step import extract_ema

            ema = extract_ema(raw.get("opt_state"))
            if ema is None:
                raise ValueError(
                    f"checkpoint {ckpt_dir} (step {step}) has no EMA "
                    "weights: train with [train] ema_decay > 0 first")
            log.info("using EMA (Polyak-averaged) weights")
            return ema, raw["bn_state"]
        return raw["params"], raw["bn_state"]
    if os.path.exists(path + ".index") or ".ckpt" in os.path.basename(path):
        from yolojax.convert.tf1 import load_tf1_checkpoint

        log.info("loading TF1 checkpoint: %s", path)
        return load_tf1_checkpoint(model, path, input_dim=input_dim)
    raise ValueError(f"unrecognized weights source: {path}")
