"""Device mesh + sharding rules (the rebuild's entire "distributed backend").

The reference was strictly 1 process x 1 device (SURVEY.md §2 parallelism
inventory). TPU-native scaling is expressed declaratively: build a
``jax.sharding.Mesh`` over ("data", "model"), annotate array shardings, and
let XLA GSPMD insert the collectives (psum for grads over ICI, all-gather
where a model-sharded weight feeds a replicated op). No NCCL/MPI equivalent
exists or is needed — this module *is* the communication layer.

Shardings used:
  * batch arrays: P("data") on the leading axis (pure DP)
  * fat conv weights (out_channels >= threshold): P(None, None, None,
    "model") — optional tensor parallelism over output channels for the
    1024-wide detection convs; everything else replicated.

TP/PP/SP/EP beyond this are N/A for a 20-layer convnet with no attention
and no sequence axis — a deliberate scope decision, not an oversight
(SURVEY.md §2).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """1-D or 2-D mesh over the given devices (default: all local devices).

    data * model must equal len(devices); data defaults to the remainder.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs data*model = {data * model} "
            f"devices, have {n}"
        )
    # a smaller-than-world mesh uses the first data*model devices
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def _tp_dim(leaf, tp_size: int, tp_threshold: int) -> Optional[int]:
    """Index of the dim ``param_shardings`` puts on the "model" axis for a
    leaf of this shape, or None when the leaf replicates over "model"."""
    if (
        tp_size > 1
        and getattr(leaf, "ndim", 0) == 4
        and leaf.shape[-1] >= tp_threshold
        and leaf.shape[-1] % tp_size == 0
    ):
        return 3
    if (
        tp_size > 1
        and getattr(leaf, "ndim", 0) == 1
        and leaf.shape[0] >= tp_threshold
        and leaf.shape[0] % tp_size == 0
    ):
        # BN scale/bias/mean/var attached to a tp-sharded conv
        return 0
    return None


def param_shardings(
    mesh: Mesh, params: Dict[str, Any], *, tp_threshold: int = 1024
) -> Dict[str, Any]:
    """Per-leaf shardings: conv kernels with >= tp_threshold output channels
    are sharded over the "model" axis (tensor parallelism); all else
    replicated. With model=1 this degrades to pure replication."""
    tp_size = mesh.shape["model"]

    def rule(path, leaf):
        d = _tp_dim(leaf, tp_size, tp_threshold)
        if d is None:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        spec[d] = "model"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def opt_state_shardings(
    mesh: Mesh, opt_state: Any, *, tp_threshold: int = 1024
) -> Any:
    """ZeRO-1-style optimizer-state sharding: per-param buffers (momentum,
    Adam moments, the EMA copy) are sharded over the DATA axis so each
    data-parallel chip stores 1/N of the optimizer state instead of a full
    replica. GSPMD then lowers the update to the classic ZeRO dance —
    reduce-scatter of the gradients into the shard, local update, all-gather
    of the new params — riding ICI (Rajbhandari et al., arXiv:1910.02054;
    the "How to Scale Your Model" optimizer-sharding recipe).

    Rule: shard the largest axis that divides the data-mesh size; scalars
    (step counts) and indivisible leaves replicate. Buffers whose param is
    TP-sharded keep the param's "model"-axis dim and take the data shard on
    another dim (or compose both axes on the same dim when it is the only
    one) — a data-only spec on the model-sharded dim would force GSPMD to
    reshard those buffers against the gradient layout every step. Math is
    unchanged — the update is elementwise over the shard — so training is
    numerically identical to the replicated layout up to reduction order.
    """
    dp = mesh.shape["data"]
    tp_size = mesh.shape["model"]

    def rule(leaf):
        if getattr(leaf, "ndim", 0) < 1:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        tp_d = _tp_dim(leaf, tp_size, tp_threshold)
        if tp_d is not None:
            spec[tp_d] = "model"
        if dp > 1:
            dims = sorted((d for d in range(leaf.ndim) if d != tp_d),
                          key=lambda d: -leaf.shape[d])
            for d in dims:
                if leaf.shape[d] % dp == 0 and leaf.shape[d] >= dp:
                    spec[d] = "data"
                    break
            else:
                if (tp_d is not None
                        and leaf.shape[tp_d] % (tp_size * dp) == 0):
                    # 1-D BN buffers of a TP conv: both axes on the one dim
                    spec[tp_d] = ("model", "data")
        if all(s is None for s in spec):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, opt_state)


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with the leading axis sharded over "data"."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
