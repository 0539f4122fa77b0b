"""Flat .npz store for inference param pytrees.

Converted checkpoints (Darknet / TF1) land here; detect and eval load from
either this or an Orbax training checkpoint. Keys are '/'-joined pytree
paths, with params under 'params/' and BN state under 'state/'.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _flatten(prefix: str, tree: Dict[str, Any], out: Dict[str, np.ndarray]):
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            _flatten(key, v, out)
        else:
            out[key] = np.asarray(v)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str, params: Any, bn_state: Any) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten("params", params, flat)
    _flatten("state", bn_state, flat)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Tuple[Any, Any]:
    z = np.load(path, allow_pickle=False)
    tree = _unflatten({k: z[k] for k in z.files})
    return tree.get("params", {}), tree.get("state", {})
