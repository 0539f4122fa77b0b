"""Inference-time BN folding: conv+BN -> conv+bias.

For eval/detect/serving the BN affine is constant, so it folds into the
conv weights: w' = w * (scale * rsqrt(var + eps)) per output channel,
b' = bias - mean * scale * rsqrt(var + eps). Removes the BN epilogue ops
and the running-stat arrays from the inference graph entirely (XLA fuses
the epilogue anyway, but folding also halves the epilogue constants and
makes exported weights self-contained).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

from yolojax.models import Model
from yolojax.nn.layers import ConvSpec


def fold_bn(
    model: Model,
    params: Dict[str, Any],
    bn_state: Dict[str, Any],
    *,
    eps: float = 1e-5,
) -> Tuple[Model, Dict[str, Any], Dict[str, Any]]:
    """Return (model', params', {}) with every BN-conv folded to bias-conv.

    ``eps`` must match the value used by ``apply_network`` (bn_eps).
    """
    new_specs = []
    new_params: Dict[str, Any] = {}
    for i, spec in enumerate(model.specs):
        name = f"conv_{i}"
        if isinstance(spec, ConvSpec) and spec.bn:
            layer = params[name]
            st = bn_state[name]
            scale = np.asarray(layer["scale"], np.float64)
            bias = np.asarray(layer["bias"], np.float64)
            mean = np.asarray(st["mean"], np.float64)
            var = np.asarray(st["var"], np.float64)
            inv = scale / np.sqrt(var + eps)
            w = np.asarray(layer["w"], np.float64) * inv[None, None, None, :]
            b = bias - mean * inv
            new_specs.append(dataclasses.replace(spec, bn=False))
            new_params[name] = {
                "w": w.astype(np.float32),
                "b": b.astype(np.float32),
            }
        else:
            new_specs.append(spec)
            if name in params:
                new_params[name] = params[name]
            dname = f"dense_{i}"
            if dname in params:
                new_params[dname] = params[dname]
    new_model = dataclasses.replace(model, specs=tuple(new_specs))
    return new_model, new_params, {}
