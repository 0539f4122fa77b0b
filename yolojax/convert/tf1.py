"""TF1 checkpoint -> yolojax param pytree.

The reference trained with ``tf.train.Saver`` (SURVEY.md §5); its exact
variable names are unverifiable (reference mount empty, SURVEY.md §0), so
this reader is generic: it lists the checkpoint's variables via the
installed TF 2.21 ``tf.train.load_checkpoint``, groups them into conv /
dense layers by heuristics over names+shapes (slim-era conventions:
``.../weights``, ``.../BatchNorm/{gamma,beta,moving_mean,moving_variance}``,
``.../biases``), orders groups by their order of appearance, and maps them
onto the model's spec walk. An explicit ``name_map`` overrides the
heuristic per layer when a real checkpoint disagrees.

TF1 conv kernels are already HWIO — no transpose needed. TF1 FC kernels are
(in, out) with NHWC-order flatten; Darknet/yolojax flatten NCHW, so v1 FC
weights from TF1 checkpoints are permuted here to NCHW flatten order.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from yolojax.models import Model
from yolojax.nn.layers import ConvSpec, DenseSpec

log = logging.getLogger(__name__)

_BN_SUFFIX = {
    "gamma": "scale",
    "beta": "bias",
    "moving_mean": "mean",
    "moving_variance": "var",
}


def _group_tf1_variables(reader) -> List[Dict[str, np.ndarray]]:
    """Group checkpoint variables into per-layer dicts, ordered by the
    numeric components of their names (slim layers are Conv, Conv_1, ...)."""
    shape_map = reader.get_variable_to_shape_map()
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for name in shape_map:
        if any(s in name for s in ("Momentum", "Adam", "RMSProp",
                                   "global_step", "ExponentialMovingAverage",
                                   "beta1_power", "beta2_power")):
            continue
        base = name
        kind = None
        for suf, std in _BN_SUFFIX.items():
            if name.endswith("BatchNorm/" + suf):
                base = name[: -len("/BatchNorm/" + suf)]
                kind = std
        if kind is None:
            if name.endswith("/weights") or name.endswith("/kernel"):
                base, kind = name.rsplit("/", 1)[0], "w"
            elif name.endswith("/biases") or name.endswith("/bias"):
                base, kind = name.rsplit("/", 1)[0], "b"
            else:
                log.debug("skipping unrecognized variable %s", name)
                continue
        groups.setdefault(base, {})[kind] = reader.get_tensor(name)

    def order_key(base: str):
        nums = [int(x) for x in re.findall(r"\d+", base)]
        return (nums, base)

    return [groups[b] for b in sorted(groups, key=order_key)]


def load_tf1_checkpoint(
    model: Model,
    ckpt_path: str,
    *,
    input_dim: Optional[int] = None,
    name_map: Optional[List[str]] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a TF1 checkpoint into (params, bn_state) for ``model``."""
    import tensorflow as tf

    if input_dim is None:
        input_dim = 448 if model.kind == "v1" else 416
    reader = tf.train.load_checkpoint(ckpt_path)
    if name_map is not None:
        shape_map = reader.get_variable_to_shape_map()
        groups = []
        for base in name_map:
            g = {}
            for name in shape_map:
                if name.startswith(base + "/"):
                    suffix = name[len(base) + 1 :]
                    for suf, std in _BN_SUFFIX.items():
                        if suffix == "BatchNorm/" + suf:
                            g[std] = reader.get_tensor(name)
                    if suffix in ("weights", "kernel"):
                        g["w"] = reader.get_tensor(name)
                    if suffix in ("biases", "bias"):
                        g["b"] = reader.get_tensor(name)
            groups.append(g)
    else:
        groups = _group_tf1_variables(reader)

    layer_specs = [
        (i, s) for i, s in enumerate(model.specs)
        if isinstance(s, (ConvSpec, DenseSpec))
    ]
    if len(groups) != len(layer_specs):
        raise ValueError(
            f"checkpoint has {len(groups)} parameterized layers, model "
            f"expects {len(layer_specs)}; pass name_map to disambiguate"
        )

    import jax

    tpl_params, tpl_state = jax.eval_shape(
        lambda k: model.init(k, input_dim), jax.random.PRNGKey(0)
    )
    out_params: Dict[str, Any] = {}
    out_state: Dict[str, Any] = {}
    # pre-compute conv output spatial dims for the FC permute (v1)
    for (i, spec), g in zip(layer_specs, groups):
        if isinstance(spec, ConvSpec):
            name = f"conv_{i}"
            w = np.asarray(g["w"], np.float32)  # HWIO already
            want = tpl_params[name]["w"].shape
            if tuple(w.shape) != tuple(want):
                raise ValueError(f"{name}: ckpt {w.shape} != model {want}")
            layer = {"w": w}
            if spec.bn:
                layer["scale"] = np.asarray(g["scale"], np.float32)
                layer["bias"] = np.asarray(g["bias"], np.float32)
                out_state[name] = {
                    "mean": np.asarray(g["mean"], np.float32),
                    "var": np.asarray(g["var"], np.float32),
                }
            else:
                layer["b"] = np.asarray(g["b"], np.float32)
            out_params[name] = layer
        else:
            name = f"dense_{i}"
            w = np.asarray(g["w"], np.float32)  # (in, out), NHWC flatten
            want = tpl_params[name]["w"].shape
            if tuple(w.shape) != tuple(want):
                raise ValueError(f"{name}: ckpt {w.shape} != model {want}")
            # First dense after flatten: permute NHWC-flatten -> NCHW-flatten.
            prev = model.specs[i - 1]
            from yolojax.nn.layers import FlattenSpec

            if isinstance(prev, FlattenSpec):
                h, w_sp, c = _pre_flatten_hwc(model, i, input_dim)
                w = (
                    w.reshape(h, w_sp, c, -1)
                    .transpose(2, 0, 1, 3)
                    .reshape(h * w_sp * c, -1)
                )
            out_params[name] = {"w": w, "b": np.asarray(g["b"], np.float32)}
    return out_params, out_state


def _pre_flatten_hwc(model: Model, dense_idx: int, input_dim: int):
    """Spatial dims (h, w, c) feeding the FlattenSpec before ``dense_idx``."""
    import math

    h = w = input_dim
    c = 3
    for spec in model.specs[: dense_idx - 1]:
        if isinstance(spec, ConvSpec):
            h = (h + 2 * (spec.ksize // 2) - spec.ksize) // spec.stride + 1
            w = (w + 2 * (spec.ksize // 2) - spec.ksize) // spec.stride + 1
            c = spec.out
        elif type(spec).__name__ == "MaxPoolSpec":
            h = math.ceil(h / spec.stride)
            w = math.ceil(w / spec.stride)
    return h, w, c
