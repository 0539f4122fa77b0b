"""Darknet ``.weights`` import/export.

Rebuild of the reference's ``parse_darknet_yolo2.py`` (SURVEY.md §3.4 [H]):
binary layout is a 3-int32 header (major, minor, revision) + ``seen``
(int32, or int64 once major*10+minor >= 2), then raw float32 params walked
in network order. Per conv layer:

    biases[out]
    if BN: scales[out], rolling_mean[out], rolling_var[out]
    weights[out, in, kh, kw]  -> transposed here to HWIO (kh, kw, in, out)

Per connected (dense) layer: biases[out], weights[out, in] (row-major,
Darknet GEMM uses B transposed) -> transposed to (in, out). Dense inputs
are CHW-flattened in Darknet; yolojax's FlattenSpec flattens NCHW-order to
match, so imported FC weights line up without permutation.

The exporter writes the same format — used both for round-trip tests and to
ship yolojax-trained weights back to Darknet-ecosystem tools.
"""

from __future__ import annotations

import logging
import struct
from typing import Any, Dict, Tuple

import numpy as np

from yolojax.models import Model
from yolojax.nn.layers import ConvSpec, DenseSpec

log = logging.getLogger(__name__)


def _walk_layers(model: Model):
    """Yield (index, spec) for every parameterized layer, in network order."""
    for i, spec in enumerate(model.specs):
        if isinstance(spec, (ConvSpec, DenseSpec)):
            yield i, spec


def load_darknet_weights(
    model: Model, path: str, *, input_dim: int = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Parse a Darknet ``.weights`` file into (params, bn_state) pytrees.

    ``input_dim`` is needed only for models with dense layers (v1) to size
    the flatten; defaults to 448 for v1 / 416 for v2.
    """
    import jax

    if input_dim is None:
        input_dim = 448 if model.kind == "v1" else 416
    # template init to know every shape (cheap: done abstractly)
    params, bn_state = jax.eval_shape(
        lambda k: model.init(k, input_dim), jax.random.PRNGKey(0)
    )

    with open(path, "rb") as f:
        major, minor, revision = struct.unpack("<3i", f.read(12))
        if major * 10 + minor >= 2:
            (seen,) = struct.unpack("<q", f.read(8))
        else:
            (seen,) = struct.unpack("<i", f.read(4))
        log.info("darknet header: %d.%d.%d seen=%d", major, minor, revision, seen)
        buf = np.fromfile(f, dtype=np.float32)

    pos = 0

    def take(n):
        nonlocal pos
        if pos + n > buf.size:
            raise ValueError(
                f"weights file exhausted: need {n} floats at {pos}, "
                f"have {buf.size}"
            )
        out = buf[pos : pos + n]
        pos += n
        return out

    out_params: Dict[str, Any] = {}
    out_state: Dict[str, Any] = {}
    for i, spec in _walk_layers(model):
        if isinstance(spec, ConvSpec):
            name = f"conv_{i}"
            w_shape = params[name]["w"].shape  # (kh, kw, in, out)
            kh, kw, cin, cout = w_shape
            layer = {}
            if spec.bn:
                bias = take(cout).copy()
                scale = take(cout).copy()
                mean = take(cout).copy()
                var = take(cout).copy()
                layer["scale"] = scale
                layer["bias"] = bias
                out_state[name] = {"mean": mean, "var": var}
            else:
                layer["b"] = take(cout).copy()
            w = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
            layer["w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
            out_params[name] = layer
        else:  # DenseSpec
            name = f"dense_{i}"
            w_shape = params[name]["w"].shape  # (in, out)
            cin, cout = w_shape
            b = take(cout).copy()
            w = take(cout * cin).reshape(cout, cin)
            out_params[name] = {
                "w": np.ascontiguousarray(w.T),
                "b": b,
            }
    if pos != buf.size:
        log.warning(
            "darknet file has %d unread floats (model mismatch?)",
            buf.size - pos,
        )
    return out_params, out_state


def save_darknet_weights(
    model: Model,
    params: Dict[str, Any],
    bn_state: Dict[str, Any],
    path: str,
    *,
    seen: int = 0,
    version: Tuple[int, int, int] = (0, 2, 0),
) -> None:
    """Serialize (params, bn_state) back to Darknet ``.weights`` format."""
    major, minor, revision = version
    chunks = [struct.pack("<3i", major, minor, revision)]
    if major * 10 + minor >= 2:
        chunks.append(struct.pack("<q", seen))
    else:
        chunks.append(struct.pack("<i", seen))

    def f32(x):
        return np.asarray(x, np.float32).tobytes()

    for i, spec in _walk_layers(model):
        if isinstance(spec, ConvSpec):
            layer = params[f"conv_{i}"]
            if spec.bn:
                st = bn_state[f"conv_{i}"]
                chunks += [f32(layer["bias"]), f32(layer["scale"]),
                           f32(st["mean"]), f32(st["var"])]
            else:
                chunks.append(f32(layer["b"]))
            w = np.asarray(layer["w"], np.float32)  # (kh, kw, in, out)
            chunks.append(f32(w.transpose(3, 2, 0, 1)))
        else:
            layer = params[f"dense_{i}"]
            chunks.append(f32(layer["b"]))
            chunks.append(f32(np.asarray(layer["w"], np.float32).T))
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
