"""TFLite export — the edge/mobile serving surface.

The reference's deployment story stopped at desktop TF (SURVEY.md §3.3:
rebuild graph + restore checkpoint per invocation); shipping a YOLO head
to phones/embedded hosts meant leaving the framework. This module exports
the exact yolojax serving computation (forward + decode + top-K +
per-class NMS, weights baked in) as one ``.tflite`` flatbuffer via the
``jax2tf`` bridge, so the same detections serve under the TFLite
interpreter with no JAX, no yolojax, and no Python model code.

Like the SavedModel exporter (``savedmodel.py``), the input must be the
*portable* serving build (f32 compute, lax NMS, exact top-k — Mosaic
custom-calls cannot execute on edge hosts). Two conversion modes:

- ``graph`` (default): ``jax2tf.convert(native_serialization=False)``
  emits plain TF ops which the TFLite converter lowers to builtins,
  falling back to Flex (``SELECT_TF_OPS``) for the long tail. Runs on
  any interpreter linked with the Flex delegate (the full TF pip is).
- ``stablehlo``: native jax2tf serialization + the experimental
  StableHLO opset — smaller op surface, for interpreters built with
  StableHLO support. Kept behind a knob because runtime support is
  still uneven across TFLite distributions.

Output mapping is deterministic without relying on TFLite tensor names
(the converter mangles them): the four serving outputs are uniquely
identified by (dtype, rank) — boxes f32 rank-3, scores f32 rank-2,
classes int32, keep bool.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

META_SUFFIX = ".json"


def _signature_outputs(out_details, batch, top_k):
    """Map TFLite output tensors to the serving dict keys by (dtype, rank).

    Returns {key: tensor_index}. Raises if the model does not expose
    exactly the serving quartet (a conversion that dropped or fused an
    output must fail loudly, not mis-assign)."""
    import numpy as np

    mapping = {}
    for d in out_details:
        dt, rank = np.dtype(d["dtype"]), len(d["shape"])
        if dt == np.float32 and rank == 3:
            key = "boxes"
        elif dt == np.float32 and rank == 2:
            key = "scores"
        elif dt in (np.int32, np.int64):
            key = "classes"
        elif dt == np.bool_:
            key = "keep"
        else:
            raise ValueError(
                f"unexpected TFLite output {d['name']} dtype={dt} "
                f"shape={d['shape']}")
        if key in mapping:
            raise ValueError(f"duplicate TFLite output for {key!r}")
        mapping[key] = d["index"]
    missing = {"boxes", "scores", "classes", "keep"} - set(mapping)
    if missing:
        raise ValueError(f"TFLite model is missing outputs: {sorted(missing)}")
    return mapping


def save_tflite(
    path: str,
    infer_fn: Callable,
    params: Any,
    bn_state: Any,
    *,
    batch: int,
    dim: int,
    meta: Dict[str, Any],
    mode: str = "graph",
) -> Dict[str, Any]:
    """Export ``infer_fn(params, bn_state, images)`` as ``path`` (.tflite)
    plus a ``path + ".json"`` metadata sidecar (same header as the native
    ``.yjsa`` artifact). ``infer_fn`` must be a portable build."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    if mode not in ("graph", "stablehlo"):
        raise ValueError(f"unknown tflite conversion mode {mode!r}")

    if mode == "graph":
        tf_fn = jax2tf.convert(
            lambda images: infer_fn(params, bn_state, images),
            native_serialization=False,
        )
        ops = [tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    else:
        tf_fn = jax2tf.convert(
            lambda images: infer_fn(params, bn_state, images),
            native_serialization_platforms=("cpu",),
        )
        ops = [tf.lite.OpsSet.EXPERIMENTAL_STABLEHLO_OPS,
               tf.lite.OpsSet.TFLITE_BUILTINS,
               tf.lite.OpsSet.SELECT_TF_OPS]

    cf = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[
            tf.TensorSpec([batch, dim, dim, 3], tf.float32, name="images")
        ],
    ).get_concrete_function()
    converter = tf.lite.TFLiteConverter.from_concrete_functions([cf])
    converter.target_spec.supported_ops = ops
    blob = converter.convert()
    with open(path, "wb") as f:
        f.write(blob)

    meta = dict(meta, batch=int(batch), dim=int(dim), format="tflite",
                conversion=mode, payload_bytes=len(blob))
    with open(path + META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_tflite(path: str):
    """Load an exported .tflite; returns (meta, serve_fn) where
    ``serve_fn(images_f32)`` runs the flatbuffer under the TFLite
    interpreter and returns the serving dict as numpy arrays. Exists for
    tests and CLI roundtrips — an edge host embeds the interpreter
    directly."""
    import numpy as np
    import tensorflow as tf

    with open(path + META_SUFFIX) as f:
        meta = json.load(f)
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    outs = _signature_outputs(interp.get_output_details(),
                              meta["batch"], meta.get("top_k"))

    def serve_fn(images):
        interp.set_tensor(inp["index"], np.asarray(images, np.float32))
        interp.invoke()
        return {k: interp.get_tensor(i) for k, i in outs.items()}

    return meta, serve_fn
