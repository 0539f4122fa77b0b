"""AOT serving artifacts: the frozen-graph analogue, tpu-native.

The reference deployed by rebuilding the TF graph from Python and
restoring a checkpoint on every invocation (SURVEY.md §3.3). The
tpu-native answer is ahead-of-time export: ``jax.export`` serializes the
jitted end-to-end serving computation (bf16/int8 forward + head decode +
top-K + batched NMS) to portable StableHLO with the weights baked in as
constants. A deployment host then loads and runs the artifact WITHOUT the
model-building Python — no spec lists, no weight files, no re-trace —
and executes exactly the graph ``cli/detect.py`` serves, lowered for the
platform it was exported on (TPU artifacts run on TPU, CPU on CPU;
``platforms`` is recorded in the header and checked at load).

File format: ``MAGIC`` + u32-le metadata length + metadata JSON (class
names, input dim, fixed batch, detect thresholds, export platforms) +
the ``jax.export`` payload. One file serves; nothing else ships.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict, Sequence

MAGIC = b"YJAXSERVE1\n"


@dataclasses.dataclass(frozen=True)
class ServingArtifact:
    """A loaded artifact: ``meta`` + a callable running the baked graph.

    ``__call__`` takes a float32 canvas batch of exactly
    ``(meta['batch'], meta['dim'], meta['dim'], 3)`` and returns the
    serving dict ``{boxes, scores, classes, keep}`` (device arrays).
    """

    meta: Dict[str, Any]
    _call: Callable[[Any], Dict[str, Any]]

    def __call__(self, images):
        return self._call(images)


def save_artifact(
    path: str,
    infer_fn: Callable,
    params: Any,
    bn_state: Any,
    *,
    batch: int,
    dim: int,
    meta: Dict[str, Any],
) -> Dict[str, Any]:
    """Export ``infer_fn(params, bn_state, images)`` with the weights baked
    in, for a fixed ``(batch, dim, dim, 3)`` f32 input, and write the
    artifact file. Returns the final metadata (incl. payload size and the
    platforms the artifact can execute on)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    exported = jexport.export(
        jax.jit(lambda images: infer_fn(params, bn_state, images))
    )(jax.ShapeDtypeStruct((batch, dim, dim, 3), jnp.float32))
    payload = exported.serialize()
    meta = dict(
        meta,
        batch=int(batch),
        dim=int(dim),
        platforms=list(exported.platforms),
        payload_bytes=len(payload),
    )
    blob = json.dumps(meta).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(blob).to_bytes(4, "little"))
        f.write(blob)
        f.write(payload)
    return meta


def load_artifact(path: str) -> ServingArtifact:
    """Load an artifact and bind it to the current backend.

    Raises ``ValueError`` on a bad magic/truncated file and when the
    current JAX backend is not among the artifact's export platforms
    (an artifact exported on TPU cannot run on CPU and vice versa)."""
    import os

    import jax
    from jax import export as jexport

    if os.path.isdir(path):
        raise ValueError(
            f"{path}: is a directory, not a serving artifact — a "
            f"SavedModel export (--format savedmodel) serves under TF "
            f"Serving, not --artifact; use --format artifact output here")
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head != MAGIC:
            hint = (" — .tflite flatbuffers serve under the TFLite "
                    "interpreter (yolojax.serve.tflite.load_tflite), "
                    "not --artifact" if path.endswith(".tflite") else "")
            raise ValueError(
                f"{path}: not a yolojax serving artifact (bad magic){hint}")
        (n,) = (int.from_bytes(f.read(4), "little"),)
        try:
            meta = json.loads(f.read(n).decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"{path}: corrupt artifact metadata: {e}")
        payload = f.read()
    backend = jax.default_backend()
    platforms = [p.lower() for p in meta.get("platforms", [])]
    if backend.lower() not in platforms:
        raise ValueError(
            f"{path}: artifact was exported for {platforms}, but the "
            f"current backend is {backend!r}; re-export on this platform")
    exported = jexport.deserialize(payload)
    return ServingArtifact(meta=meta, _call=exported.call)
