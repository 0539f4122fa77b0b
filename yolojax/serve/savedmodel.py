"""TF SavedModel export — the bridge back to the reference's own runtime.

The reference's deployment story WAS TensorFlow: ``tf.train.Saver``
checkpoints restored into a re-built TF1 graph (SURVEY.md §3.2/§3.3). A
team switching from the reference to this framework may still run TF
Serving / ``tf.saved_model`` infrastructure; this module exports the
exact yolojax serving computation (forward + decode + top-K + per-class
NMS, weights baked in) as a TF SavedModel via ``jax2tf`` native
serialization, so such hosts serve it with zero JAX or yolojax code.

The exported graph is the *portable* serving build (f32 compute, lax NMS
— ``cli/detect.py build_serving(portable=True)``): TF Serving fleets are
CPU hosts, and Mosaic custom-calls would not execute there. The
``serving_default`` signature takes an f32 ``images`` canvas batch of
the fixed export shape and returns ``{boxes, scores, classes, keep}``
exactly like the live jitted path; ``class_names()`` returns the label
list; ``yolojax_meta.json`` in the SavedModel dir carries the same
header the native ``.yjsa`` artifact has.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

META_FILENAME = "yolojax_meta.json"


def save_savedmodel(
    path: str,
    infer_fn: Callable,
    params: Any,
    bn_state: Any,
    *,
    batch: int,
    dim: int,
    meta: Dict[str, Any],
) -> Dict[str, Any]:
    """Export ``infer_fn(params, bn_state, images)`` as a TF SavedModel.

    ``infer_fn`` must be a portable build (no TPU-only custom calls) —
    the embedded StableHLO is lowered for CPU. Returns the final
    metadata dict (also written to ``<path>/yolojax_meta.json``).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    # native (StableHLO) serialization is the jax2tf default; pin the
    # lowering platform so the graph serves on CPU TF hosts regardless of
    # the backend this export runs on
    tf_fn = jax2tf.convert(
        lambda images: infer_fn(params, bn_state, images),
        native_serialization_platforms=("cpu",),
    )

    module = tf.Module()
    names_t = tf.constant([str(n) for n in meta.get("names", [])],
                          dtype=tf.string)

    @tf.function(
        autograph=False,
        input_signature=[
            tf.TensorSpec([batch, dim, dim, 3], tf.float32, name="images")
        ],
    )
    def serve(images):
        out = tf_fn(images)
        return {k: tf.identity(v, name=k) for k, v in out.items()}

    @tf.function(autograph=False, input_signature=[])
    def class_names():
        return {"names": tf.identity(names_t, name="names")}

    module.serve = serve
    module.class_names = class_names
    tf.saved_model.save(
        module, path,
        signatures={"serving_default": serve, "class_names": class_names},
    )

    meta = dict(meta, batch=int(batch), dim=int(dim), platforms=["cpu"],
                format="savedmodel")
    with open(os.path.join(path, META_FILENAME), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_savedmodel(path: str):
    """Load an exported SavedModel; returns (meta, serve_fn) where
    ``serve_fn(images_f32)`` runs the baked graph under TF and returns the
    serving dict as numpy arrays. Exists for tests and CLI roundtrips —
    a production TF Serving host loads the SavedModel directly."""
    import tensorflow as tf

    meta_path = os.path.join(path, META_FILENAME)
    with open(meta_path) as f:
        meta = json.load(f)
    mod = tf.saved_model.load(path)

    def serve_fn(images):
        out = mod.serve(tf.constant(images, tf.float32))
        return {k: v.numpy() for k, v in out.items()}

    return meta, serve_fn
