"""Model registry: config strings -> spec lists, like the reference's
``getattr``-by-dotted-path resolution of ``model.yolo2.inference.darknet``
(SURVEY.md §2 config helpers).

``get_model("yolo2", "darknet", num_classes=20)`` returns a :class:`Model`
bundling the spec list with init/apply and head metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolojax.models import yolo as _yolo
from yolojax.models import yolo2 as _yolo2
from yolojax.nn.layers import apply_network, init_network

_REGISTRY = {
    ("yolo", "yolo"): (_yolo.yolo, "v1", _yolo.DOWNSAMPLE),
    ("yolo", "tiny"): (_yolo.tiny, "v1", _yolo.DOWNSAMPLE),
    ("yolo2", "darknet"): (_yolo2.darknet, "v2", _yolo2.DOWNSAMPLE),
    ("yolo2", "tiny"): (_yolo2.tiny, "v2", _yolo2.DOWNSAMPLE),
}


@dataclasses.dataclass(frozen=True)
class Model:
    """A detection model: backbone spec list + head metadata.

    v2 heads reshape to (N, H, W, A, 5+C); v1 heads stay flat
    (N, S*S*(C+5B)) — split with :func:`yolojax.ops.boxes.split_v1_head`.
    """

    name: str          # "yolo" | "yolo2"
    inference: str     # "darknet" | "tiny" | "yolo"
    kind: str          # "v1" | "v2"
    specs: Tuple[Any, ...]
    num_classes: int
    downsample: int
    anchors: Optional[Tuple[Tuple[float, float], ...]] = None  # v2
    boxes_per_cell: int = 2                                    # v1
    grid: int = 7                                              # v1 (S)

    @property
    def num_anchors(self) -> int:
        return len(self.anchors) if self.anchors else 0

    def init(
        self, key: jax.Array, input_dim: int, *, param_dtype=jnp.float32
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        return init_network(
            key, self.specs, 3, (input_dim, input_dim), param_dtype=param_dtype
        )

    def apply(
        self,
        params: Dict[str, Any],
        state: Dict[str, Any],
        images: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        compute_dtype=jnp.bfloat16,
        pad_input_channels: int = 0,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """images: (N, H, W, 3) in [0, 1]. Returns (head, new_state)."""
        out, new_state = apply_network(
            self.specs,
            params,
            state,
            images,
            train=train,
            rng=rng,
            compute_dtype=compute_dtype,
            pad_input_channels=pad_input_channels,
        )
        if self.kind == "v2":
            n, h, w, _ = out.shape
            out = out.reshape(n, h, w, self.num_anchors, 5 + self.num_classes)
        return out, new_state


def get_model(
    name: str,
    inference: str,
    num_classes: int,
    *,
    anchors: Optional[Sequence[Tuple[float, float]]] = None,
    boxes_per_cell: int = 2,
    grid: int = 7,
) -> Model:
    key = (name, inference.lower())
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown model {name}.{inference}; have "
            + ", ".join(".".join(k) for k in _REGISTRY)
        )
    builder, kind, downsample = _REGISTRY[key]
    if kind == "v2":
        if anchors is None:
            anchors = (
                _yolo2.TINY_VOC_ANCHORS if inference == "tiny" else _yolo2.VOC_ANCHORS
            )
        specs = builder(num_classes, len(anchors))
        return Model(
            name, inference, kind, tuple(specs), num_classes, downsample,
            anchors=tuple(tuple(a) for a in anchors),
        )
    specs = builder(num_classes, boxes_per_cell, grid)
    return Model(
        name, inference, kind, tuple(specs), num_classes, downsample,
        boxes_per_cell=boxes_per_cell, grid=grid,
    )
