"""Analytic FLOP counter for the spec-list models.

Walks the same layer specs ``apply_network`` executes (ConvSpec /
MaxPoolSpec / RouteSpec / ReorgSpec / FlattenSpec / DenseSpec) with a
shape simulator and counts multiply-add FLOPs (2 x MACs, the Darknet
"BFLOPs" convention — Darknet-19 @416 reports ~29.4 GFLOP/img, which
this reproduces). Used by bench.py to report MFU next to img/s, so the
recorded numbers track hardware efficiency rather than tunnel noise.

The reference never reported FLOPs or MFU (SURVEY.md §6: no published
benchmarks); this is rebuild-side observability.
"""

from __future__ import annotations

from yolojax.nn.layers import (
    ConvSpec,
    DenseSpec,
    DropoutSpec,
    FlattenSpec,
    MaxPoolSpec,
    ReorgSpec,
    RouteSpec,
)

# v5e peak compute per chip (public spec): 197 TFLOP/s bf16, 394 TOP/s int8
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def model_flops_per_image(model, input_dim: int) -> float:
    """Forward-pass FLOPs (2 x MACs) for one image at ``input_dim``.

    Elementwise work (BN folds into the conv at inference; leaky ReLU,
    pooling, reorg) is excluded — it is bandwidth, not MXU math, and
    Darknet's BFLOPs convention excludes it too.
    """
    h = w = int(input_dim)
    c = 3
    outputs = []  # (h, w, c) per spec index, for routes
    flops = 0.0
    flat = None
    for spec in model.specs:
        if isinstance(spec, ConvSpec):
            h = -(-h // spec.stride)
            w = -(-w // spec.stride)
            flops += 2.0 * h * w * c * spec.out * spec.ksize * spec.ksize
            c = spec.out
        elif isinstance(spec, MaxPoolSpec):
            if spec.stride > 1:
                h //= spec.stride
                w //= spec.stride
        elif isinstance(spec, ReorgSpec):
            s = spec.stride
            h //= s
            w //= s
            c *= s * s
        elif isinstance(spec, RouteSpec):
            srcs = [outputs[i if i >= 0 else len(outputs) + i]
                    for i in spec.layers]
            h, w = srcs[0][0], srcs[0][1]
            c = sum(s[2] for s in srcs)
        elif isinstance(spec, FlattenSpec):
            flat = h * w * c
        elif isinstance(spec, DenseSpec):
            flops += 2.0 * (flat if flat is not None else c) * spec.out
            flat = spec.out
        elif isinstance(spec, DropoutSpec):
            pass
        outputs.append((h, w, c))
    return flops


def train_flops_per_image(model, input_dim: int) -> float:
    """Training-step FLOPs: forward + backward ~= 3x forward (activation
    grads + weight grads each cost about one forward)."""
    return 3.0 * model_flops_per_image(model, input_dim)


def mfu(images_per_sec: float, flops_per_image: float,
        peak: float = PEAK_BF16) -> float:
    """Model FLOPs utilization: achieved FLOP rate / peak."""
    return images_per_sec * flops_per_image / peak
