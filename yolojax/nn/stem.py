"""Fused first-conv + max-pool "stem" for inference (TPU perf lever).

Why: the round-1 device profile (PERF.md) showed the opening
``conv 3x3x3->32 @ 416^2`` and its 2x2 max-pool are pure HBM-bandwidth ops:
conv0 writes a 416^2x32 bf16 tensor (1.4 GB at b128) that the pool
immediately re-reads — ~5 ms of the 32 ms batch for 0.04 of its 29.4
GFLOPs. The 3-channel input also starves the MXU (K=27 of 128 lanes).

Fix: phase-decompose conv0 over the 2x2 pool window. With the input
space-to-depth packed to (H/2, W/2, 12), the four conv outputs that form
one pool window — phases (di, dj) in {0,1}^2 at output (2a+di, 2b+dj) —
are exactly four channel groups of ONE 3x3x12->128 convolution on the
packed grid:

    out_phase(a, b, (di*2+dj)*32 + co)
      = sum_{u,v,c} w0[u,v,c,co] * x[2a+di+u-1, 2b+dj+v-1, c]

where original row 2a+di+u-1 = 2*(a+ar)+si with (ar, si) = divmod(di+u-1, 2)
maps into packed row a+ar, packed channel (si*2+sj)*3+c. The packed kernel
(3,3,12,128) holds w0 scattered by that index map (25% density — 4x the
FLOPs, but K goes 27->108 of 128 MXU lanes and the pool becomes a cheap
max over 4 channel groups, fused into the conv epilogue instead of a
second full-tensor HBM round trip).

leaky-ReLU is monotone increasing, so max-pool commutes with it applied
per phase: we add bias, apply leaky, then phase-max — bit-equivalent to
conv -> bias -> leaky -> maxpool (darknet order). Valid for the BN-folded
inference graph (fold_bn first); exactness is tested against the unfused
graph in tests/unit/test_stem.py.

Reference parity note: this changes HOW conv0+pool run, not WHAT they
compute — the reference's cuDNN graph (SURVEY.md §2 native-capability
table) is matched numerically, within f32-accumulation reordering.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yolojax.nn.layers import ConvSpec, MaxPoolSpec, leaky_relu, space_to_depth


@dataclasses.dataclass(frozen=True)
class StemSpec:
    """Marker spec: fused packed-conv0 + 2x2/2 max-pool (+bias +leaky).

    Lives at spec index 0; the original MaxPoolSpec slot is replaced by a
    NoOpSpec so later conv_{i} param names keep their indices.

    impl: "auto" (Pallas kernel on TPU when the packed dim fits, XLA
    otherwise), "pallas", or "xla".
    """

    out: int  # original conv0 output channels (e.g. 32)
    impl: str = "auto"


@dataclasses.dataclass(frozen=True)
class NoOpSpec:
    """Placeholder keeping spec indices stable after fusion."""


def pack_stem_kernel(w0: np.ndarray) -> np.ndarray:
    """(3,3,3,Co) conv kernel -> (3,3,4*Ci,4*Co) packed phase kernel."""
    k, k2, ci, co = w0.shape
    assert k == 3 and k2 == 3, "stem fusion requires a 3x3 first conv"
    w0 = np.asarray(w0, np.float32)
    wp = np.zeros((3, 3, 4 * ci, 4 * co), np.float32)
    for di in range(2):
        for dj in range(2):
            for u in range(3):
                ar, si = divmod(di + u - 1, 2)
                for v in range(3):
                    ac, sj = divmod(dj + v - 1, 2)
                    pc = (si * 2 + sj) * ci
                    po = (di * 2 + dj) * co
                    wp[ar + 1, ac + 1, pc : pc + ci, po : po + co] = w0[u, v]
    return wp


def stem_forward(
    x: jax.Array,
    wp: jax.Array,  # (3, 3, 4*Ci, 4*Co) packed kernel
    b: jax.Array,  # (Co,) folded bias
    *,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """images (N, H, W, Ci) -> fused conv0+leaky+pool output (N,H/2,W/2,Co)."""
    n, h, w, ci = x.shape
    co = b.shape[0]
    xp = space_to_depth(x.astype(compute_dtype), 2)  # (N, H/2, W/2, 4*Ci)
    y = lax.conv_general_dilated(
        xp,
        wp.astype(compute_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),  # darknet pad on the packed grid
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    yf = y.astype(jnp.float32) + jnp.tile(b.astype(jnp.float32), 4)
    yf = leaky_relu(yf)
    # phase-max == the original 2x2/2 max-pool (phases are the pool window)
    yf = yf.reshape(n, h // 2, w // 2, 4, co).max(axis=3)
    return yf.astype(compute_dtype)


def fuse_stem(model, params: Dict[str, Any], state: Dict[str, Any],
              impl: str = "off"):
    """Graph surgery (inference only): fold conv0+pool1 into a StemSpec.

    Requires a BN-folded model (run ``yolojax.convert.fold.fold_bn`` first).
    Returns (model', params', state) or the inputs unchanged when the
    opening pattern doesn't match (conv 3x3 s1 leaky, then pool 2x2 s2).

    ``impl``: "off" (DEFAULT — measured on v5e, see PERF.md: every fused
    variant lands within noise of the unfused graph, because XLA's conv
    emitter is already at the stage's achievable floor once the Pallas
    output relayout + input packing passes are paid), "auto", "pallas",
    or "xla". Kept as an opt-in for other TPU generations / future XLA
    layout control.
    """
    if impl == "off":
        return model, params, state
    specs = model.specs
    if len(specs) < 2:
        return model, params, state
    c0, p1 = specs[0], specs[1]
    if not (
        isinstance(c0, ConvSpec)
        and c0.ksize == 3
        and c0.stride == 1
        and not c0.bn
        and c0.act == "leaky"
        and isinstance(p1, MaxPoolSpec)
        and p1.size == 2
        and p1.stride == 2
        # the spec after the stem must be a conv: it consumes the Pallas
        # kernel's NHCW output via conv dimension numbers
        and len(specs) > 2
        and isinstance(specs[2], ConvSpec)
    ):
        return model, params, state
    w0 = np.asarray(params["conv_0"]["w"])
    new_params = dict(params)
    new_params["conv_0"] = {
        "wp": jnp.asarray(pack_stem_kernel(w0)),
        "b": jnp.asarray(params["conv_0"]["b"]),
    }
    new_specs = (StemSpec(out=c0.out, impl=impl), NoOpSpec()) + tuple(specs[2:])
    new_model = dataclasses.replace(model, specs=new_specs)
    return new_model, new_params, state
