"""Pallas TPU kernel: fused packed-conv0 + bias + leaky + 2x2/2 max-pool.

Why a kernel: the XLA version of the packed stem (yolojax/nn/stem.py)
cannot fuse the phase-max into the convolution — the (N, P, P, 128)
phase tensor (1.4 GB at b128/416) makes an HBM round trip, so XLA's best
is ~5.7 ms for a stage whose fused IO floor is 0.5 GB (~0.6 ms). Here the
phase tensor lives only in VMEM/registers.

Shapes and layout (P = input_dim // 2):
  xpT  (N, P+2, 16, P+2) bf16 — space-to-depth packed input, channels
       (12, padded to 16 for sublane alignment) on the sublane dim,
       width on lanes, spatially zero-padded by 1 (darknet pad on the
       packed grid).
  Wt   (144, 128) bf16 — im2col kernel: K = 9 taps x 16 packed channels,
       N = 4 pool phases x 32 output channels (see stem.pack_stem_kernel
       for the phase index map; tap t = u*3+v at rows [16t, 16t+16)).
  bp   (1, 128) f32 — bias tiled over the 4 phases.
  out  (N, P, 32, P) bf16 — "NHCW": channels on sublanes, width on lanes,
       so each output row is one aligned (32, P) VMEM write. Consumers
       pass dimension_numbers=("NHCW", "HWIO", "NHWC") to lax conv.

Grid: one image per program; the kernel loops over P/8 row-chunks. Per
chunk it builds the im2col slab X (144, 8*256) with 72 aligned sublane
copies (lane starts v in {0,1,2} — small rotates), runs ONE MXU matmul
(144-K = 2 passes), and reduces the 4 phase groups with jnp.maximum —
the pool never touches HBM. Widths are padded per-row to 256 lanes so
every row copy lands 128-aligned; pad lanes are zeroed once and the
extra matmul columns are discarded on the row writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_CHUNK = 8
LANES = 256  # per-row lane allocation (max supported width 256*2 = 512)


def _stem_kernel(p: int, co: int, xpT_ref, wt_ref, bp_ref, out_ref, xts_ref):
    """One image: fused conv0' + leaky + phase-max, chunked by output rows.

    xpT_ref: (1, P+2, 16, P+2) bf16   wt_ref: (144, 128) bf16
    bp_ref:  (1, 128) f32             out_ref: (1, P, 32, P) bf16
    xts_ref: (144, ROWS_PER_CHUNK * LANES) bf16 scratch (im2col slab)
    """
    rows = ROWS_PER_CHUNK
    xts_ref[:, :] = jnp.zeros_like(xts_ref)  # zero the width-pad lanes once

    def chunk_body(c, _):
        r0 = c * rows
        # im2col: X[t*16:(t+1)*16, r*LANES : r*LANES+P] = xpT[r0+r+u, :, v:v+P]
        for t in range(9):
            u, v = divmod(t, 3)
            for r in range(rows):
                xts_ref[t * 16 : (t + 1) * 16, r * LANES : r * LANES + p] = (
                    xpT_ref[0, r0 + r + u, :, v : v + p]
                )
        x = xts_ref[:, :]  # (144, rows*LANES)
        acc = jax.lax.dot_general(
            wt_ref[:, :], x,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4*co, rows*LANES)
        z = acc + bp_ref[0, :][:, None]
        z = jnp.where(z >= 0, z, 0.1 * z)  # leaky before max (monotone)
        m = jnp.maximum(
            jnp.maximum(z[0:co], z[co : 2 * co]),
            jnp.maximum(z[2 * co : 3 * co], z[3 * co : 4 * co]),
        ).astype(out_ref.dtype)  # (co, rows*LANES) phase-max == 2x2 pool
        for r in range(rows):
            out_ref[0, r0 + r, :, :] = m[:, r * LANES : r * LANES + p]
        return 0

    jax.lax.fori_loop(0, p // rows, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_forward_pallas(
    x: jax.Array,  # (N, H, W, 3) float
    wp: jax.Array,  # (3, 3, 12, 4*Co) packed kernel (stem.pack_stem_kernel)
    b: jax.Array,  # (Co,) folded bias
    *,
    interpret: bool = False,
) -> jax.Array:
    """(N, H, W, 3) -> (N, H/2, Co, W/2) fused conv0+leaky+pool ("NHCW")."""
    n, h, w, ci = x.shape
    co = b.shape[0]
    assert ci == 3 and h % 16 == 0 and w == h and h // 2 <= LANES
    p = h // 2
    xb = x.astype(jnp.bfloat16)
    # pack: (N,H,W,3) -> channels-on-sublanes (N, P+2, 16, P+2);
    # pc = (si*2+sj)*3+c at sublanes 0..11, zeros at 12..15 (alignment pad);
    # spatial zero-pad of 1 = darknet conv pad on the packed grid
    xp = xb.reshape(n, p, 2, p, 2, 3).transpose(0, 1, 2, 4, 5, 3)
    xp = xp.reshape(n, p, 12, p)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (0, 4), (1, 1)))  # (N, P+2, 16, P+2)

    # Wt (144, 4*Co): rows t*16+pc
    wt = jnp.pad(
        jnp.asarray(wp, jnp.float32).reshape(9, 12, 4 * co),
        ((0, 0), (0, 4), (0, 0)),
    ).reshape(144, 4 * co).astype(jnp.bfloat16)
    bp = jnp.tile(jnp.asarray(b, jnp.float32), 4).reshape(1, 4 * co)

    out = pl.pallas_call(
        functools.partial(_stem_kernel, p, co),
        out_shape=jax.ShapeDtypeStruct((n, p, co, p), jnp.bfloat16),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, p + 2, 16, p + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((144, 4 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, co, p), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((144, ROWS_PER_CHUNK * LANES), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * p * p * 2 * 144 * 4 * co,
            bytes_accessed=n * p * p * (16 + co) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wt, bp)
    return out
