#!/usr/bin/env python3
"""Measure maxpool backward alternatives on TPU (train-step perf work).

The train-step profile (bench/profile_train.py) shows the two early
select-and-scatter ops (pool1/pool2 backward at 416^2x32 / 208^2x64) cost
~7.2 ms/step at b64 — the largest non-conv item. Candidates:

  A. lax.reduce_window (current): backward = select-and-scatter.
  B. custom_vjp, equality routing, tie-split: dx = dy_up * ind / cnt_up
     where ind = (x == y_up). Exact total-gradient mass; ties split
     evenly (select-and-scatter routes to the first max instead —
     difference only on exact ties).
  C. custom_vjp, equality routing to ALL ties (no normalization):
     cheapest; over-counts gradient on ties (gray-padding regions tie a
     lot after augmentation, so this is only a measurement probe).

All only for the non-overlapping 2x2/2 case (darknet-19's pools).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from yolojax.nn.layers import max_pool


def _pool22(x):
    n, h, w, c = x.shape
    return jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def _up2(y):
    # (N, P, Q, C) -> (N, 2P, 2Q, C) nearest upsample via broadcast
    n, p, q, c = y.shape
    return jnp.broadcast_to(
        y[:, :, None, :, None, :], (n, p, 2, q, 2, c)
    ).reshape(n, 2 * p, 2 * q, c)


@jax.custom_vjp
def pool_b(x):
    return _pool22(x)


def _pool_b_fwd(x):
    y = _pool22(x)
    return y, (x, y)


def _pool_b_bwd(res, dy):
    x, y = res
    ind = (x == _up2(y)).astype(dy.dtype)
    cnt = _pool22(ind)  # ties per window (>= 1)
    return (ind * _up2(dy / cnt),)


pool_b.defvjp(_pool_b_fwd, _pool_b_bwd)


@jax.custom_vjp
def pool_c(x):
    return _pool22(x)


def _pool_c_fwd(x):
    y = _pool22(x)
    return y, (x, y)


def _pool_c_bwd(res, dy):
    x, y = res
    return ((x == _up2(y)).astype(dy.dtype) * _up2(dy),)


pool_c.defvjp(_pool_c_fwd, _pool_c_bwd)


@jax.custom_vjp
def pool_d(x):
    return _pool22(x)


def _pool_d_fwd(x):
    y = _pool22(x)
    return y, (x, y)


def _pool_d_bwd(res, dy):
    # First-max routing (exactly select-and-scatter's tie behavior: window
    # scan order, >= keeps the earlier element), written as elementwise ops
    # on the four non-overlapping phases — no broadcasts, no scatter.
    x, y = res
    n, h, w, c = x.shape
    ph = x.reshape(n, h // 2, 2, w // 2, 2, c)
    v00, v01 = ph[:, :, 0, :, 0], ph[:, :, 0, :, 1]
    v10, v11 = ph[:, :, 1, :, 0], ph[:, :, 1, :, 1]
    m00 = v00 == y
    m01 = (v01 == y) & ~m00
    m10 = (v10 == y) & ~m00 & ~m01
    m11 = ~m00 & ~m01 & ~m10
    z = jnp.zeros_like(dy)
    dx = jnp.stack(
        [jnp.stack([jnp.where(m00, dy, z), jnp.where(m01, dy, z)], axis=3),
         jnp.stack([jnp.where(m10, dy, z), jnp.where(m11, dy, z)], axis=3)],
        axis=2,
    )  # (n, h//2, 2, w//2, 2, c)
    return (dx.reshape(n, h, w, c),)


pool_d.defvjp(_pool_d_fwd, _pool_d_bwd)


def timeit(fn, x, n=20):
    g = jax.jit(jax.grad(lambda x: fn(x).astype(jnp.float32).sum()))
    jax.block_until_ready(g(x))
    perturb = jax.jit(lambda x, i: x + i * 0.01)
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = g(perturb(x, float(i + 1)))
    float(jax.device_get(out[0, 0, 0, 0]))
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n):
        out = perturb(x, float(i + 1))
    float(jax.device_get(out[0, 0, 0, 0]))
    return (dt - (time.perf_counter() - t0)) / n


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    for h, c in [(416, 32), (208, 64)]:
        x = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(0), (b, h, h, c),
                               jnp.bfloat16))
        ta = timeit(functools.partial(max_pool, size=2, stride=2), x)
        tb = timeit(pool_b, x)
        tc = timeit(pool_c, x)
        td = timeit(pool_d, x)
        # D must match select-and-scatter EXACTLY (same first-max ties)
        ga = jax.jit(jax.grad(
            lambda x: max_pool(x, 2, 2).astype(jnp.float32).sum()))(x)
        gd = jax.jit(jax.grad(
            lambda x: pool_d(x).astype(jnp.float32).sum()))(x)
        ok = bool(jnp.all(ga == gd))
        print(f"{h}^2x{c} b{b}: A reduce_window {ta*1e3:7.3f} ms | "
              f"B tie-split {tb*1e3:7.3f} ms | C route-all {tc*1e3:7.3f} ms"
              f" | D first-max {td*1e3:7.3f} ms | grad D==A: {ok}")


if __name__ == "__main__":
    main()
