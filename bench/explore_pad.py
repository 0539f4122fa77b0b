#!/usr/bin/env python3
"""Same-session A/B: does zero-padding the RGB input (3 -> N channels,
bitwise-exact — see tests/unit/test_models.py) speed up the train step /
forward on TPU?

Hypothesis (PERF.md round-3 profile): conv0's weight-gradient (4.1 ms/step
at b64/416) is bound by lane waste — C=3 on the minor dim uses 3 of 128
lanes in every vector load of the image operand. Padding to 4/8/16 trades a
small pad write for aligned loads.

Usage: python bench/explore_pad.py [--batch 64] [--dim 416] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=416)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pads", default="0,4,8,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yolojax.models import get_model
    from yolojax.train.step import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step,
    )

    compute = jnp.bfloat16
    model = get_model("yolo2", "darknet", num_classes=20)
    b, dim, n = args.batch, args.dim, args.iters
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(2), (b, dim + 32, dim + 32, 3), jnp.float32))
    boxes = jax.device_put(jnp.tile(
        jnp.asarray([[0.5, 0.5, 0.4, 0.4]], jnp.float32), (b, 8, 1)))
    cls = jax.device_put(jnp.zeros((b, 8), jnp.int32))
    valid = jax.device_put(jnp.zeros((b, 8), bool).at[:, 0].set(True))
    rng = jax.random.PRNGKey(3)
    chain = jax.jit(lambda x, s: x + s * 1e-12)

    def train_rate(pad):
        tx = make_optimizer(OptimizerConfig(optimizer="momentum",
                                            learning_rate=1e-3))
        ts = jax.device_put(
            init_train_state(model, tx, jax.random.PRNGKey(0), dim))
        step = make_train_step(model, tx, augment=True, compute_dtype=compute,
                               pad_input_channels=pad)
        ts, m = step(ts, (imgs, boxes, cls, valid), rng, dim=dim)
        jax.block_until_ready(m["total"])

        def timed():
            nonlocal ts, m
            t0 = time.perf_counter()
            for _ in range(n):
                x = chain(imgs, m["total"])
                ts, m = step(ts, (x, boxes, cls, valid), rng, dim=dim)
            float(jax.device_get(m["total"]))
            return time.perf_counter() - t0

        timed()
        dt = min(timed() for _ in range(3)) / n
        del ts, m
        return b / dt

    def fwd_rate(pad):
        params, state = model.init(jax.random.PRNGKey(0), dim)
        params = jax.device_put(params)
        state = jax.device_put(state)
        x0 = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(4), (b, dim, dim, 3), compute))

        @jax.jit
        def fwd(x):
            out, _ = model.apply(params, state, x, compute_dtype=compute,
                                 pad_input_channels=pad)
            return out

        jax.block_until_ready(fwd(x0))

        def timed():
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = fwd(x0 + jnp.asarray(i * 1e-6, compute))
            jax.device_get(out[:1, :1, :1, :1, :1])
            return time.perf_counter() - t0

        timed()
        return b * n / min(timed() for _ in range(3))

    print(f"backend={jax.default_backend()} b={b} dim={dim} iters={n}")
    for pad in [int(p) for p in args.pads.split(",")]:
        tr = train_rate(pad)
        fw = fwd_rate(pad)
        print(f"pad={pad:3d}  train {tr:8.1f} img/s   fwd-only {fw:8.1f} "
              f"img/s", flush=True)


if __name__ == "__main__":
    main()
