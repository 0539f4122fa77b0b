#!/usr/bin/env python3
"""Per-fusion device profile of the training step (round-2 perf work)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dim = 416
    from yolojax.models import get_model
    from yolojax.train.step import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step)

    model = get_model("yolo2", "darknet", num_classes=20)
    tx = make_optimizer(OptimizerConfig(optimizer="momentum", learning_rate=1e-3))
    ts = jax.device_put(init_train_state(model, tx, jax.random.PRNGKey(0), dim))
    compute = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    step = make_train_step(model, tx, augment=True, compute_dtype=compute)
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(2), (b, dim + 32, dim + 32, 3), jnp.float32))
    boxes = jax.device_put(jnp.tile(
        jnp.asarray([[0.5, 0.5, 0.4, 0.4]], jnp.float32), (b, 8, 1)))
    cls = jax.device_put(jnp.zeros((b, 8), jnp.int32))
    valid = jax.device_put(jnp.zeros((b, 8), bool).at[:, 0].set(True))
    rng = jax.random.PRNGKey(3)
    chain = jax.jit(lambda x, s: x + s * 1e-12)
    ts, m = step(ts, (imgs, boxes, cls, valid), rng, dim=dim)
    jax.block_until_ready(m["total"])

    trace_dir = "/tmp/yolojax_prof_train"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(4):
            x = chain(imgs, m["total"])
            ts, m = step(ts, (x, boxes, cls, valid), rng, dim=dim)
        float(jax.device_get(m["total"]))

    from yolojax.utils.profiling import load_device_events

    agg = {}
    for e in load_device_events(trace_dir):
        a = agg.setdefault(e["name"], [0, 0.0, e.get("args", {})])
        a[0] += 1
        a[1] += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    n_it = 4
    for name, (cnt, dur, args) in rows[:30]:
        ln = args.get("long_name", "")
        cat = args.get("hlo_category", "")
        src = str(args.get("source", ""))[-40:]
        print(f"{dur/1000/n_it:8.3f} ms/it x{cnt//n_it:<3d} [{cat[:18]:18s}] "
              f"{name[:30]:32s} {ln[:90]} | {src}")


if __name__ == "__main__":
    main()
