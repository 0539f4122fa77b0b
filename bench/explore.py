"""Perf exploration on the real chip: batch sweep, postprocess cost split,
train-step throughput, batch-1 latency. Informs bench.py defaults and
optimization targets. Uses the distinct-input + control-subtraction method
(see bench.py) to defeat remote-executor dedupe.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from yolojax.models import get_model
from yolojax.postprocess.nms import postprocess_v2
from yolojax.train.step import (
    OptimizerConfig, init_train_state, make_optimizer, make_train_step,
)

ITERS = 20


def timed_loop(fn, make_input, iters=ITERS, reps=3):
    """min over reps of (loop time) with distinct inputs; returns seconds/iter
    after subtracting the input-producing control loop."""
    fn(make_input(0))  # ensure compiled
    jax.block_until_ready(fn(make_input(1)))

    def loop(with_fn, n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            x = make_input(i + 2)
            out = fn(x) if with_fn else x
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    loop(True, 3)
    main = min(loop(True, iters) for _ in range(reps))
    ctrl = min(loop(False, iters) for _ in range(reps))
    return max(main - ctrl, 1e-9) / iters


def main():
    results = {}
    model = get_model("yolo2", "darknet", num_classes=20)
    params, state = model.init(jax.random.PRNGKey(0), 416)
    params = jax.device_put(params)
    state = jax.device_put(state)

    def make_images(batch, dim):
        base = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (batch, dim, dim, 3), jnp.float32))
        perturb = jax.jit(lambda x, i: x + i * 1e-9)
        return lambda i: perturb(base, float(i))

    def full(x):
        head, _ = model.apply(params, state, x, compute_dtype=jnp.bfloat16)
        out = postprocess_v2(head, model.anchors, score_thresh=0.3,
                             iou_thresh=0.4, top_k=256, use_pallas="auto")
        return out["keep"]

    def fwd_only(x):
        head, _ = model.apply(params, state, x, compute_dtype=jnp.bfloat16)
        return head

    full_jit = jax.jit(full)
    fwd_jit = jax.jit(fwd_only)

    for batch in (32, 64, 128, 256):
        dt = timed_loop(full_jit, make_images(batch, 416))
        results[f"infer_full_b{batch}"] = {
            "ms": dt * 1e3, "img_s": batch / dt}
        print(json.dumps({f"infer_full_b{batch}": results[f"infer_full_b{batch}"]}),
              flush=True)

    dt = timed_loop(fwd_jit, make_images(64, 416))
    results["fwd_only_b64"] = {"ms": dt * 1e3, "img_s": 64 / dt}
    print(json.dumps({"fwd_only_b64": results["fwd_only_b64"]}), flush=True)

    # batch-1 latency (p50-ish: min over reps is ~p50 on quiet chip)
    dt = timed_loop(full_jit, make_images(1, 416), iters=30)
    results["latency_b1_ms"] = dt * 1e3
    print(json.dumps({"latency_b1_ms": dt * 1e3}), flush=True)

    # train step throughput (batch 64, dim 416, bf16, augmentation on)
    tx = make_optimizer(OptimizerConfig(optimizer="momentum",
                                        learning_rate=1e-3))
    ts = init_train_state(model, tx, jax.random.PRNGKey(0), 416)
    ts = jax.device_put(ts)
    step = make_train_step(model, tx, augment=True,
                           compute_dtype=jnp.bfloat16)
    b = 64
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(2), (b, 448, 448, 3), jnp.float32))
    boxes = jax.device_put(jnp.tile(
        jnp.asarray([[0.5, 0.5, 0.4, 0.4]], jnp.float32), (b, 8, 1)))
    cls = jax.device_put(jnp.zeros((b, 8), jnp.int32))
    valid = jax.device_put(jnp.zeros((b, 8), bool).at[:, 0].set(True))
    rng = jax.random.PRNGKey(3)
    # distinct inputs via the rng fold-in on ts.step (state advances anyway)
    ts, m = step(ts, (imgs, boxes, cls, valid), rng, dim=416)
    jax.block_until_ready(m["total"])
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        ts, m = step(ts, (imgs, boxes, cls, valid), rng, dim=416)
    jax.block_until_ready(m["total"])
    dt = (time.perf_counter() - t0) / N
    results["train_step_b64"] = {"ms": dt * 1e3, "img_s": b / dt}
    print(json.dumps({"train_step_b64": results["train_step_b64"]}), flush=True)

    print("FINAL " + json.dumps(results))


if __name__ == "__main__":
    main()
