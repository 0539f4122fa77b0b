#!/usr/bin/env python3
"""Benchmark harness: YOLOv2-416 batched inference throughput incl. on-device
NMS (BASELINE.json metric). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the driver target is >5000 img/s on a v5e-8 => 625 img/s/chip;
vs_baseline = value / 625. Runs on whatever the default backend is (the
real TPU chip under axon; CPU fallback works but is not the number that
matters). Compile time is excluded (warmup step before timing).
"""

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dim", type=int, default=416)
    p.add_argument("--model", default="darknet", choices=["darknet", "tiny"])
    p.add_argument("--top-k", type=int, default=256)
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantized conv trunk")
    p.add_argument("--train", action="store_true",
                   help="benchmark the training step instead of inference")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from yolojax.models import get_model
    from yolojax.postprocess.nms import postprocess_v2

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    compute = jnp.bfloat16 if on_tpu else jnp.float32

    if args.train:
        return bench_train(args, jax, jnp, compute, backend)

    from yolojax.convert.fold import fold_bn

    model = get_model("yolo2", args.model, num_classes=20)
    params, state = model.init(jax.random.PRNGKey(0), args.dim)
    model, params, state = fold_bn(model, params, state)  # inference-time
    params = jax.device_put(params)
    state = jax.device_put(state)

    if args.int8:
        from yolojax.quantize.ptq import apply_int8, quantize_model

        calib = jax.random.uniform(
            jax.random.PRNGKey(9), (8, args.dim, args.dim, 3), jnp.float32)
        qm = quantize_model(model, jax.device_get(params), calib)

        def forward(images):
            return apply_int8(qm, images)
    else:
        def forward(images):
            head, _ = model.apply(params, state, images,
                                  compute_dtype=compute)
            return head

    def infer(images):
        head = forward(images)
        out = postprocess_v2(
            head, model.anchors, score_thresh=0.3, iou_thresh=0.4,
            top_k=args.top_k, use_pallas="auto",
        )
        return out["boxes"], out["scores"], out["classes"], out["keep"]

    # Every iteration gets a DISTINCT input (device-side scalar add keyed on
    # the iteration index). The axon remote executor dedupes repeated
    # identical execute requests, which makes naive same-args dispatch loops
    # report absurd throughput; distinct inputs defeat that while the
    # dispatch loop still pipelines like a real serving loop. The perturb
    # add costs one HBM read/write of the batch (~0.5 ms), subtracted via
    # a control measurement of the perturb op alone.
    infer_jit = jax.jit(infer)
    perturb = jax.jit(lambda x, i: x + i * 1e-9)

    images = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, args.dim, args.dim, 3), jnp.float32)
    )

    jax.block_until_ready(infer_jit(perturb(images, 0.0)))  # compile + warmup

    def timed(n, with_infer):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            x = perturb(images, float(i + 1))
            out = infer_jit(x) if with_infer else x
        # fetch a value: a real completion barrier on the axon tunnel
        # (block_until_ready alone can ack early for some graphs)
        if with_infer:
            jax.device_get(out[3][:1, :1])
        else:
            jax.device_get(x[:1, :1, :1, :1])
        return time.perf_counter() - t0

    timed(3, True)
    reps = [timed(args.iters, True) for _ in range(3)]
    ctrl = [timed(args.iters, False) for _ in range(3)]
    dt = max(min(reps) - min(ctrl), 1e-9)
    imgs_per_sec = args.batch * args.iters / dt
    baseline_per_chip = 5000.0 / 8.0  # driver target spread over a v5e-8
    result = {
        "metric": f"yolov2-{args.dim} {args.model}"
                  + ("-int8" if args.int8 else "")
                  + f" batched inference (incl. on-device NMS) [{backend}]",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline_per_chip, 4),
    }
    print(json.dumps(result))
    return 0


def bench_train(args, jax, jnp, compute, backend):
    """Training-step throughput (aug+fwd+bwd+opt), one JSON line."""
    import time as _time

    from yolojax.models import get_model
    from yolojax.train.step import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step,
    )

    model = get_model("yolo2", args.model, num_classes=20)
    tx = make_optimizer(OptimizerConfig(optimizer="momentum",
                                        learning_rate=1e-3))
    ts = jax.device_put(
        init_train_state(model, tx, jax.random.PRNGKey(0), args.dim))
    step = make_train_step(model, tx, augment=True, compute_dtype=compute)
    b = args.batch
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(2), (b, args.dim + 32, args.dim + 32, 3),
        jnp.float32))
    boxes = jax.device_put(jnp.tile(
        jnp.asarray([[0.5, 0.5, 0.4, 0.4]], jnp.float32), (b, 8, 1)))
    cls = jax.device_put(jnp.zeros((b, 8), jnp.int32))
    valid = jax.device_put(jnp.zeros((b, 8), bool).at[:, 0].set(True))
    rng = jax.random.PRNGKey(3)
    # Chain each step's input on the previous step's loss (an on-device
    # elementwise op, no host round-trip): the remote executor cannot
    # dedupe or reorder a true data dependency, so wall time / n is the
    # real per-step latency. (Distinct-buffer perturbs alone were not
    # enough here — donation-heavy trains still got deduped; see PERF.md.)
    chain = jax.jit(lambda x, s: x + s * 1e-12)
    ts, m = step(ts, (imgs, boxes, cls, valid), rng, dim=args.dim)
    jax.block_until_ready(m["total"])
    n = max(args.iters // 2, 5)

    def timed():
        nonlocal ts, m
        t0 = _time.perf_counter()
        for _ in range(n):
            x = chain(imgs, m["total"])
            ts, m = step(ts, (x, boxes, cls, valid), rng, dim=args.dim)
        # block_until_ready is NOT a reliable completion barrier for
        # donation-heavy graphs on the axon tunnel; fetch the value.
        float(jax.device_get(m["total"]))
        return _time.perf_counter() - t0

    timed()
    dt = min(timed() for _ in range(2)) / n
    imgs_per_sec = b / dt
    print(json.dumps({
        "metric": f"yolov2-{args.dim} {args.model} train step "
                  f"(aug+fwd+bwd+opt) [{backend}]",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / (5000.0 / 8.0), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
