#!/usr/bin/env python3
"""Per-fusion device profile of the b128 inference graph (round-2 perf work).

Captures a jax.profiler trace of N steady-state inference steps and prints
the top device ops by total duration, splitting forward vs postprocess.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:] if a != "--int8"]
    int8 = "--int8" in sys.argv[1:]
    batch = int(args[0]) if args else 128
    from yolojax.convert.fold import fold_bn
    from yolojax.models import get_model
    from yolojax.postprocess.nms import postprocess_v2

    from yolojax.nn.stem import fuse_stem

    model = get_model("yolo2", "darknet", num_classes=20)
    params, state = model.init(jax.random.PRNGKey(0), 416)
    model, params, state = fold_bn(model, params, state)
    if not int8:
        model, params, state = fuse_stem(model, params, state)
    params = jax.device_put(params)

    compute = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    if int8:
        from yolojax.quantize.ptq import apply_int8, quantize_model

        calib = jax.random.uniform(jax.random.PRNGKey(9), (8, 416, 416, 3),
                                   jnp.float32)
        qm = quantize_model(model, jax.device_get(params), calib)

        def forward(params, images):
            return apply_int8(qm, images)
    else:
        def forward(params, images):
            head, _ = model.apply(params, {}, images, compute_dtype=compute)
            return head

    @jax.jit
    def infer(params, images):
        head = forward(params, images)
        out = postprocess_v2(head, model.anchors, score_thresh=0.3,
                             iou_thresh=0.4, top_k=256, use_pallas="auto")
        return out["keep"]

    images = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(1), (batch, 416, 416, 3), jnp.float32).astype(compute))
    perturb = jax.jit(lambda x, i: x + i * 0.01)
    jax.block_until_ready(infer(params, perturb(images, 0.0)))

    trace_dir = "/tmp/yolojax_prof"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = None
        for i in range(8):
            out = infer(params, perturb(images, float(i + 1)))
        jax.device_get(out[:1, :1])

    from yolojax.utils.profiling import load_device_events

    agg = {}
    for e in load_device_events(trace_dir):
        a = agg.setdefault(e["name"], [0, 0.0, e.get("args", {})])
        a[0] += 1
        a[1] += e["dur"]  # microseconds
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    total = sum(v[1] for _, v in rows)
    print(f"device total: {total/1000:.2f} ms over 8 iters "
          f"=> {total/8000:.2f} ms/iter, {batch*8e6/total:.0f} img/s")
    for name, (cnt, dur, eargs) in rows[:35]:
        ln = str(eargs.get("long_name", ""))[:80]
        src = str(eargs.get("source", ""))[-36:]
        print(f"{dur/8000:9.3f} ms/it x{cnt//8:<3d} {name[:40]:42s} "
              f"{ln} | {src}")


if __name__ == "__main__":
    main()
