#!/usr/bin/env python3
"""Same-session A/B: int8 trunk with 1x1 convs as conv vs dot_general.

Round-5 experiment (PERF.md): the 104^2 1x1 conv profiled ~5x over its
byte roofline in a batch-minor layout; this measures whether the
bit-exact dot_general form gets a better layout. Result on v5e: 2%
slower — rejected as default, kept as apply_int8(one_by_one="dot").
"""
import json
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from yolojax.convert.fold import fold_bn
from yolojax.models import get_model
from yolojax.quantize.ptq import apply_int8, quantize_model

model = get_model("yolo2", "darknet", num_classes=20)
params, state = model.init(jax.random.PRNGKey(0), 416)
model, params, _ = fold_bn(model, params, state)
calib = jax.random.uniform(jax.random.PRNGKey(9), (8, 416, 416, 3), jnp.float32)
qm = quantize_model(model, jax.device_get(params), calib)
images = jax.device_put(jax.random.uniform(
    jax.random.PRNGKey(1), (128, 416, 416, 3), jnp.float32).astype(jnp.bfloat16))
perturb = jax.jit(lambda x, i: x + i * 0.01)

def measure(fn):
    jit_fn = jax.jit(fn)
    jax.block_until_ready(jit_fn(perturb(images, 0.0)))
    def run(n, with_infer):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            x = perturb(images, float(i + 1))
            out = jit_fn(x) if with_infer else x
        jax.device_get((out if with_infer else x).ravel()[:1])
        return time.perf_counter() - t0
    run(3, True)
    reps = sorted(run(20, True) for _ in range(5))
    ctrl = sorted(run(20, False) for _ in range(5))
    raw = reps[2] - ctrl[2]
    return 128 * 20 / max(raw, 1e-9)

r_conv = measure(lambda x: apply_int8(qm, x))
r_dot = measure(lambda x: apply_int8(qm, x, one_by_one="dot"))
print(json.dumps({"conv_img_s": round(r_conv, 1), "dot_img_s": round(r_dot, 1)}))
