#!/usr/bin/env python3
"""Measured throughput/latency of the HTTP serving daemon (cli/serve.py).

Starts the daemon in-process (same build_server the CLI uses), then fires
C concurrent clients cycling over K DISTINCT pre-encoded images — distinct
by necessity: the axon remote executor dedupes identical execute requests
(PERF.md), and a client hammering one image would let every batch present
the same input array. Reports steady-state img/s, latency percentiles,
and the mean batch fill actually achieved.

This measures the whole production path: HTTP parse -> JPEG decode ->
letterbox -> dynamic batching -> device dispatch -> un-letterbox -> JSON.
On a many-core serving host the decode fans out per-connection-thread;
on a 1-vCPU sandbox the host side is the bottleneck and the number is a
floor, not the chip's.

Usage: python bench/serve_bench.py -c cfg.ini --weights W [--batch 16]
         [--window-ms 5] [--clients 16] [--requests 200] [--dim-src 416]
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def _encode_images(k, h, w, seed=5):
    import cv2
    import numpy as np

    rng = np.random.default_rng(seed)
    blobs = []
    for _ in range(k):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        blobs.append(buf.tobytes())
    return blobs


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", required=True)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--window-ms", type=float, default=5.0)
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--requests", type=int, default=200,
                        help="timed requests total (after warmup)")
    parser.add_argument("--distinct", type=int, default=32,
                        help="distinct images the clients cycle over")
    parser.add_argument("--dim-src", type=int, default=416,
                        help="source image size clients upload")
    parser.add_argument("--pipeline-depth", type=int, default=1,
                        help="batches in flight at once (see cli/serve.py)")
    parser.add_argument("--direct", action="store_true",
                        help="skip HTTP + JPEG decode: clients submit "
                             "pre-letterboxed canvases straight to the "
                             "DynamicBatcher — measures batching + "
                             "(pipelined) dispatch against the device "
                             "envelope, which a 1-vCPU host's decode "
                             "bottleneck would otherwise mask")
    parser.add_argument("--sweep", action="store_true",
                        help="direct-mode knob sweep: compile the detect "
                             "graph ONCE, then measure every "
                             "pipeline-depth x window-ms combination "
                             "around it (one JSON line each) — the "
                             "docs/TUNING.md evidence run")
    args = parser.parse_args()
    cfg = setup(args)

    if args.sweep:
        return sweep_bench(args, cfg)

    from cli.serve import build_server

    httpd, batcher = build_server(
        cfg, "127.0.0.1", 0, weights=args.weights, batch=args.batch,
        window_ms=args.window_ms, pipeline_depth=args.pipeline_depth)
    if args.direct:
        return direct_bench(args, batcher, cfg, httpd)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    blobs = _encode_images(args.distinct, args.dim_src, args.dim_src)

    def post(blob):
        t0 = time.perf_counter()
        r = urllib.request.urlopen(
            urllib.request.Request(base + "/detect", data=blob,
                                   method="POST"), timeout=300)
        body = json.loads(r.read())
        return (time.perf_counter() - t0) * 1e3, body["batch_fill"]

    # warmup: two full batches through the whole path
    for i in range(2 * args.batch):
        post(blobs[i % len(blobs)])
    stats0 = batcher.stats()

    lats = []
    lock = threading.Lock()
    counter = iter(range(args.requests))

    def client(cid):
        k = cid
        while True:
            with lock:
                n = next(counter, None)
            if n is None:
                return
            dt, _ = post(blobs[k % len(blobs)])
            k += args.clients
            with lock:
                lats.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats1 = batcher.stats()

    lats.sort()
    batches = stats1["batches"] - stats0["batches"]
    images = stats1["images"] - stats0["images"]
    print(json.dumps({
        "metric": "http_serve_images_per_sec",
        "value": round(len(lats) / wall, 1),
        "unit": "img/s",
        "batch": args.batch,
        "window_ms": args.window_ms,
        "clients": args.clients,
        "p50_ms": round(lats[len(lats) // 2], 1),
        "p99_ms": round(lats[int(len(lats) * 0.99)], 1),
        "mean_fill": round(images / batches, 2) if batches else None,
        "pipeline_depth": args.pipeline_depth,
        "errors": stats1["errors"],
        "backend": __import__("jax").default_backend(),
    }))
    httpd.shutdown()
    httpd.server_close()
    batcher.close()


def sweep_bench(args, cfg):
    """One compile, many batcher configs: measures how --pipeline-depth
    and --window-ms move steady img/s and latency at a fixed batch, so
    the recommended knobs are data (VERDICT r4 next #4)."""
    import numpy as np

    from cli.detect import build_detector
    from yolojax.serve.batching import DynamicBatcher

    names, dim, infer = build_detector(cfg, args.weights)
    filler = np.full((dim, dim, 3), 0.5, np.float32)
    infer(np.stack([filler] * args.batch))  # the one compile
    rng = np.random.default_rng(5)
    canvases = [rng.uniform(0, 1, (dim, dim, 3)).astype(np.float32)
                for _ in range(args.distinct)]

    for depth in (1, 2):
        for window in (2.0, 5.0, 10.0):
            batcher = DynamicBatcher(infer, args.batch, filler,
                                     window_ms=window,
                                     pipeline_depth=depth)
            lats = []
            lock = threading.Lock()
            for i in range(args.batch):  # warm this batcher's worker
                batcher.submit(canvases[i % len(canvases)])
            stats0 = batcher.stats()
            counter = iter(range(args.requests))

            def client(cid):
                k = cid
                while True:
                    with lock:
                        n = next(counter, None)
                    if n is None:
                        return
                    t0 = time.perf_counter()
                    batcher.submit(canvases[k % len(canvases)])
                    dt = (time.perf_counter() - t0) * 1e3
                    k += args.clients
                    with lock:
                        lats.append(dt)

            t0 = time.perf_counter()
            threads = [threading.Thread(target=client, args=(c,))
                       for c in range(args.clients)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            stats1 = batcher.stats()
            lats.sort()
            batches = stats1["batches"] - stats0["batches"]
            images = stats1["images"] - stats0["images"]
            print(json.dumps({
                "metric": "serve_direct_sweep",
                "img_per_sec": round(len(lats) / wall, 1),
                "batch": args.batch,
                "window_ms": window,
                "pipeline_depth": depth,
                "clients": args.clients,
                "p50_ms": round(lats[len(lats) // 2], 1),
                "p99_ms": round(lats[int(len(lats) * 0.99)], 1),
                "mean_fill": round(images / batches, 2) if batches else None,
                "errors": stats1["errors"],
            }), flush=True)
            batcher.close()
    return 0


def direct_bench(args, batcher, cfg, httpd):
    """Clients submit distinct float canvases straight to the batcher.
    Reports steady img/s (the daemon's dispatch envelope), fill, and the
    per-request latency distribution — the knob-tuning surface for
    --pipeline-depth / --window-ms / --batch (docs/TUNING.md)."""
    import numpy as np

    dim = cfg.model.dim
    rng = np.random.default_rng(5)
    canvases = [rng.uniform(0, 1, (dim, dim, 3)).astype(np.float32)
                for _ in range(args.distinct)]

    def submit(k):
        t0 = time.perf_counter()
        batcher.submit(canvases[k % len(canvases)])
        return (time.perf_counter() - t0) * 1e3

    for i in range(2 * args.batch):  # warmup
        submit(i)
    stats0 = batcher.stats()
    lats = []
    lock = threading.Lock()
    counter = iter(range(args.requests))

    def client(cid):
        k = cid
        while True:
            with lock:
                n = next(counter, None)
            if n is None:
                return
            dt = submit(k)
            k += args.clients
            with lock:
                lats.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats1 = batcher.stats()
    lats.sort()
    batches = stats1["batches"] - stats0["batches"]
    images = stats1["images"] - stats0["images"]
    print(json.dumps({
        "metric": "serve_direct_images_per_sec",
        "value": round(len(lats) / wall, 1),
        "unit": "img/s",
        "batch": args.batch,
        "window_ms": args.window_ms,
        "clients": args.clients,
        "p50_ms": round(lats[len(lats) // 2], 1),
        "p99_ms": round(lats[int(len(lats) * 0.99)], 1),
        "mean_fill": round(images / batches, 2) if batches else None,
        "pipeline_depth": args.pipeline_depth,
        "errors": stats1["errors"],
        "backend": __import__("jax").default_backend(),
    }))
    httpd.server_close()
    batcher.close()


if __name__ == "__main__":
    main()
