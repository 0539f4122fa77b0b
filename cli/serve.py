#!/usr/bin/env python3
"""Detection serving daemon: HTTP endpoint + dynamic request batching.

The reference had no serving layer — ``detect.py`` rebuilt the graph and
restored the checkpoint per invocation (SURVEY.md §3.3, §1 "no serving
layer beyond the detect scripts"). The TPU-native production answer: load
weights and compile the fused forward+decode+NMS program ONCE (or serve a
baked AOT artifact), then aggregate concurrently-arriving requests into
fixed-batch device dispatches (yolojax/serve/batching.py) so chip
utilization follows load. Clients POST one image per request and get
detections in original-pixel coordinates back as JSON.

API:
  GET  /healthz  -> {status, dim, batch, window_ms, backend, names, stats}
  GET  /stats    -> batching stats {images, batches, mean_fill, errors}
  POST /detect   <- raw image bytes (any cv2-decodable format)
                 -> {"detections": [{"name", "class", "score",
                     "box": [x0, y0, x1, y1]}],
                     "image": {"width", "height"}, "batch_fill": N}

Usage: python3 cli/serve.py -c config.ini --weights W --port 8628
       ... --artifact model.yjsa --port 8628   # baked AOT graph
       ... --batch 16 --window-ms 4            # batching knobs
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402

MAX_BODY_BYTES = 32 << 20  # reject absurd uploads before reading them


def _load_calib(cfg, calib_dir):
    """Letterboxed canvases from a directory of real images, for int8
    activation calibration at server start (same knob as cli/detect.py's
    batched path; a daemon has no 'first N inputs' to calibrate on).
    Undecodable files (READMEs, sidecars) are skipped with a warning."""
    import glob
    import logging

    import cv2

    from yolojax.data.augment import letterbox_host

    log = logging.getLogger("serve")
    canvases = []
    want = max(cfg.detect.calib_images, 1)
    for p in sorted(glob.glob(os.path.join(calib_dir, "*"))):
        if not os.path.isfile(p) or len(canvases) >= want:
            continue
        img = cv2.imread(p)
        if img is None:
            log.warning("calib-dir: skipping undecodable %s", p)
            continue
        raw = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        canvases.append(letterbox_host(raw, cfg.model.dim,
                                       stretch=cfg.detect.stretch)[0])
    if not canvases:
        raise SystemExit(f"--calib-dir {calib_dir}: no image files")
    return canvases


def build_server(cfg, host, port, weights="", artifact="", batch=0,
                 window_ms=5.0, calib_dir="", max_queue=0,
                 data_parallel=False, pipeline_depth=1):
    """Build detector + batcher + HTTP server (not yet serving).

    Returns (httpd, batcher); ``httpd.serve_forever()`` runs it,
    ``httpd.server_address`` carries the bound port (port 0 = ephemeral).
    The compile happens HERE, on a warmup batch — a daemon must pay the
    jit cost before accepting traffic, not on the first request.

    ``data_parallel``: shard each dispatched batch over all local devices
    (a multi-chip host serves batch/N images per chip in one program —
    throughput scales with chips, the window/fill semantics are unchanged).
    The batch is rounded up to a device multiple.
    """
    import logging
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import cv2
    import jax
    import numpy as np

    from yolojax.data.augment import letterbox_host
    from yolojax.serve.batching import DynamicBatcher, QueueFull

    from cli.detect import (_extract, build_detector, load_artifact_detector,
                            sync_artifact_cfg)

    log = logging.getLogger("serve")
    if artifact:
        if data_parallel:
            raise SystemExit("--data-parallel needs --weights (an AOT "
                             "artifact owns its device placement)")
        (names, dim, infer, art_batch), meta = load_artifact_detector(
            artifact)
        cfg = sync_artifact_cfg(cfg, meta)
        if batch and batch != art_batch:
            raise SystemExit(
                f"--batch {batch} conflicts with the artifact's baked "
                f"batch {art_batch} (re-export with --batch {batch})")
        batch = art_batch
    else:
        calib = _load_calib(cfg, calib_dir) if (
            calib_dir and cfg.detect.use_int8) else None
        names, dim, infer = build_detector(cfg, weights, calib,
                                           data_parallel=data_parallel)
        batch = batch or min(max(cfg.eval.batch_size, 1), 32)
        if data_parallel:
            n_local = len(jax.local_devices())
            dp_batch = batch + (-batch) % n_local
            if dp_batch != batch:
                log.info("data-parallel: batch %d -> %d (%d local devices)",
                         batch, dp_batch, n_local)
            batch = dp_batch

    filler = np.full((dim, dim, 3), 0.5, np.float32)
    log.info("warmup: compiling the serving graph (batch %d, dim %d)",
             batch, dim)
    infer(np.stack([filler] * batch))
    batcher = DynamicBatcher(infer, batch, filler, window_ms=window_ms,
                             max_queue=max_queue,
                             pipeline_depth=pipeline_depth)
    stretch = cfg.detect.stretch

    def health():
        return {
            "status": "ok",
            "dim": dim,
            "batch": batch,
            "window_ms": window_ms,
            "backend": jax.default_backend(),
            "devices": len(jax.local_devices()) if data_parallel else 1,
            "pipeline_depth": pipeline_depth,
            "names": list(names),
            "stats": batcher.stats(),
        }

    class Handler(BaseHTTPRequestHandler):
        server_version = "yolojax-serve/1.0"
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through logging, quiet
            log.debug("%s %s", self.address_string(), fmt % args)

        def _json(self, code, payload):
            blob = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, health())
            elif self.path == "/stats":
                self._json(200, batcher.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/detect":
                return self._json(404, {"error": f"unknown path {self.path}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                length = 0
            if length <= 0:
                return self._json(400, {"error": "empty body: POST raw "
                                                 "image bytes to /detect"})
            if length > MAX_BODY_BYTES:
                return self._json(413, {"error": f"body too large "
                                                 f"({length} bytes)"})
            body = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(body, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                return self._json(400, {"error": "undecodable image"})
            raw = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            canvas, tf = letterbox_host(raw, dim, stretch=stretch)
            try:
                res, fill = batcher.submit(canvas)
            except QueueFull as e:  # backpressure: shed, don't stack
                return self._json(429, {"error": str(e)})
            except RuntimeError as e:  # closed mid-shutdown
                return self._json(503, {"error": str(e)})
            out = {k: v[None] for k, v in res.items()}
            dets = _extract(out, 0, tf, raw.shape, names)
            self._json(200, {
                "detections": [
                    {"name": name, "class": cls, "score": round(score, 5),
                     "box": [round(float(v), 2) for v in (x0, y0, x1, y1)]}
                    for name, cls, score, (x0, y0, x1, y1) in dets
                ],
                "image": {"width": raw.shape[1], "height": raw.shape[0]},
                "batch_fill": fill,
            })

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.daemon_threads = True
    return httpd, batcher


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", default="",
                        help="npz / .weights / orbax dir / TF1 ckpt prefix")
    parser.add_argument("--artifact", default="",
                        help="AOT serving artifact from cli/export.py")
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address (default loopback; put a real "
                             "frontend in front for external traffic)")
    parser.add_argument("--port", type=int, default=8628)
    parser.add_argument("--batch", type=int, default=0,
                        help="device batch size (default: eval.batch_size; "
                             "artifact mode: the baked batch)")
    parser.add_argument("--window-ms", type=float, default=5.0,
                        help="max wait for a batch to fill before "
                             "dispatching a partial one")
    parser.add_argument("--max-queue", type=int, default=0,
                        help="requests allowed to wait beyond the batch "
                             "being assembled before new ones get 429 "
                             "(0 = 8x batch); with --pipeline-depth D "
                             "another D*batch can be in flight on the "
                             "device, so total in-system requests are "
                             "bounded by max-queue + D*batch")
    parser.add_argument("--calib-dir", default="",
                        help="directory of real images for int8 activation "
                             "calibration (detect.use_int8=1)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard each batch over all local devices "
                             "(multi-chip host throughput serving; batch "
                             "is rounded up to a device multiple)")
    parser.add_argument("--pipeline-depth", type=int, default=1,
                        help="batches allowed in flight at once (2 "
                             "overlaps host result scatter with device "
                             "compute of the next batch; 1 = serialize)")
    args = parser.parse_args()
    cfg = setup(args)
    if bool(args.weights) == bool(args.artifact):
        parser.error("exactly one of --weights or --artifact is required")

    import logging
    import signal

    log = logging.getLogger("serve")
    httpd, batcher = build_server(
        cfg, args.host, args.port, weights=args.weights,
        artifact=args.artifact, batch=args.batch,
        window_ms=args.window_ms, calib_dir=args.calib_dir,
        max_queue=args.max_queue, data_parallel=args.data_parallel,
        pipeline_depth=args.pipeline_depth)

    def _graceful(signum, frame):  # SIGTERM = orchestrated shutdown
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _graceful)
    log.info("serving on http://%s:%d (POST /detect)",
             *httpd.server_address[:2])
    print(f"READY http://{httpd.server_address[0]}:"
          f"{httpd.server_address[1]}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        log.info("shutting down")
    finally:
        httpd.server_close()
        batcher.close()  # drains queued requests before the join
        log.info("final stats: %s", batcher.stats())


if __name__ == "__main__":
    main()
