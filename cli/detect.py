#!/usr/bin/env python3
"""Single-image detection — CLI-compatible with the reference's ``detect.py``
(SURVEY.md §3.3): load checkpoint, preprocess, forward pass, decode boxes,
confidence threshold, per-class NMS, draw.

TPU-native shape: one jitted fn runs forward + decode + top-K + batched NMS
on device (Pallas kernel on TPU); only kept boxes return to the host.

Usage: python3 cli/detect.py -c config.ini --weights W --image IMG [--out OUT]
       ... --weights W --stdin   # serve: one image path per line, weights
                                 # loaded and graph compiled exactly once
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def build_serving(cfg, weights_path, calib_canvases=None, portable=False,
                  mesh=None):
    """Build the serving stack without binding it to a call style: load
    weights, fold BN (+ optional stem fusion / int8 trunk), jit the graph.
    Returns (names, dim, infer_fn(params, bn_state, canvases), params,
    bn_state) — consumed by :func:`build_detector` (interactive CLIs) and
    ``cli/export.py`` (AOT artifact export).

    ``calib_canvases``: letterboxed input canvases for int8 activation
    calibration (real data; falls back with a warning when absent).

    ``portable``: build a backend-independent graph (f32 compute, lax NMS,
    exact top-k, no Pallas stem) regardless of the ambient backend — for
    exports that must execute on plain CPU hosts (TF SavedModel).

    ``mesh``: a local ``(data, model=1)`` mesh for data-parallel serving —
    params / bn state / int8 constants are replicated over it so a
    batch-sharded input runs each shard's forward+NMS on its own chip
    (same GSPMD layout as the evaluator's DP path; no collectives).
    """
    import logging

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolojax.convert.fold import fold_bn
    from yolojax.eval.evaluator import make_infer_fn
    from yolojax.utils.restore import load_weights

    log = logging.getLogger("detect")
    model = cfg.build_model()
    names = cfg.names()
    dim = cfg.model.dim
    params, bn_state = load_weights(weights_path, model, dim,
                                    use_ema=cfg.detect.use_ema)
    model, params, bn_state = fold_bn(model, params, bn_state)  # inference
    if not cfg.detect.use_int8:
        from yolojax.nn.stem import fuse_stem

        stem_impl = cfg.detect.fuse_stem
        if portable and stem_impl != "off":
            log.warning("portable export: detect.fuse_stem=%s disabled "
                        "(fused stems are TPU-layout-specific)", stem_impl)
            stem_impl = "off"
        model, params, bn_state = fuse_stem(model, params, bn_state,
                                            impl=stem_impl)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    bn_state = jax.tree_util.tree_map(jnp.asarray, bn_state)

    qm = None
    if cfg.detect.use_int8:
        from yolojax.quantize.ptq import quantize_model

        if calib_canvases:
            calib = jnp.asarray(np.stack(calib_canvases))
            log.info("int8 conv trunk enabled (calibrated on %d input "
                     "images, percentile %.4g)", len(calib_canvases),
                     cfg.detect.calib_percentile)
        else:
            calib = jax.random.uniform(jax.random.PRNGKey(9),
                                       (8, dim, dim, 3), jnp.float32)
            log.warning("int8 calibration falling back to synthetic inputs")
        qm = quantize_model(model, jax.device_get(params), calib,
                            percentile=cfg.detect.calib_percentile,
                            bits=cfg.detect.quant_bits)
        if cfg.detect.fuse_stem != "off":
            from yolojax.quantize.ptq import fuse_stem_int8

            # bit-exact phase-packed conv0+pool; opt-in like the bf16
            # stem (measured slower on v5e — PERF.md round 5)
            qm = fuse_stem_int8(qm)
    if mesh is not None:
        import dataclasses as _dc

        from yolojax.parallel.mesh import replicated

        params = jax.device_put(params, replicated(mesh))
        bn_state = jax.device_put(bn_state, replicated(mesh))
        if qm is not None:
            qm = _dc.replace(
                qm, qparams=jax.device_put(qm.qparams, replicated(mesh)))
    if portable:
        use_pallas, candidates = "never", "exact"
        compute = jnp.float32
    else:
        use_pallas, candidates = cfg.detect.use_pallas, cfg.detect.candidates
        compute = (jnp.float32 if jax.default_backend() == "cpu"
                   else jnp.bfloat16)
    infer_fn = make_infer_fn(
        model, score_thresh=cfg.detect.threshold,
        iou_thresh=cfg.detect.nms_iou,
        top_k=cfg.detect.top_k, use_pallas=use_pallas,
        candidates=candidates, compute_dtype=compute, qm=qm,
    )
    return names, dim, infer_fn, params, bn_state


def build_detector(cfg, weights_path, calib_canvases=None,
                   data_parallel=False):
    """Load weights and jit the serving graph once. Returns
    (names, dim, infer(canvases) -> host dict).

    ``data_parallel``: shard the batch axis over every local device (the
    serving answer to a multi-chip host, e.g. v5e-8: one compiled program,
    each chip runs batch/N images' forward+decode+NMS independently —
    embarrassingly parallel, throughput scales with local chips). The
    caller's batch must be divisible by the local device count; params and
    int8 constants are replicated over the local mesh."""
    import logging

    import jax
    import numpy as np

    mesh = None
    if data_parallel:
        n_local = len(jax.local_devices())
        if n_local > 1:
            from yolojax.parallel.mesh import make_mesh

            mesh = make_mesh(jax.local_devices(), data=n_local, model=1)
            logging.getLogger("detect").info(
                "detector: data-parallel over %d local devices", n_local)
        else:
            logging.getLogger("detect").warning(
                "data_parallel requested but only 1 local device; "
                "serving single-device")
    names, dim, infer_fn, params, bn_state = build_serving(
        cfg, weights_path, calib_canvases, mesh=mesh)

    if mesh is not None:
        from yolojax.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
        n_data = mesh.shape["data"]

        def infer(canvases):
            x = np.asarray(canvases)
            if x.shape[0] % n_data:
                raise ValueError(
                    f"data-parallel serving needs batch % {n_data} == 0, "
                    f"got batch {x.shape[0]}")
            x = jax.device_put(x, sharding)
            return jax.device_get(infer_fn(params, bn_state, x))
    else:

        def infer(canvases):
            return jax.device_get(infer_fn(params, bn_state, canvases))

    return names, dim, infer


def load_artifact_detector(artifact_path):
    """Serve from an AOT artifact (cli/export.py): names/dim/thresholds
    come from the artifact header, the graph from its baked StableHLO —
    no config model section or weight files needed. Returns
    ((names, dim, infer(canvases) -> host dict, fixed_batch), meta)."""
    import logging

    import jax

    from yolojax.serve import load_artifact

    art = load_artifact(artifact_path)
    logging.getLogger("detect").info(
        "serving artifact: dim %d batch %d platforms %s (%d classes)",
        art.meta["dim"], art.meta["batch"], art.meta["platforms"],
        len(art.meta["names"]))

    def infer(canvases):
        return jax.device_get(art(canvases))

    return (tuple(art.meta["names"]), int(art.meta["dim"]), infer,
            int(art.meta["batch"])), art.meta


def _read_rgb(path):
    """Load an image as RGB or fail with the offending path (cv2.imread
    returns None on unreadable files; letting that flow into cvtColor
    raises an opaque '!_src.empty()' error with no filename)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise SystemExit(f"unreadable image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def sync_artifact_cfg(cfg, meta):
    """Rebuild the (frozen) config so host preprocessing matches what the
    artifact's graph was exported for — the letterbox style must agree."""
    import dataclasses

    return dataclasses.replace(cfg, detect=dataclasses.replace(
        cfg.detect, stretch=bool(meta.get("stretch", cfg.detect.stretch))))


class LazyDetector:
    """Deferred detector build shared by the stream (``--stdin``) and
    camera CLIs: buffers the first ``detect.calib_images`` readable frames
    so int8 activation scales calibrate on real inputs (the same knob as
    the batched detect path), then builds once and drains the queue in
    arrival order. Frameless responses (e.g. unreadable-path errors) queue
    behind buffered frames so output order always matches input order —
    they emit immediately when nothing is buffered.

    ``process(item)`` is the per-frame callback; it reads ``self.infer``
    and ``self.names`` (bound by :meth:`flush`, or :meth:`bind` for AOT
    artifacts, where no buffering ever happens)."""

    def __init__(self, cfg, weights_path, process):
        self._cfg = cfg
        self._weights = weights_path
        self._process = process
        self._pending = []  # ("frame", canvas, item) | ("call", fn)
        self.calib_target = (max(cfg.detect.calib_images, 1)
                             if cfg.detect.use_int8 else 1)
        self.names = None
        self.dim = cfg.model.dim
        self.infer = None

    @property
    def ready(self):
        return self.infer is not None

    @property
    def pending_frames(self):
        return sum(e[0] == "frame" for e in self._pending)

    def bind(self, names, dim, infer):
        """Serve an already-built graph (AOT artifact): no lazy build."""
        self.names, self.dim, self.infer = names, dim, infer

    def add_frame(self, canvas, item):
        if self.infer is None:
            self._pending.append(("frame", canvas, item))
            if self.pending_frames >= self.calib_target:
                self.flush()
        else:
            self._process(item)

    def defer(self, fn):
        if self.infer is None and self.pending_frames:
            self._pending.append(("call", fn))
        else:
            fn()

    def flush(self):
        """Build on whatever frames arrived (short streams calibrate on
        fewer than calib_target) and drain the queue in order."""
        if not self._pending:
            return
        if self.infer is None:
            canvases = [e[1] for e in self._pending if e[0] == "frame"]
            self.names, self.dim, self.infer = build_detector(
                self._cfg, self._weights,
                canvases if self._cfg.detect.use_int8 else None)
        for entry in self._pending:
            if entry[0] == "frame":
                self._process(entry[2])
            else:
                entry[1]()
        self._pending.clear()


def _extract(out, k, tf, raw_shape, names):
    """Un-letterbox image k's kept boxes to original coords."""
    import numpy as np

    sx, sy, px, py = tf
    dets = []
    for d in np.where(out["keep"][k])[0]:
        y0, x0, y1, x1 = out["boxes"][k, d]
        x0 = (x0 - px) / sx * raw_shape[1]
        x1 = (x1 - px) / sx * raw_shape[1]
        y0 = (y0 - py) / sy * raw_shape[0]
        y1 = (y1 - py) / sy * raw_shape[0]
        cls = int(out["classes"][k, d])
        score = float(out["scores"][k, d])
        dets.append((names[cls], cls, score, (x0, y0, x1, y1)))
    return dets


def _annotate(raw_rgb, dets):
    import cv2

    from yolojax.utils.draw import draw_detection

    img = cv2.cvtColor(raw_rgb.copy(), cv2.COLOR_RGB2BGR)
    for name, cls, score, (x0, y0, x1, y1) in dets:
        draw_detection(img, int(x0), int(y0), int(x1), int(y1),
                       f"{name} {score:.2f}", cls)
    return img


def run_detect(cfg, weights_path, image_paths, out_path=None, show=False,
               detector=None, data_parallel=False):
    import logging
    import time

    import cv2
    import jax
    import numpy as np

    from yolojax.data.augment import letterbox_host

    log = logging.getLogger("detect")

    if detector is not None:  # AOT artifact: fixed batch, baked graph
        names, dim, infer, batch = detector
    else:
        dim = cfg.model.dim
        calib = None
        if cfg.detect.use_int8:
            # Calibrate activation scales on the actual inputs (letterboxed
            # the same way the forward pass will see them) — real data, not
            # noise.
            calib = []
            for p in image_paths[: max(cfg.detect.calib_images, 1)]:
                canvas, _ = letterbox_host(_read_rgb(p), dim,
                                           stretch=cfg.detect.stretch)
                calib.append(canvas)
        data_parallel = data_parallel and len(image_paths) > 1
        names, dim, infer = build_detector(cfg, weights_path, calib,
                                           data_parallel=data_parallel)

        # Batched path: pad the image list up to a fixed batch so
        # many-image detects compile once and ride the chip's batched
        # throughput (the reference looped sess.run per image).
        batch = 1 if len(image_paths) == 1 else min(
            max(cfg.eval.batch_size, 1), 32
        )
        if data_parallel and len(jax.local_devices()) > 1:
            # DP shards the batch axis: round up to a full device multiple
            n_local = len(jax.local_devices())
            batch += (-batch) % n_local
    results = []
    for start in range(0, len(image_paths), batch):
        group = image_paths[start : start + batch]
        raws, canvases, tfs = [], [], []
        for image_path in group:
            raw = _read_rgb(image_path)
            canvas, tf = letterbox_host(raw, dim, stretch=cfg.detect.stretch)
            raws.append(raw)
            canvases.append(canvas)
            tfs.append(tf)
        while len(canvases) < batch:  # pad to the compiled batch size
            canvases.append(np.full((dim, dim, 3), 0.5, np.float32))
        t0 = time.perf_counter()
        # pass the host stack directly: jit device_puts it once in the
        # single-device path, and the DP wrapper shards it with a single
        # device_put — a jnp.asarray here would add a wasted H2D (and a
        # D2H back out in the DP wrapper) per batch
        out = infer(np.stack(canvases))
        dt = time.perf_counter() - t0
        for k, image_path in enumerate(group):
            dets = _extract(out, k, tfs[k], raws[k].shape, names)
            for name, _, score, (x0, y0, x1, y1) in dets:
                print(f"{os.path.basename(image_path)}: {name} "
                      f"{score:.3f} [{x0:.0f}, {y0:.0f}, {x1:.0f}, {y1:.0f}]")
            log.info("%s: %d detections (batch of %d in %.1f ms)",
                     image_path, len(dets), len(group), dt * 1e3)
            results.append((image_path, raws[k], dets))

    if out_path and len(image_paths) > 1:
        os.makedirs(out_path, exist_ok=True)
    for image_path, raw, dets in results:
        if out_path or show:
            img = _annotate(raw, dets)
            if out_path:
                dst = out_path if len(image_paths) == 1 else os.path.join(
                    out_path, os.path.basename(image_path))
                if cv2.imwrite(dst, img):
                    log.info("wrote %s", dst)
                else:
                    log.error("failed to write %s", dst)
            if show:  # pragma: no cover
                cv2.imshow("detect", img)
                cv2.waitKey(0)
    return results


def run_stream(cfg, weights_path, out_dir=None, lines=None, detector=None):
    """Serve detections over a stream of image paths (one per line).

    Weights load and the jit compile happen exactly once; every subsequent
    image pays only preprocess + device time — the serving-daemon answer
    to the reference's per-invocation graph build. Results are printed in
    the same ``name score [x0, y0, x1, y1]`` format, with a blank line
    terminating each image's block (machine-parseable), and optionally
    annotated into ``out_dir``.
    """
    import logging

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from yolojax.data.augment import letterbox_host

    log = logging.getLogger("detect")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    if lines is None:
        lines = sys.stdin
    n = 0

    def process(item):
        nonlocal n
        image_path, raw, canvas, tf = item
        out = det.infer(jnp.asarray(canvas[None]))
        dets = _extract(out, 0, tf, raw.shape, det.names)
        for name, _, score, (x0, y0, x1, y1) in dets:
            print(f"{os.path.basename(image_path)}: {name} "
                  f"{score:.3f} [{x0:.0f}, {y0:.0f}, {x1:.0f}, {y1:.0f}]")
        print(flush=True)  # blank line = end of this image's block
        if out_dir:
            # index prefix: distinct inputs sharing a basename must not
            # silently overwrite each other
            stem = os.path.splitext(os.path.basename(image_path))[0]
            dst = os.path.join(out_dir, f"{n:06d}_{stem}.png")
            if not cv2.imwrite(dst, _annotate(raw, dets)):
                log.error("failed to write %s", dst)
        n += 1

    def emit_error(image_path):
        print(f"{os.path.basename(image_path)}: ERROR unreadable")
        print(flush=True)

    det = LazyDetector(cfg, weights_path, process)
    if detector is not None:  # AOT artifact: graph + names already bound
        names, dim, infer, art_batch = detector
        if art_batch != 1:
            raise SystemExit(
                f"--stdin serves one image at a time; the artifact was "
                f"exported with batch {art_batch} (re-export with "
                f"--batch 1)")
        det.bind(names, dim, infer)
    if det.calib_target > 1 and not det.ready:
        # nothing prints until N paths arrive (or stdin closes): a
        # request/response client that waits for each block would hang
        log.warning(
            "int8 serving buffers the first %d frames for activation "
            "calibration before responding; set detect.calib_images=1 "
            "for interactive one-request-at-a-time clients",
            det.calib_target)

    for line in lines:
        image_path = line.strip()
        if not image_path:
            continue
        img = cv2.imread(image_path)
        if img is None:
            # queued behind any buffered frames: response order must
            # match input order even while calibration is buffering
            det.defer(lambda p=image_path: emit_error(p))
            continue
        raw = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        canvas, tf = letterbox_host(raw, det.dim,
                                    stretch=cfg.detect.stretch)
        det.add_frame(canvas, (image_path, raw, canvas, tf))
    det.flush()  # short stream: calibrate on what arrived
    log.info("stream done: %d images", n)
    return n


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", default="",
                        help="npz / .weights / orbax dir / TF1 ckpt prefix")
    parser.add_argument("--artifact", default="",
                        help="AOT serving artifact from cli/export.py "
                             "(replaces --weights and the [model] section: "
                             "graph, weights, names and thresholds are "
                             "baked in)")
    parser.add_argument("--image", action="append", default=[],
                        help="image path (repeatable)")
    parser.add_argument("--stdin", action="store_true",
                        help="serve: read image paths from stdin, one per "
                             "line; weights/compile are reused across images")
    parser.add_argument("--out", default="", help="annotated output path/dir")
    parser.add_argument("--show", action="store_true",
                        help="display the annotated image")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the detect batch over all local "
                             "devices (multi-image mode on a multi-chip "
                             "host)")
    args = parser.parse_args()
    cfg = setup(args)
    if args.stdin and (args.image or args.show):
        parser.error("--stdin is exclusive with --image/--show")
    if args.data_parallel and (args.stdin or args.artifact):
        parser.error("--data-parallel applies to batched --image mode "
                     "with --weights (artifacts own their placement; "
                     "--stdin serves one image at a time)")
    if bool(args.weights) == bool(args.artifact):
        parser.error("exactly one of --weights or --artifact is required")
    detector = None
    if args.artifact:
        detector, meta = load_artifact_detector(args.artifact)
        cfg = sync_artifact_cfg(cfg, meta)
    if args.stdin:
        run_stream(cfg, args.weights, args.out or None, detector=detector)
    elif args.image:
        run_detect(cfg, args.weights, args.image, args.out or None,
                   args.show, detector=detector,
                   data_parallel=args.data_parallel)
    else:
        parser.error("one of --image or --stdin is required")


if __name__ == "__main__":
    main()
