#!/usr/bin/env python3
"""Export an AOT serving artifact — the frozen-graph analogue, tpu-native.

Builds the exact serving stack ``cli/detect.py`` uses (weight load, BN
fold, optional stem fusion / int8 trunk, jitted forward + decode + top-K +
NMS) and serializes it with ``jax.export``: weights baked in as StableHLO
constants, class names / input dim / thresholds in the header. The
artifact then serves via ``cli/detect.py --artifact model.yjsa`` on any
host with a matching backend — no config [model] section, no weight
files, no Python model code. The reference rebuilt its TF graph and
restored a checkpoint on every invocation (SURVEY.md §3.3).

Usage: python3 cli/export.py -c config.ini --weights W --out model.yjsa
       [--batch N]                 fixed serving batch (default 1)
       [--calib-image IMG ...]     int8 calibration inputs (with
                                   detect.use_int8=1)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", required=True,
                        help="npz / .weights / orbax dir / TF1 ckpt prefix")
    parser.add_argument("--out", required=True,
                        help="artifact output path (suggest .yjsa; a "
                             "directory for --format savedmodel)")
    parser.add_argument("--format", choices=("artifact", "savedmodel",
                                             "tflite"),
                        default="artifact",
                        help="'artifact': jax.export StableHLO for the "
                             "current backend (default). 'savedmodel': TF "
                             "SavedModel via jax2tf (portable CPU graph) "
                             "for TF Serving hosts — the reference's own "
                             "deployment runtime. 'tflite': one .tflite "
                             "flatbuffer for edge hosts (TFLite "
                             "interpreter with the Flex delegate)")
    parser.add_argument("--tflite-mode", choices=("graph", "stablehlo"),
                        default="graph",
                        help="tflite lowering: 'graph' = plain TF ops -> "
                             "builtins + Flex (default, widest runtime "
                             "support); 'stablehlo' = native StableHLO "
                             "opset (smaller, needs a StableHLO-enabled "
                             "interpreter)")
    parser.add_argument("--batch", type=int, default=1,
                        help="fixed serving batch size baked into the "
                             "artifact (default 1; --stdin serving needs 1)")
    parser.add_argument("--calib-image", action="append", default=[],
                        help="calibration image for the int8 trunk "
                             "(repeatable; every listed image is used, "
                             "with detect.use_int8=1)")
    parser.add_argument("--allow-synthetic-calib", action="store_true",
                        help="permit int8 export without --calib-image "
                             "(activation scales calibrated on noise — "
                             "degraded accuracy baked into the artifact)")
    args = parser.parse_args()
    cfg = setup(args)
    if args.batch < 1:
        parser.error("--batch must be >= 1")
    if (cfg.detect.use_int8 and not args.calib_image
            and not args.allow_synthetic_calib):
        # unlike the live detect CLI (a per-run fallback), export freezes
        # the calibration into the shipped artifact forever
        parser.error(
            "int8 export requires --calib-image (repeatable) so the baked "
            "activation scales come from real data; pass "
            "--allow-synthetic-calib to override")

    import logging

    from cli.detect import build_serving
    from yolojax.serve import save_artifact

    log = logging.getLogger("export")

    calib = None
    if cfg.detect.use_int8 and args.calib_image:
        from cli.detect import _read_rgb
        from yolojax.data.augment import letterbox_host

        # the explicit --calib-image list wins over detect.calib_images
        # (that knob caps how many of a live CLI's *inputs* are reused for
        # calibration; here the user enumerated the set deliberately, and
        # silently truncating it would bake degraded scales into the
        # artifact forever)
        calib = []
        for p in args.calib_image:
            canvas, _ = letterbox_host(_read_rgb(p), cfg.model.dim,
                                       stretch=cfg.detect.stretch)
            calib.append(canvas)

    portable = args.format in ("savedmodel", "tflite")
    names, dim, infer_fn, params, bn_state = build_serving(
        cfg, args.weights, calib, portable=portable)
    header = {
        "names": list(names),
        "model": f"{cfg.model.model}/{cfg.model.inference}",
        "threshold": cfg.detect.threshold,
        "nms_iou": cfg.detect.nms_iou,
        "top_k": cfg.detect.top_k,
        "stretch": bool(cfg.detect.stretch),
        "int8": bool(cfg.detect.use_int8),
    }
    if args.format == "savedmodel":
        from yolojax.serve.savedmodel import save_savedmodel

        meta = save_savedmodel(args.out, infer_fn, params, bn_state,
                               batch=args.batch, dim=dim, meta=header)
        log.info("exported SavedModel %s: %s dim %d batch %d", args.out,
                 meta["model"], meta["dim"], meta["batch"])
        print(f"{args.out}: {meta['model']} dim={meta['dim']} "
              f"batch={meta['batch']} format=savedmodel platforms=cpu")
        return
    if args.format == "tflite":
        from yolojax.serve.tflite import save_tflite

        meta = save_tflite(args.out, infer_fn, params, bn_state,
                           batch=args.batch, dim=dim, meta=header,
                           mode=args.tflite_mode)
        log.info("exported TFLite %s: %s dim %d batch %d mode %s (%.1f MB)",
                 args.out, meta["model"], meta["dim"], meta["batch"],
                 meta["conversion"], meta["payload_bytes"] / 1e6)
        print(f"{args.out}: {meta['model']} dim={meta['dim']} "
              f"batch={meta['batch']} format=tflite "
              f"conversion={meta['conversion']} "
              f"{meta['payload_bytes'] / 1e6:.1f} MB")
        return
    meta = save_artifact(
        args.out, infer_fn, params, bn_state, batch=args.batch, dim=dim,
        meta=header,
    )
    log.info("exported %s: %s dim %d batch %d platforms %s (%.1f MB)",
             args.out, meta["model"], meta["dim"], meta["batch"],
             meta["platforms"], meta["payload_bytes"] / 1e6)
    print(f"{args.out}: {meta['model']} dim={meta['dim']} "
          f"batch={meta['batch']} platforms={','.join(meta['platforms'])} "
          f"{meta['payload_bytes'] / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
