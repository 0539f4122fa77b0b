#!/usr/bin/env python3
"""Single-image detection — CLI-compatible with the reference's ``detect.py``
(SURVEY.md §3.3): load checkpoint, preprocess, forward pass, decode boxes,
confidence threshold, per-class NMS, draw.

TPU-native shape: one jitted fn runs forward + decode + top-K + batched NMS
on device (Pallas kernel on TPU); only kept boxes return to the host.

Usage: python3 cli/detect.py -c config.ini --weights W --image IMG [--out OUT]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def run_detect(cfg, weights_path, image_paths, out_path=None, show=False):
    import time
    import logging

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolojax.data.augment import letterbox_host
    from yolojax.eval.evaluator import make_infer_fn
    from yolojax.utils.restore import load_weights

    log = logging.getLogger("detect")
    model = cfg.build_model()
    names = cfg.names()
    dim = cfg.model.dim
    params, bn_state = load_weights(weights_path, model, dim)
    from yolojax.convert.fold import fold_bn

    model, params, bn_state = fold_bn(model, params, bn_state)  # inference
    if not cfg.detect.use_int8:
        from yolojax.nn.stem import fuse_stem

        model, params, bn_state = fuse_stem(model, params, bn_state,
                                            impl=cfg.detect.fuse_stem)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    bn_state = jax.tree_util.tree_map(jnp.asarray, bn_state)

    import cv2

    qm = None
    if cfg.detect.use_int8:
        from yolojax.quantize.ptq import quantize_model

        # Calibrate activation scales on the actual inputs (letterboxed the
        # same way the forward pass will see them) — real data, not noise.
        calib_imgs = []
        for p in image_paths[:8]:
            raw = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            canvas, _ = letterbox_host(raw, dim, stretch=cfg.detect.stretch)
            calib_imgs.append(canvas)
        calib = jnp.asarray(np.stack(calib_imgs))
        qm = quantize_model(model, jax.device_get(params), calib)
        log.info("int8 conv trunk enabled (calibrated on %d input images)",
                 len(calib_imgs))
    infer = make_infer_fn(
        model, score_thresh=cfg.detect.threshold, iou_thresh=cfg.detect.nms_iou,
        top_k=cfg.detect.top_k, use_pallas=cfg.detect.use_pallas,
        candidates=cfg.detect.candidates,
        compute_dtype=jnp.float32 if jax.default_backend() == "cpu"
        else jnp.bfloat16, qm=qm,
    )

    # Batched path: pad the image list up to a fixed batch so many-image
    # detects compile once and ride the chip's batched throughput (the
    # reference looped sess.run per image).
    batch = 1 if len(image_paths) == 1 else min(
        max(cfg.eval.batch_size, 1), 32
    )
    results = []
    for start in range(0, len(image_paths), batch):
        group = image_paths[start : start + batch]
        raws, canvases, tfs = [], [], []
        for image_path in group:
            raw = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
            canvas, tf = letterbox_host(raw, dim, stretch=cfg.detect.stretch)
            raws.append(raw)
            canvases.append(canvas)
            tfs.append(tf)
        while len(canvases) < batch:  # pad to the compiled batch size
            canvases.append(np.full((dim, dim, 3), 0.5, np.float32))
        t0 = time.perf_counter()
        out = jax.device_get(
            infer(params, bn_state, jnp.asarray(np.stack(canvases)))
        )
        dt = time.perf_counter() - t0
        for k, image_path in enumerate(group):
            raw = raws[k]
            sx, sy, px, py = tfs[k]
            dets = []
            for d in np.where(out["keep"][k])[0]:
                y0, x0, y1, x1 = out["boxes"][k, d]
                # un-letterbox to original image coords
                x0 = (x0 - px) / sx * raw.shape[1]
                x1 = (x1 - px) / sx * raw.shape[1]
                y0 = (y0 - py) / sy * raw.shape[0]
                y1 = (y1 - py) / sy * raw.shape[0]
                cls = int(out["classes"][k, d])
                score = float(out["scores"][k, d])
                dets.append((names[cls], cls, score, (x0, y0, x1, y1)))
                print(f"{os.path.basename(image_path)}: {names[cls]} "
                      f"{score:.3f} [{x0:.0f}, {y0:.0f}, {x1:.0f}, {y1:.0f}]")
            log.info("%s: %d detections (batch of %d in %.1f ms)",
                     image_path, len(dets), len(group), dt * 1e3)
            results.append((image_path, raw, dets))

    for image_path, raw, dets in results:
        if out_path or show:
            from yolojax.utils.draw import draw_detection

            img = cv2.cvtColor(raw.copy(), cv2.COLOR_RGB2BGR)
            for name, cls, score, (x0, y0, x1, y1) in dets:
                draw_detection(img, int(x0), int(y0), int(x1), int(y1),
                               f"{name} {score:.2f}", cls)
            if out_path:
                dst = out_path if len(image_paths) == 1 else os.path.join(
                    out_path, os.path.basename(image_path))
                cv2.imwrite(dst, img)
                log.info("wrote %s", dst)
            if show:  # pragma: no cover
                cv2.imshow("detect", img)
                cv2.waitKey(0)
    return results


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", required=True,
                        help="npz / .weights / orbax dir / TF1 ckpt prefix")
    parser.add_argument("--image", required=True, action="append",
                        help="image path (repeatable)")
    parser.add_argument("--out", default="", help="annotated output path/dir")
    parser.add_argument("--show", action="store_true",
                        help="display the annotated image")
    args = parser.parse_args()
    cfg = setup(args)
    run_detect(cfg, args.weights, args.image, args.out or None, args.show)


if __name__ == "__main__":
    main()
