#!/usr/bin/env python3
"""Camera detection loop — CLI-compatible with the reference's
``detect_camera.py`` (SURVEY.md §2): same detect path as cli/detect.py in an
OpenCV capture loop.

Usage: python3 cli/detect_camera.py -c config.ini --weights W [--camera 0]
       ... --artifact model.yjsa   # serve an AOT artifact (cli/export.py)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", default="")
    parser.add_argument("--artifact", default="",
                        help="AOT serving artifact from cli/export.py "
                             "(replaces --weights; batch-1 export)")
    parser.add_argument("--camera", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=0,
                        help="stop after N frames (0 = until q pressed)")
    parser.add_argument("--video", default="",
                        help="read from a video file instead of a camera")
    parser.add_argument("--out-dir", default="",
                        help="write annotated frames here instead of "
                             "displaying (headless mode)")
    args = parser.parse_args()
    cfg = setup(args)

    import time

    import cv2
    import jax.numpy as jnp

    from cli.detect import (LazyDetector, _extract, load_artifact_detector,
                            sync_artifact_cfg)
    from yolojax.data.augment import letterbox_host
    from yolojax.utils.draw import draw_detection

    if bool(args.weights) == bool(args.artifact):
        parser.error("exactly one of --weights or --artifact is required")
    frames = 0
    stop = False
    t0 = time.perf_counter()

    def process(item):
        nonlocal frames, stop
        frame, canvas, tf = item
        out = det.infer(jnp.asarray(canvas[None]))
        for name, cls, score, (x0, y0, x1, y1) in _extract(
            out, 0, tf, frame.shape, det.names
        ):
            draw_detection(frame, int(x0), int(y0), int(x1), int(y1),
                           f"{name} {score:.2f}", cls)
        frames += 1
        fps = frames / (time.perf_counter() - t0)
        cv2.putText(frame, f"{fps:.1f} fps", (8, 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 255), 2)
        if args.out_dir:
            cv2.imwrite(os.path.join(args.out_dir,
                                     f"frame_{frames:06d}.png"), frame)
        else:  # pragma: no cover (needs a display)
            cv2.imshow("yolojax", frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                stop = True

    # Same serving stack as cli/detect.py (fold + optional stem fusion /
    # int8 trunk, one jitted graph); int8 buffers the first calib_images
    # frames for activation calibration, like the batched detect path.
    det = LazyDetector(cfg, args.weights, process)
    if args.artifact:  # AOT artifact: graph + names bound before capture
        (names, dim, infer, art_batch), art_meta = load_artifact_detector(
            args.artifact)
        cfg = sync_artifact_cfg(cfg, art_meta)
        if art_batch != 1:
            raise SystemExit(
                f"camera serving is frame-at-a-time; the artifact was "
                f"exported with batch {art_batch} (re-export with "
                f"--batch 1)")
        det.bind(names, dim, infer)

    src = args.video if args.video else args.camera
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise SystemExit(f"cannot open capture source {src!r}")
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    try:
        while not stop:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            canvas, tf = letterbox_host(rgb, det.dim,
                                        stretch=cfg.detect.stretch)
            det.add_frame(canvas, (frame, canvas, tf))
            if args.max_frames and frames + det.pending_frames >= \
                    args.max_frames:
                break
        det.flush()  # short capture: calibrate on what arrived
    finally:
        cap.release()
        if not args.out_dir:  # pragma: no cover
            cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
