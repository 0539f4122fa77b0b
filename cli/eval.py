#!/usr/bin/env python3
"""Batched validation: device inference + on-device NMS -> VOC mAP
(BASELINE config 2). The reference had no eval CLI (quality checked by eye,
SURVEY.md §4); this implements the protocol its mAP targets are scored by.

Usage: python3 cli/eval.py -c config.ini --weights W [--phase test]
       ... --artifact model.yjsa   # score an AOT artifact (cli/export.py)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", default="")
    parser.add_argument("--artifact", default="",
                        help="score an AOT serving artifact (cli/export.py)"
                             " instead of live weights: the baked graph — "
                             "its thresholds, top-K, NMS, precision — is "
                             "what gets mAP'd, exactly as a deployment "
                             "host would run it (detect.* knobs and "
                             "eval.data_parallel don't apply)")
    parser.add_argument("--phase", default="test")
    parser.add_argument("--max-batches", type=int, default=0)
    parser.add_argument("--coco", action="store_true",
                        help="also report COCO-style AP@[.50:.95], AP75 and "
                             "small/medium/large APs (BASELINE config 5)")
    parser.add_argument("--dump", default="",
                        help="write the eval set + detections as one "
                             "COCO-format JSON ({'gt': ..., 'detections': "
                             "...}) for external re-scoring with "
                             "pycocotools")
    args = parser.parse_args()
    cfg = setup(args)
    if bool(args.weights) == bool(args.artifact):
        parser.error("exactly one of --weights or --artifact is required")

    import json

    import jax
    import jax.numpy as jnp

    from yolojax.parallel.distributed import maybe_initialize

    multi_process = maybe_initialize(
        cfg.train.coordinator, cfg.train.num_processes, cfg.train.process_id
    )

    from yolojax.data.cache import load_cache
    from yolojax.eval.evaluator import evaluate_model
    from yolojax.utils.restore import load_weights

    model = cfg.build_model() if args.weights else None
    eval_dist = cfg.eval.distributed and multi_process and not args.artifact

    def _sync_done():
        # Park every process on a barrier until the primary's (possibly
        # long) eval finishes: an early jax.distributed shutdown on the
        # non-primaries can trip the coordination-service heartbeat /
        # shutdown-barrier timeout and abort the primary mid-eval.
        from jax.experimental import multihost_utils as mhu

        mhu.sync_global_devices("yolojax_eval_done")

    if multi_process and not eval_dist and jax.process_index() != 0:
        _sync_done()
        return  # non-distributed eval has no collectives; primary-only
    try:
        cache = load_cache(cfg.cache.basedir, args.phase)
        # kwargs shared VERBATIM by both branches: a drift between them
        # would silently skew the live-vs-artifact metric parity the
        # --artifact mode exists to prove (tests/e2e test_33)
        shared = dict(
            map_iou=cfg.eval.map_iou,
            max_batches=args.max_batches or None,
            max_detections=cfg.eval.max_detections,
            coco=args.coco,
            dump_path=args.dump or None,
        )
        if args.artifact:
            import logging

            from cli.detect import load_artifact_detector, sync_artifact_cfg
            from yolojax.eval.evaluator import EVAL_SCORE_THRESH

            (names, dim, infer_art, fixed_batch), meta = (
                load_artifact_detector(args.artifact))
            cfg = sync_artifact_cfg(cfg, meta)
            baked = float(meta.get("threshold", EVAL_SCORE_THRESH))
            if baked > EVAL_SCORE_THRESH:
                # PR curves need the low-confidence tail; a serving-grade
                # baked threshold truncates it, and the resulting mAP is
                # NOT comparable to a --weights eval (which scores at
                # EVAL_SCORE_THRESH) — say so instead of letting the gap
                # read as a serialization regression
                logging.getLogger("eval").warning(
                    "artifact bakes detect.threshold=%g > the eval "
                    "protocol's %g: mAP/AR will undercount the PR tail; "
                    "export with detect.threshold=%g for metrics "
                    "comparable to --weights eval",
                    baked, EVAL_SCORE_THRESH, EVAL_SCORE_THRESH)
            metrics = evaluate_model(
                None, None, None, cache,
                input_dim=dim,
                batch_size=fixed_batch,
                stretch=cfg.detect.stretch,
                class_names=names,
                infer_override=infer_art,
                fixed_batch=fixed_batch,
                num_classes=len(names),
                **shared,
            )
        else:
            names = cfg.names()
            params, bn_state = load_weights(args.weights, model,
                                            cfg.model.dim,
                                            use_ema=cfg.detect.use_ema)
            params = jax.tree_util.tree_map(jnp.asarray, params)
            bn_state = jax.tree_util.tree_map(jnp.asarray, bn_state)
            metrics = evaluate_model(
                model, params, bn_state, cache,
                input_dim=cfg.model.dim,
                batch_size=cfg.eval.batch_size,
                nms_iou=cfg.detect.nms_iou,
                top_k=cfg.detect.top_k,
                use_pallas=cfg.detect.use_pallas,
                candidates=cfg.detect.candidates,
                fuse_stem_impl=cfg.detect.fuse_stem,
                compute_dtype=jnp.float32 if jax.default_backend() == "cpu"
                else jnp.bfloat16,
                stretch=cfg.detect.stretch,
                int8=cfg.detect.use_int8,
                calib_images=cfg.detect.calib_images,
                calib_percentile=cfg.detect.calib_percentile,
                quant_bits=cfg.detect.quant_bits,
                data_parallel=cfg.eval.data_parallel_flag(),
                distributed=eval_dist,
                class_names=names,
                **shared,
            )
    finally:
        if multi_process and not eval_dist:
            # release the parked non-primaries even when the primary fails
            # early (bad --weights, missing cache): a skipped barrier would
            # leave them hung until the heartbeat timeout kills the job
            _sync_done()
    if multi_process and jax.process_index() != 0:
        return  # distributed metrics are identical everywhere; primary prints
    for c, name in enumerate(names):
        if f"ap_{c}" in metrics:
            print(f"AP {name:>16s}: {metrics[f'ap_{c}']:.4f}")
    print(f"mAP@{cfg.eval.map_iou}: {metrics['map']:.4f} "
          f"({metrics['num_images']} images)")
    if args.coco:
        print(f"COCO AP@[.50:.95]: {metrics['coco_map']:.4f}  "
              f"AP50: {metrics.get('ap50', float('nan')):.4f}  "
              f"AP75: {metrics.get('ap75', float('nan')):.4f}  "
              f"S/M/L: {metrics.get('ap_small', float('nan')):.3f}/"
              f"{metrics.get('ap_medium', float('nan')):.3f}/"
              f"{metrics.get('ap_large', float('nan')):.3f}")
        print(f"COCO AR@1/10/100: {metrics.get('ar_1', float('nan')):.4f}/"
              f"{metrics.get('ar_10', float('nan')):.4f}/"
              f"{metrics.get('ar_100', float('nan')):.4f}  "
              f"AR S/M/L: {metrics.get('ar_small', float('nan')):.3f}/"
              f"{metrics.get('ar_medium', float('nan')):.3f}/"
              f"{metrics.get('ar_large', float('nan')):.3f}")
    import math

    # strict JSON: NaN (empty size bin) -> null
    print(json.dumps({
        k: (None if isinstance(v, float) and math.isnan(v) else v)
        for k, v in metrics.items()
    }))


if __name__ == "__main__":
    main()
