#!/usr/bin/env python3
"""Quantization-aware fine-tune (QAT): repair the int8 serving path's
rounding loss. Loads trained weights, folds BN, calibrates activation
scales on real train batches, fine-tunes a few hundred steps with
fake-quant straight-through estimators (yolojax/quantize/qat.py), and
writes a standard identity-BN ``.npz`` every existing surface consumes:

    python3 cli/qat.py -c config.ini --weights logdir/yolo2_tiny \\
        --output qat.npz --steps 200
    python3 cli/eval.py -c config.ini --weights qat.npz detect.use_int8=1
    python3 cli/detect.py -c config.ini --weights qat.npz detect.use_int8=1

The reference had no quantization (SURVEY.md §2); this hardens the
TPU-native int8 extension PERF.md validates as the >5000 img/s serving
configuration.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", required=True,
                        help="trained weights (Orbax logdir / .npz / "
                             ".weights / TF1 ckpt)")
    parser.add_argument("--output", required=True,
                        help="output .npz param store (identity-BN layout; "
                             "load with --weights anywhere)")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--grad-clip", type=float, default=1.0)
    parser.add_argument("--calib-batches", type=int, default=1,
                        help="loader batches for activation calibration "
                             "(detect.calib_percentile applies)")
    parser.add_argument("--bits", type=int, default=0,
                        help="quant code width to fine-tune under "
                             "(default: detect.quant_bits; <8 coarsens "
                             "the grid — deploy with the same "
                             "detect.quant_bits)")
    parser.add_argument("--no-augment", action="store_true",
                        help="fine-tune on plain resized canvases instead "
                             "of the augmentation pipeline")
    parser.add_argument("--distill", action="store_true",
                        help="minimize MSE to the frozen f32 teacher's "
                             "head instead of the detection loss — dense "
                             "per-activation signal; the better objective "
                             "on deep nets at low bits (PERF.md round 5)")
    args = parser.parse_args()
    cfg = setup(args)

    import itertools
    import logging

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolojax.convert.fold import fold_bn
    from yolojax.convert.store import save_params_npz
    from yolojax.data.cache import load_cache
    from yolojax.data.grain_loader import make_loader
    from yolojax.quantize.ptq import calibrate
    from yolojax.quantize.qat import (
        QatConfig,
        QatState,
        make_qat_optimizer,
        make_qat_step,
        reembed_folded,
    )
    from yolojax.utils.restore import load_weights

    log = logging.getLogger("qat")
    model = cfg.build_model()
    dim = cfg.model.dim

    cache = load_cache(cfg.cache.basedir, "train")
    loader = make_loader(cache, cfg.queue, cfg.queue.loader)
    if len(loader) == 0:
        raise SystemExit(
            f"cache has {len(cache)} images < batch_size "
            f"{cfg.queue.batch_size}; no full batch per epoch"
        )
    log.info("QAT data: %d images, %d classes", len(cache),
             model.num_classes)

    params, bn_state = load_weights(args.weights, model, dim,
                                    use_ema=cfg.detect.use_ema)
    folded_model, folded_params, _ = fold_bn(model, params, bn_state)
    folded_params = jax.tree_util.tree_map(jnp.asarray, folded_params)

    def batches():
        for epoch in itertools.count():
            yield from loader.epoch(epoch)

    batch_iter = batches()

    qcfg = QatConfig(steps=args.steps, learning_rate=args.lr,
                     grad_clip_norm=args.grad_clip,
                     calib_batches=args.calib_batches)

    # activation calibration on real train images at the deploy dim, with
    # the same percentile knob the PTQ export uses — scales are frozen for
    # the fine-tune and re-derived identically at deployment
    calib_parts = []
    for _ in range(max(qcfg.calib_batches, 1)):
        imgs = jnp.asarray(next(batch_iter)[0], jnp.float32)
        if imgs.shape[1] != dim:
            imgs = jax.image.resize(
                imgs, (imgs.shape[0], dim, dim, 3), "linear")
        calib_parts.append(imgs)
    calib = jnp.concatenate(calib_parts)
    bits = args.bits or cfg.detect.quant_bits
    if not 2 <= bits <= 8:
        raise SystemExit(f"--bits must be in [2, 8], got {bits}")
    qmax = 2 ** (bits - 1) - 1
    in_scale, act_scales = calibrate(
        folded_model, folded_params, calib,
        percentile=cfg.detect.calib_percentile, qmax=qmax)
    log.info("calibrated on %d images (percentile %.4g, %d-bit grid)",
             calib.shape[0], cfg.detect.calib_percentile, bits)

    tx = make_qat_optimizer(qcfg)
    teacher_params = None
    if args.distill:
        from yolojax.quantize.qat import make_qat_distill_step

        # frozen f32 teacher = the pre-fine-tune folded weights
        teacher_params = jax.tree_util.tree_map(
            jnp.asarray, jax.device_get(folded_params))
        step_fn = make_qat_distill_step(
            folded_model, tx, in_scale, act_scales,
            aug_cfg=cfg.augment, augment=not args.no_augment, qmax=qmax,
        )
    else:
        step_fn = make_qat_step(
            folded_model, tx, in_scale, act_scales,
            loss_cfg=cfg.loss_config(), aug_cfg=cfg.augment,
            augment=not args.no_augment, qmax=qmax,
        )
    st = QatState(jnp.zeros((), jnp.int32), folded_params,
                  tx.init(folded_params))
    rng = jax.random.PRNGKey(cfg.train.seed + 17)

    first = last = None
    for step_i in range(qcfg.steps):
        host_batch = next(batch_iter)
        batch = tuple(jnp.asarray(t) for t in host_batch)
        if teacher_params is not None:
            st, m = step_fn(st, batch, teacher_params, rng, dim=dim)
        else:
            st, m = step_fn(st, batch, rng, dim=dim)
        # finiteness is checked EVERY step (a short repair pass affords
        # the per-step sync): a divergence between summary points must
        # never reach the output npz as NaN weights
        total = float(jax.device_get(m["total"]))
        if not np.isfinite(total):
            raise SystemExit(
                f"non-finite QAT loss at step {step_i + 1}; lower --lr")
        if first is None:
            first = total
        last = total
        if step_i == 0 or (step_i + 1) % cfg.train.summary_steps == 0:
            log.info("qat step %d/%d loss %.4f", step_i + 1, qcfg.steps,
                     total)

    re_params, re_state = reembed_folded(model,
                                         jax.device_get(st.params))
    save_params_npz(args.output, re_params, re_state)
    log.info("QAT done (loss %.4f -> %.4f); wrote %s — use it with "
             "detect.use_int8=1 (same calib percentile)", first or 0.0,
             last or 0.0, args.output)


if __name__ == "__main__":
    main()
