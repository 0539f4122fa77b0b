#!/usr/bin/env python3
"""Darknet ``.weights`` -> yolojax params converter — CLI-compatible with
the reference's ``parse_darknet_yolo2.py`` (SURVEY.md §3.4): walk the binary
in network order, map conv (+BN) params, save a checkpoint. Also reads TF1
checkpoints (the reference's own Saver output) via --tf1.

Usage:
  python3 cli/parse_darknet.py -c config.ini yolo-voc.weights -o yolo-voc.npz
  python3 cli/parse_darknet.py -c config.ini --tf1 model.ckpt -o model.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--weights", default="",
                        help="path to Darknet .weights (or pass positionally)")
    parser.add_argument("--tf1", default="",
                        help="TF1 checkpoint prefix instead of .weights")
    parser.add_argument("--cfg", default="",
                        help="build the model from a Darknet .cfg file "
                             "instead of the [model] config section — "
                             "imports work for any conv/pool/route/reorg/"
                             "connected net")
    parser.add_argument("-o", "--output", required=True,
                        help="output .npz params path")
    args = parser.parse_args()
    # reference-style positional .weights path: pull non key=value
    # positionals out of the overrides list
    paths = [a for a in args.overrides if "=" not in a]
    args.overrides = [a for a in args.overrides if "=" in a]
    if paths and not args.weights and not args.tf1:
        args.weights = paths[0]
    cfg = setup(args)

    from yolojax.convert.store import save_params_npz

    if args.cfg:
        from yolojax.convert.cfg import model_from_cfg

        model = model_from_cfg(args.cfg)
    else:
        model = cfg.build_model()
    if args.tf1:
        from yolojax.convert.tf1 import load_tf1_checkpoint

        params, state = load_tf1_checkpoint(model, args.tf1,
                                            input_dim=cfg.model.dim)
        src = args.tf1
    elif args.weights:
        from yolojax.convert.darknet import load_darknet_weights

        params, state = load_darknet_weights(model, args.weights,
                                             input_dim=cfg.model.dim)
        src = args.weights
    else:
        raise SystemExit("pass a .weights file or --tf1 checkpoint")
    save_params_npz(args.output, params, state)
    n = sum(x.size for x in _leaves(params))
    print(f"converted {src} -> {args.output} "
          f"({n / 1e6:.1f}M params, {model.name}.{model.inference})")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
