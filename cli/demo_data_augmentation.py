#!/usr/bin/env python3
"""Augmentation visual fixture — CLI-compatible with the reference's
``demo_data_augmentation.py`` (SURVEY.md §2): render a grid of augmented
samples (with GT boxes drawn) from the cached training data.

Usage: python3 cli/demo_data_augmentation.py -c config.ini [--out grid.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--out", default="augmentation_demo.png")
    parser.add_argument("--rows", type=int, default=3)
    parser.add_argument("--cols", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    cfg = setup(args)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolojax.data.augment import augment_batch
    from yolojax.utils.draw import draw_detection
    from yolojax.data.cache import load_cache
    from yolojax.data.loader import Loader, LoaderConfig

    n = args.rows * args.cols
    cache = load_cache(cfg.cache.basedir, "train")
    loader = Loader(cache, LoaderConfig(
        batch_size=n, canvas_dim=cfg.queue.canvas_dim,
        max_boxes=cfg.queue.max_boxes, seed=args.seed, num_threads=4,
        drop_remainder=False,
    ))
    images, boxes, classes, valid = next(iter(loader.epoch(0)))
    dim = cfg.model.dim
    imgs, bxs, vld = jax.device_get(augment_batch(
        jax.random.PRNGKey(args.seed), jnp.asarray(images),
        jnp.asarray(boxes), jnp.asarray(valid), dim, cfg.augment,
    ))

    cell = dim
    grid = np.zeros((args.rows * cell, args.cols * cell, 3), np.uint8)
    names = cfg.names()
    k = 0
    for r in range(args.rows):
        for c in range(args.cols):
            if k >= imgs.shape[0]:
                break
            img = (np.clip(imgs[k], 0, 1) * 255).astype(np.uint8).copy()
            for gi in range(bxs.shape[1]):
                if not vld[k, gi]:
                    continue
                cx, cy, w, h = bxs[k, gi]
                x0, y0 = int((cx - w / 2) * dim), int((cy - h / 2) * dim)
                x1, y1 = int((cx + w / 2) * dim), int((cy + h / 2) * dim)
                cls = int(classes[k, gi])
                draw_detection(img, x0, y0, x1, y1, names[cls], cls, rgb=True)
            grid[r * cell:(r + 1) * cell, c * cell:(c + 1) * cell] = img
            k += 1
    cv2.imwrite(args.out, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    print(f"wrote {args.out} ({args.rows}x{args.cols} augmented samples)")


if __name__ == "__main__":
    main()
