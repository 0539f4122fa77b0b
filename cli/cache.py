#!/usr/bin/env python3
"""Offline dataset cache build — CLI-compatible with the reference's
``cache.py`` (SURVEY.md §3.1): parse VOC/COCO annotations per phase, write
unified caches + class-names list.

Usage: python3 cli/cache.py -c config.ini [overrides...]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    args = make_parser(__doc__).parse_args()
    cfg = setup(args)
    from yolojax.data.cache import build_cache

    names = cfg.names()
    built = 0
    for phase in ("train", "val", "test"):
        datasets = cfg.cache_datasets(phase)
        if not datasets:
            continue
        cache = build_cache(cfg.cache.basedir, phase, datasets, names)
        print(f"{phase}: {len(cache)} images, {len(cache.classes)} objects "
              f"-> {cfg.cache.basedir}/{phase}.npz")
        built += 1
    if not built:
        raise SystemExit(
            "no datasets configured; set [cache] train/val/test entries "
            "like 'voc:/data/VOCdevkit/VOC2007:trainval'"
        )


if __name__ == "__main__":
    main()
