"""Grain-backed input pipeline (alternative to yolojax.data.loader.Loader).

SURVEY.md §2's native-capability table named Grain as the TPU-native
replacement for the reference's TFRecord reader + queue runners +
``tf.train.shuffle_batch``. The default loader is the custom threaded /
C++-pool pipeline (yolojax/data/loader.py — measured in PERF.md); this
module provides the same batch contract on top of ``grain.python``'s
DataLoader for deployments that want Grain's multiprocess workers,
determinism guarantees, and checkpointable iterators:

  images (B, canvas, canvas, 3) f32 [0,1], boxes (B, G, 4) xywh,
  classes (B, G) i32, valid (B, G) bool

Select with ``[queue] loader = grain`` (cli/train.py) or construct
directly. Sharding for multi-host uses grain's ShardOptions — each process
reads a disjoint slice, matching the default loader's contract.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator

import numpy as np

from yolojax.data.cache import DatasetCache
from yolojax.data.loader import Loader, LoaderConfig

log = logging.getLogger(__name__)


class GrainLoader:
    """Grain DataLoader yielding the same fixed-shape batches as Loader."""

    def __init__(self, cache: DatasetCache, cfg: LoaderConfig,
                 *, worker_count: int = 0):
        import grain.python as gp

        self.cache = cache
        self.cfg = cfg
        # reuse the single-example decode path (incl. letterbox + GT
        # padding) from the default loader so both loaders are bit-identical
        # per example
        self._base = Loader(cache, dataclasses.replace(cfg, use_native=False))
        self._gp = gp
        self._worker_count = worker_count

    def __len__(self) -> int:
        return len(self._base)

    def epoch(self, epoch_idx: int = 0, *, shuffle: bool = True) -> Iterator:
        gp = self._gp
        cfg = self.cfg
        base = self._base

        class _Source:
            def __len__(self):
                return len(base.cache)

            def __getitem__(self, i):
                return int(i)

        class _Decode(gp.MapTransform):
            def map(self, i):
                return base._load_example(int(i))

        sampler = gp.IndexSampler(
            num_records=len(base.cache),
            shard_options=gp.ShardOptions(
                shard_index=cfg.shard_index, shard_count=cfg.shard_count,
                drop_remainder=cfg.drop_remainder,
            ),
            shuffle=shuffle,
            num_epochs=1,
            seed=cfg.seed + epoch_idx,  # deterministic per (seed, epoch)
        )
        loader = gp.DataLoader(
            data_source=_Source(),
            sampler=sampler,
            operations=[
                _Decode(),
                gp.Batch(batch_size=cfg.batch_size,
                         drop_remainder=cfg.drop_remainder),
            ],
            worker_count=self._worker_count,
        )
        for imgs, boxes, cls, valid in loader:
            yield (np.asarray(imgs), np.asarray(boxes),
                   np.asarray(cls), np.asarray(valid))

    def __iter__(self):
        return self.epoch(0)


def make_loader(cache: DatasetCache, cfg: LoaderConfig, kind: str = "native"):
    """Loader factory: ``native`` (threaded + C++ pool) or ``grain``."""
    if kind == "grain":
        return GrainLoader(cache, cfg)
    if kind in ("native", "thread", ""):
        return Loader(cache, cfg)
    raise ValueError(f"unknown loader kind {kind!r} (native|grain)")
