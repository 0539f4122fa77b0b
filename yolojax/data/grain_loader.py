"""Grain-backed input pipeline (alternative to yolojax.data.loader.Loader).

SURVEY.md §2's native-capability table named Grain as the TPU-native
replacement for the reference's TFRecord reader + queue runners +
``tf.train.shuffle_batch``. The default loader is the custom threaded /
C++-pool pipeline (yolojax/data/loader.py — measured in PERF.md); this
module provides the same batch contract on top of ``grain.python``'s
DataLoader for deployments that want Grain's multiprocess workers,
determinism guarantees, and checkpointable iterators (``stream()`` exposes
``get_state``/``set_state`` for exact mid-epoch resume — wired into
cli/train.py's checkpoint cycle):

  images (B, canvas, canvas, 3) f32 [0,1], boxes (B, G, 4) xywh,
  classes (B, G) i32, valid (B, G) bool

Select with ``[queue] loader = grain`` (cli/train.py) or construct
directly; ``[queue] grain_workers = N`` spawns N Grain worker processes
(0 = decode inline in the training process — the right default on small
hosts; set it near the host core count for production decode throughput).
Sharding for multi-host uses grain's ShardOptions — each process reads a
disjoint slice, matching the default loader's contract.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator

import numpy as np

from yolojax.data.cache import DatasetCache
from yolojax.data.loader import Loader, LoaderConfig

log = logging.getLogger(__name__)

try:  # environment-gated: grain is baked in here, but stay importable without
    import grain.python as _gp
except Exception:  # pragma: no cover
    _gp = None


class _IndexSource:
    """Trivial record source: record i = index i (decode happens in the
    MapTransform). Module-level so Grain worker processes can pickle it."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i):
        return int(i)

    def __repr__(self):  # stable: grain validates repr() across restores
        return f"_IndexSource(n={self._n})"


if _gp is not None:

    class _DecodeExample(_gp.MapTransform):
        """Decode + letterbox + GT-pad one example, bit-identical to the
        default loader (reuses Loader._load_example). Holds only
        (cache, cfg) so it pickles into spawned Grain workers; the Loader
        is built lazily per process (native pool off: Grain owns the
        process parallelism)."""

        def __init__(self, cache: DatasetCache, cfg: LoaderConfig):
            self._cache = cache
            self._cfg = dataclasses.replace(cfg, use_native=False)
            self._loader = None

        def __getstate__(self):
            return {"cache": self._cache, "cfg": self._cfg}

        def __setstate__(self, state):
            self._cache = state["cache"]
            self._cfg = state["cfg"]
            self._loader = None

        def map(self, i):
            if self._loader is None:
                self._loader = Loader(self._cache, self._cfg)
            return self._loader._load_example(int(i))


class GrainLoader:
    """Grain DataLoader yielding the same fixed-shape batches as Loader."""

    def __init__(self, cache: DatasetCache, cfg: LoaderConfig,
                 *, worker_count: int | None = None):
        if _gp is None:  # pragma: no cover
            raise RuntimeError("grain is not installed; use loader=native")
        self.cache = cache
        self.cfg = cfg
        self._decode = _DecodeExample(cache, cfg)
        self._worker_count = (cfg.grain_workers if worker_count is None
                              else worker_count)
        if self._worker_count:
            log.info("grain loader: %d worker processes", self._worker_count)

    def __len__(self) -> int:
        n = len(self.cache)
        if self.cfg.shard_count > 1:
            if self.cfg.drop_remainder:
                # grain's even_split drops the tail: every shard n//count
                n = n // self.cfg.shard_count
            else:
                # sizes differ by at most one (shard i gets the +1 while
                # i < n % count — same counts as a strided split)
                n = len(range(self.cfg.shard_index, n, self.cfg.shard_count))
        b = self.cfg.batch_size
        return n // b if self.cfg.drop_remainder else (n + b - 1) // b

    def _make_dataloader(self, *, shuffle: bool, num_epochs, seed: int):
        """One construction path for epoch() and stream(): the two
        iteration styles must never diverge in sharding/decode/batching."""
        gp = _gp
        cfg = self.cfg
        sampler = gp.IndexSampler(
            num_records=len(self.cache),
            shard_options=gp.ShardOptions(
                shard_index=cfg.shard_index, shard_count=cfg.shard_count,
                drop_remainder=cfg.drop_remainder,
            ),
            shuffle=shuffle,
            num_epochs=num_epochs,
            seed=seed,
        )
        return gp.DataLoader(
            data_source=_IndexSource(len(self.cache)),
            sampler=sampler,
            operations=[
                self._decode,
                gp.Batch(batch_size=cfg.batch_size,
                         drop_remainder=cfg.drop_remainder),
            ],
            worker_count=self._worker_count,
        )

    def epoch(self, epoch_idx: int = 0, *, shuffle: bool = True) -> Iterator:
        loader = self._make_dataloader(
            shuffle=shuffle, num_epochs=1,
            seed=self.cfg.seed + epoch_idx,  # deterministic per (seed, epoch)
        )
        for imgs, boxes, cls, valid in loader:
            yield (np.asarray(imgs), np.asarray(boxes),
                   np.asarray(cls), np.asarray(valid))

    def __iter__(self):
        return self.epoch(0)

    def stream(self, *, shuffle: bool = True) -> "CheckpointableStream":
        """Infinite checkpointable batch stream (grain-native).

        Unlike :meth:`epoch`, the sampler repeats forever
        (``num_epochs=None``: grain reshuffles per epoch from the seed) and
        the returned stream exposes grain's iterator checkpointing —
        ``get_state() -> bytes`` / ``set_state(bytes)`` — so training can
        resume EXACTLY mid-epoch instead of restarting at an epoch
        boundary. cli/train.py saves this state next to each Orbax
        checkpoint when ``[queue] loader = grain``.
        """
        loader = self._make_dataloader(shuffle=shuffle, num_epochs=None,
                                       seed=self.cfg.seed)
        return CheckpointableStream(loader)


class CheckpointableStream:
    """Iterator over (images, boxes, classes, valid) numpy batches with
    grain's save/restore state surface."""

    def __init__(self, loader):
        self._it = iter(loader)  # PyGrainDatasetIterator

    def __iter__(self):
        return self

    def __next__(self):
        imgs, boxes, cls, valid = next(self._it)
        return (np.asarray(imgs), np.asarray(boxes),
                np.asarray(cls), np.asarray(valid))

    def get_state(self) -> bytes:
        return self._it.get_state()

    def set_state(self, state: bytes) -> None:
        self._it.set_state(state)


def make_loader(cache: DatasetCache, cfg: LoaderConfig, kind: str = "native"):
    """Loader factory: ``native`` (threaded + C++ pool) or ``grain``."""
    if kind == "grain":
        return GrainLoader(cache, cfg)
    if kind in ("native", "thread", ""):
        return Loader(cache, cfg)
    raise ValueError(f"unknown loader kind {kind!r} (native|grain)")
