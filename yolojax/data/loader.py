"""Host-side input pipeline: threaded JPEG decode -> letterboxed canvases.

TPU-native replacement for the reference's TFRecord reader + queue runners +
``tf.train.shuffle_batch`` (SURVEY.md §2 native-capability table). The host
does the minimum — file read, JPEG decode, one aspect-preserving resize to a
fixed canvas — on a thread pool with a bounded prefetch queue; all random
augmentation runs on-device (yolojax/data/augment.py). An optional C++
decode pool (yolojax/native) can replace the Python workers; the Python
path is always available as fallback.

Batches are fixed-shape: images (B, canvas, canvas, 3) float32 in [0,1],
boxes (B, G, 4) normalized xywh on the canvas, classes (B, G) int32,
valid (B, G) bool. Epoch shuffling is seeded -> reproducible.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from typing import Iterator

import numpy as np

from yolojax.data.augment import letterbox_host
from yolojax.data.cache import DatasetCache

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class LoaderConfig:
    batch_size: int = 32
    canvas_dim: int = 448   # host letterbox target; device resizes further
    max_boxes: int = 50     # GT padding (static shapes for jit)
    num_threads: int = 8    # reference exposed [queue] threads similarly
    prefetch: int = 4       # batches in flight
    seed: int = 0
    stretch: bool = False   # plain-resize instead of letterbox (see §3.3 [L])
    drop_remainder: bool = True
    use_native: bool = True  # C++ decode pool when libyolodata.so is built
    loader: str = "native"   # native (threads + C++ pool) | grain
    grain_workers: int = 0   # grain worker PROCESSES (0 = decode inline)
    # multi-host: each process loads a disjoint slice of every epoch
    shard_index: int = 0
    shard_count: int = 1


class Loader:
    """Iterable over one phase of a :class:`DatasetCache`."""

    def __init__(self, cache: DatasetCache, cfg: LoaderConfig):
        self.cache = cache
        self.cfg = cfg
        self._decoder = _default_decoder
        self._native = None
        if cfg.use_native:
            try:
                from yolojax.data.native import NativeDecodePool, available

                if available():
                    self._native = NativeDecodePool(cfg.num_threads)
                    log.info("using native decode pool (%d threads)",
                             cfg.num_threads)
            except Exception as e:  # pragma: no cover
                log.info("native decode pool unavailable: %s", e)

    def __len__(self) -> int:
        n = len(self.cache)
        if self.cfg.shard_count > 1:
            # exact per-shard size (shards differ by at most one image)
            n = len(range(self.cfg.shard_index, n, self.cfg.shard_count))
        b = self.cfg.batch_size
        return n // b if self.cfg.drop_remainder else (n + b - 1) // b

    # -- single example ----------------------------------------------------
    def _load_example(self, i: int):
        path, boxes, classes = self.cache.example(i)
        img = self._decoder(str(path))
        canvas, (sx, sy, px, py) = letterbox_host(
            img, self.cfg.canvas_dim, stretch=self.cfg.stretch
        )
        g = self.cfg.max_boxes
        out_boxes = np.zeros((g, 4), np.float32)
        out_cls = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        k = min(len(boxes), g)
        if k:
            b = boxes[:k].copy()
            b[:, 0] = b[:, 0] * sx + px
            b[:, 1] = b[:, 1] * sy + py
            b[:, 2] = b[:, 2] * sx
            b[:, 3] = b[:, 3] * sy
            out_boxes[:k] = b
            out_cls[:k] = classes[:k]
            valid[:k] = True
        return canvas, out_boxes, out_cls, valid

    def _gt_arrays(self, i: int, sx, sy, px, py):
        """Padded GT arrays for example i, transformed to canvas coords."""
        _, boxes, classes = self.cache.example(i)
        g = self.cfg.max_boxes
        out_boxes = np.zeros((g, 4), np.float32)
        out_cls = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        k = min(len(boxes), g)
        if k:
            b = boxes[:k].copy()
            b[:, 0] = b[:, 0] * sx + px
            b[:, 1] = b[:, 1] * sy + py
            b[:, 2] = b[:, 2] * sx
            b[:, 3] = b[:, 3] * sy
            out_boxes[:k] = b
            out_cls[:k] = classes[:k]
            valid[:k] = True
        return out_boxes, out_cls, valid

    def _load_batch(self, idxs):
        """Build one batch; uses the C++ decode pool when available."""
        if self._native is not None:
            paths = [str(self.cache.paths[int(i)]) for i in idxs]
            images, transforms, status = self._native.load_batch(
                paths, self.cfg.canvas_dim, stretch=self.cfg.stretch
            )
            boxes, cls, valid = [], [], []
            for j, i in enumerate(idxs):
                if status[j] != 0:
                    # non-JPEG or corrupt: python fallback for this image
                    img, b, c, v = self._load_example(int(i))
                    images[j] = img
                    boxes.append(b)
                    cls.append(c)
                    valid.append(v)
                    continue
                sx, sy, px, py = transforms[j]
                b, c, v = self._gt_arrays(int(i), sx, sy, px, py)
                boxes.append(b)
                cls.append(c)
                valid.append(v)
            return images, np.stack(boxes), np.stack(cls), np.stack(valid)
        ex = [self._load_example(int(i)) for i in idxs]
        imgs, boxes, cls, valid = map(np.stack, zip(*ex))
        return imgs, boxes, cls, valid

    # -- epoch iteration ---------------------------------------------------
    def epoch(self, epoch_idx: int = 0, *, shuffle: bool = True) -> Iterator:
        """Yield batches for one epoch. Deterministic given (seed, epoch)."""
        n = len(self.cache)
        order = np.arange(n)
        if shuffle:
            # identical seed on every process -> consistent disjoint shards
            rng = np.random.RandomState((self.cfg.seed, epoch_idx))
            rng.shuffle(order)
        if self.cfg.shard_count > 1:
            order = order[self.cfg.shard_index :: self.cfg.shard_count]
        n = len(order)
        b = self.cfg.batch_size
        limit = (n // b) * b if self.cfg.drop_remainder else n

        work_q: "queue.Queue" = queue.Queue()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.cfg.prefetch)
        batches = [order[s : s + b] for s in range(0, limit, b)]
        for bi, idxs in enumerate(batches):
            work_q.put((bi, idxs))
        stop = threading.Event()

        def put_or_stop(item):
            # out_q is bounded; if the consumer abandons the generator
            # mid-epoch a plain put() would block forever and leak the
            # thread + prefetched batch. Re-check stop while waiting.
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def worker():
            while not stop.is_set():
                try:
                    bi, idxs = work_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    put_or_stop((bi, self._load_batch(idxs)))
                except Exception as e:  # surface decode errors, don't hang
                    put_or_stop((bi, e))

        # with the native pool, decode parallelism lives in C++; two python
        # threads suffice to overlap batch assembly with consumption
        n_py_threads = 2 if self._native is not None else self.cfg.num_threads
        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(n_py_threads, max(len(batches), 1)))
        ]
        for t in threads:
            t.start()
        try:
            # Re-order: batches may complete out of order across threads.
            next_bi = 0
            pending = {}
            for _ in range(len(batches)):
                bi, payload = out_q.get()
                pending[bi] = payload
                while next_bi in pending:
                    p = pending.pop(next_bi)
                    if isinstance(p, Exception):
                        raise p
                    yield p
                    next_bi += 1
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)


def _default_decoder(path: str) -> np.ndarray:
    """Decode an image file to RGB uint8 HWC."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
