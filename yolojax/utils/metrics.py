"""Structured metrics: jsonl always, TensorBoard optionally.

Replaces the reference's ``tf.summary`` scalar/histogram/image summaries
(SURVEY.md §5 observability). The jsonl stream is the source of truth
(greppable, no TF needed); a TB writer is attached only if TensorFlow is
importable and the caller asks for it. Image summaries (boxes drawn on
augmented batches — the reference's de-facto debugging tool) are written as
PNGs next to the jsonl via :meth:`log_image_with_boxes`.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import numpy as np

log = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, logdir: str, *, tensorboard: bool = False):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # host-side only

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception as e:  # pragma: no cover
                log.warning("tensorboard writer unavailable: %s", e)

    def log(self, step: int, values: Dict[str, float], *, prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        rec.update({prefix + k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in values.items():
                    tf.summary.scalar(prefix + k, float(v), step=int(step))

    def log_histograms(self, step: int, tree, *, prefix: str = "hist/"):
        """Histogram summaries for a pytree of arrays (vars or grads) —
        the reference emitted tf.summary histograms (SURVEY.md §2). jsonl
        gets compact percentiles; TB gets full histograms when enabled."""
        import jax

        flat = {}

        def walk(prefix_key, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix_key}/{k}" if prefix_key else k, v)
            else:
                flat[prefix_key] = np.asarray(node)

        walk("", jax.device_get(tree))
        rec = {"step": int(step), "time": time.time()}
        for k, v in flat.items():
            if v.size == 0:
                continue
            q = np.percentile(v, [0, 25, 50, 75, 100])
            rec[prefix + k] = {
                "min": float(q[0]), "p25": float(q[1]), "p50": float(q[2]),
                "p75": float(q[3]), "max": float(q[4]),
                "mean": float(v.mean()), "std": float(v.std()),
            }
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in flat.items():
                    tf.summary.histogram(prefix + k, v, step=int(step))

    def log_image_with_boxes(
        self,
        step: int,
        image: np.ndarray,  # (H, W, 3) float [0,1]
        boxes: np.ndarray,  # (G, 4) normalized xywh
        valid: Optional[np.ndarray] = None,
        name: str = "sample",
    ):
        """Draw GT/detection boxes on an image and save a PNG."""
        import cv2

        img = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8).copy()
        h, w = img.shape[:2]
        for i, (cx, cy, bw, bh) in enumerate(np.asarray(boxes)):
            if valid is not None and not valid[i]:
                continue
            x0 = int((cx - bw / 2) * w)
            y0 = int((cy - bh / 2) * h)
            x1 = int((cx + bw / 2) * w)
            y1 = int((cy + bh / 2) * h)
            cv2.rectangle(img, (x0, y0), (x1, y1), (0, 255, 0), 1)
        path = os.path.join(self.logdir, f"{name}_{int(step):08d}.png")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        return path

    def close(self):
        self._f.close()
