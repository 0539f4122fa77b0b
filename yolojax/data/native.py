"""ctypes bindings for the native decode pool (native/libyolodata.so).

The C++ pool decodes + letterboxes a whole batch in one GIL-releasing call
(see native/yolodata.cc). Falls back cleanly when the library isn't built;
``yolojax.data.loader.Loader`` auto-uses it when present.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

# source checkout: native/ sits beside the yolojax package; pip installs
# don't ship the C++ pool — point YOLOJAX_NATIVE_DIR at a built checkout's
# native/ to use it there (the loader falls back to threads otherwise)
_NATIVE_DIR = os.environ.get("YOLOJAX_NATIVE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libyolodata.so")

_lib = None
_lib_checked = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if not os.path.exists(_SO_PATH):
        # try a one-shot build (g++ is part of the supported toolchain)
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            log.info("native loader unavailable (build failed: %s)", e)
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        log.info("native loader unavailable: %s", e)
        return None
    lib.ydl_create.restype = ctypes.c_void_p
    lib.ydl_create.argtypes = [ctypes.c_int]
    lib.ydl_destroy.argtypes = [ctypes.c_void_p]
    lib.ydl_load_batch.restype = ctypes.c_int
    lib.ydl_load_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ydl_load_one.restype = ctypes.c_int
    lib.ydl_load_one.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


class NativeDecodePool:
    """Batch decode+letterbox via the C++ worker pool."""

    def __init__(self, num_threads: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libyolodata.so not available")
        self._lib = lib
        self._pool = lib.ydl_create(int(num_threads))

    def close(self):
        if getattr(self, "_pool", None):
            self._lib.ydl_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def load_batch(
        self, paths, dim: int, *, stretch: bool = False
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (images (N,dim,dim,3) f32 [0,1], transforms (N,4) f32
        [sx, sy, px, py], status (N,) int32 0=ok)."""
        n = len(paths)
        images = np.empty((n, dim, dim, 3), np.float32)
        transforms = np.empty((n, 4), np.float32)
        status = np.empty((n,), np.int32)
        arr = (ctypes.c_char_p * n)(
            *[os.fsencode(str(p)) for p in paths]
        )
        self._lib.ydl_load_batch(
            self._pool, arr, n, int(dim), int(bool(stretch)),
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            transforms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return images, transforms, status


def load_one(path: str, dim: int, *, stretch: bool = False):
    """Single-image decode+letterbox (detect path). Returns
    (canvas, (sx, sy, px, py)) or None when the native lib is missing or
    decode fails."""
    lib = _load_lib()
    if lib is None:
        return None
    img = np.empty((dim, dim, 3), np.float32)
    tr = np.empty((4,), np.float32)
    rc = lib.ydl_load_one(
        os.fsencode(str(path)), int(dim), int(bool(stretch)),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return img, (float(tr[0]), float(tr[1]), float(tr[2]), float(tr[3]))
