"""ctypes bindings for the native data-prep runtime (see dataprep.cpp).

Compiled lazily on first use (g++ -O3, links libpng); all entry points fall back
to the PIL/numpy path when the toolchain or libpng is unavailable, so the
framework never hard-depends on the native module.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdataprep.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "dataprep.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", src,
        "-o", _LIB_PATH, "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load():
    """Return the loaded library or None (after a single build attempt)."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        src = os.path.join(_HERE, "dataprep.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _failed = True
            return None
        lib.png_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.prepare_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.prepare_label.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.executor_start.argtypes = [ctypes.c_int]
        lib.executor_submit_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.executor_submit_labels.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.executor_wait.argtypes = [ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def prepare_image(path: str, out_hw, mean, std, threads: int = 2) -> np.ndarray | None:
    """decode→bicubic resize→BGR flip+normalize; returns (H, W, 3) f32 or None."""
    lib = load()
    if lib is None:
        return None
    h, w = out_hw
    dst = np.empty((h, w, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.prepare_image(path.encode(), h, w, _fptr(mean), _fptr(std), _fptr(dst), threads)
    return dst if rc == 0 else None


class BatchExecutor:
    """Pipelined multi-image prefetch executor (dataprep.cpp worker pool).

    submit_* fans per-image decode→resize→normalize/remap tasks across a
    persistent C++ thread pool and returns immediately; `wait` blocks (GIL
    released) until the batch buffers are filled. Loader worker threads keep
    several jobs in flight, so whole-batch prep overlaps the TPU step with no
    Python in the pixel loop."""

    def __init__(self, workers: int | None = None):
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native data-prep library unavailable")
        if workers is None:
            workers = max(2, (os.cpu_count() or 4) - 1)
        self.lib.executor_start(int(workers))

    @staticmethod
    def _paths(paths):
        arr = (ctypes.c_char_p * len(paths))()
        arr[:] = [p.encode() for p in paths]
        return arr

    def submit_images(self, paths, out_hw, mean, std):
        """-> (job_id, dst (N,H,W,3) f32); keep dst alive until wait()."""
        h, w = out_hw
        dst = np.empty((len(paths), h, w, 3), np.float32)
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        job = self.lib.executor_submit_images(
            self._paths(paths), len(paths), h, w, _fptr(mean), _fptr(std), _fptr(dst)
        )
        return job, dst

    def submit_labels(self, paths, out_hw, res_hw, lut):
        """-> (job_id, full (N,H,W) i32, res (N,h8,w8) i32)."""
        h, w = out_hw
        rh, rw = res_hw
        lut = np.ascontiguousarray(lut, np.int32)
        full = np.empty((len(paths), h, w), np.int32)
        res = np.empty((len(paths), rh, rw), np.int32)
        job = self.lib.executor_submit_labels(
            self._paths(paths), len(paths), h, w, rh, rw,
            _iptr(lut), len(lut), _iptr(full), _iptr(res),
        )
        return job, full, res

    def wait(self, job_id: int) -> int:
        return int(self.lib.executor_wait(job_id))


_executor = None


def batch_executor():
    """Shared lazily-created BatchExecutor, or None when native is unavailable."""
    global _executor
    if _executor is None and available():
        _executor = BatchExecutor()
    return _executor


def prepare_label(path: str, out_hw, res_hw, lut: np.ndarray):
    """decode→nearest resize (full + 1/8 grid)→LUT remap; returns (full, res) i32 or None."""
    lib = load()
    if lib is None:
        return None
    h, w = out_hw
    rh, rw = res_hw
    lut = np.ascontiguousarray(lut, np.int32)
    full = np.empty((h, w), np.int32)
    res = np.empty((rh, rw), np.int32)
    rc = lib.prepare_label(
        path.encode(), h, w, rh, rw, _iptr(lut), len(lut), _iptr(full), _iptr(res)
    )
    return (full, res) if rc == 0 else None
