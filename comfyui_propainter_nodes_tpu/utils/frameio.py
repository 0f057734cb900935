"""Video frame source: native mmap+prefetch loader with numpy fallback.

Wraps native/libframeio.so (ctypes) — the C++ data loader with a
prefetching ring (see native/frameio.cpp). Falls back to numpy mmap when
the native lib isn't built, with identical semantics (frames as float32
in [0, 1]; out-of-range reads repeat the last frame to match the
pipeline's padding).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libframeio.so",
)
_lib = None


def _load_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fio_open.restype = ctypes.c_void_p
        lib.fio_open.argtypes = [ctypes.c_char_p]
        lib.fio_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fio_fetch_f32.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fio_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.fio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class VideoSource:
    """Random-access frame source over a .npy video file [T, H, W, C]
    (uint8 or float32). Uses the native loader when available."""

    def __init__(self, path: str):
        self.path = path
        lib = _load_lib()
        self._handle = None
        if lib is not None:
            h = lib.fio_open(path.encode())
            if h:
                self._handle = ctypes.c_void_p(h)
                dims = (ctypes.c_int64 * 4)()
                dt = ctypes.c_int()
                lib.fio_info(self._handle, dims, ctypes.byref(dt))
                self.shape = tuple(int(d) for d in dims)
                self.native = True
                return
        arr = np.load(path, mmap_mode="r")
        if arr.ndim != 4:
            raise ValueError(f"expected [T, H, W, C] video, got {arr.shape}")
        self._arr = arr
        self.shape = arr.shape
        self.native = False

    @property
    def num_frames(self) -> int:
        return self.shape[0]

    def prefetch(self, start: int, count: int) -> None:
        if self._handle is not None:
            _lib.fio_prefetch(self._handle, start, count)

    def fetch(self, start: int, count: int) -> np.ndarray:
        """float32 frames [count, H, W, C] in [0, 1]; repeats last frame
        beyond the end."""
        t, h, w, c = self.shape
        if self._handle is not None:
            out = np.empty((count, h, w, c), np.float32)
            _lib.fio_fetch_f32(
                self._handle,
                start,
                count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out
        idx = np.clip(np.arange(start, start + count), 0, t - 1)
        out = np.asarray(self._arr[idx], np.float32)
        if self._arr.dtype == np.uint8:
            out /= 255.0
        return out

    def close(self) -> None:
        if self._handle is not None:
            _lib.fio_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
