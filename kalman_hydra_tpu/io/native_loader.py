"""ctypes binding for the C++ threaded frame loader (native/frameloader.cpp).

Native runtime component (SURVEY.md §2.1 #8 equivalent): decode runs on a
C++ worker thread into a preallocated ring; Python only memcpys frames
out, so host decode overlaps device compute without the GIL in the way.

Falls back gracefully (importers check `available()`) when the shared
library hasn't been built — `make -C native` builds it with the system
OpenCV 4.x toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libframeloader.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    if hasattr(lib, "fl_open2"):
        lib.fl_open2.restype = ctypes.c_void_p
        lib.fl_open2.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.c_int]
    lib.fl_info.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int64),
                            ctypes.POINTER(ctypes.c_double)]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_uint8)]
    lib.fl_close.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "fl_error"):
        lib.fl_error.restype = ctypes.c_int
        lib.fl_error.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeFrameStream:
    """Threaded-decode frame stream backed by the C++ ring loader.

    gray=True converts BGR->gray u8 on the decode thread with cv2's exact
    fixed-point BT.601 (bit-identical to ops.color.grayscale_u8): frames
    come out (H, W) uint8 and the host->device transfer moves 1/3 of the
    bytes — the H2D link is the streaming bottleneck on relay hosts
    (BASELINE.md decode-in-the-loop split)."""

    def __init__(self, path: str, ring: int = 8, gray: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frame loader unavailable "
                               "(build with: make -C native)")
        self._lib = lib
        self.gray = bool(gray)
        if self.gray and not hasattr(lib, "fl_open2"):
            raise RuntimeError("gray mode needs a rebuilt loader "
                               "(make -C native)")
        if self.gray:
            self._h = lib.fl_open2(path.encode(), ring, 1)
        else:
            self._h = lib.fl_open(path.encode(), ring)
        if not self._h:
            raise IOError(f"cannot open video {path!r}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        n = ctypes.c_int64()
        fps = ctypes.c_double()
        lib.fl_info(self._h, ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(n), ctypes.byref(fps))
        self.width = w.value
        self.height = h.value
        self.num_frames = int(n.value)
        self.fps = fps.value or 30.0

    def __iter__(self) -> Iterator[np.ndarray]:
        shape = ((self.height, self.width) if self.gray
                 else (self.height, self.width, 3))
        buf = np.empty(shape, dtype=np.uint8)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        while True:
            if not self._lib.fl_next(self._h, ptr):
                # distinguish a decode failure from a clean end-of-stream
                # (a truncated/odd-dimension frame used to look like EOF
                # and the pipeline exported a half-length trajectory as
                # success); older .so builds without fl_error fall back
                # to the EOF interpretation
                if (hasattr(self._lib, "fl_error")
                        and self._lib.fl_error(self._h)):
                    raise RuntimeError(
                        "native loader: decode error mid-stream (frame "
                        "dimensions disagree with the container header)")
                break
            yield buf.copy()

    def read_all(self, limit: Optional[int] = None) -> np.ndarray:
        out = []
        for i, f in enumerate(self):
            if limit is not None and i >= limit:
                break
            out.append(f)
        return np.stack(out)

    def close(self):
        if self._h:
            self._lib.fl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
