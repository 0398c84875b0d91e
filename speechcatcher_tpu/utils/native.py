"""ctypes bindings for the native staging library (csrc/staging.cpp).

Builds libstaging.so on first use (g++, ~1 s) and caches it next to the
source; every entry point has a numpy fallback so the package works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libstaging.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _CSRC / "staging.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH)],
            check=True, capture_output=True,
        )
        return True
    except Exception as e:
        logger.info("native staging build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_available.restype = ctypes.c_int64
        lib.ring_available.argtypes = [ctypes.c_void_p]
        lib.ring_write_pcm16.restype = ctypes.c_int64
        lib.ring_write_pcm16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_float,
        ]
        lib.ring_write_f32.restype = ctypes.c_int64
        lib.ring_write_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.ring_read.restype = ctypes.c_int64
        lib.ring_read.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.pcm16_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_float,
        ]
        lib.pcm16_energy.restype = ctypes.c_double
        lib.pcm16_energy.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
    except OSError as e:
        logger.info("native staging unavailable: %s", e)
    return _lib


class StagingRing:
    """Per-session audio staging: int16 frames in, fixed float chunks out.

    Uses the native ring when available, a numpy deque-of-arrays otherwise.
    """

    def __init__(self, capacity: int = 16000 * 120, scale: float = 1 / 32767.0):
        self.scale = scale
        lib = get_lib()
        self._lib = lib
        if lib is not None:
            self._handle = lib.ring_create(capacity)
        else:
            self._handle = None
            self._buf = np.zeros(0, np.float32)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._handle:
            self._lib.ring_destroy(self._handle)
            self._handle = None

    def write_pcm16(self, data: bytes) -> int:
        if self._handle:
            arr = np.frombuffer(data, dtype=np.int16)
            return int(
                self._lib.ring_write_pcm16(
                    self._handle,
                    arr.ctypes.data_as(ctypes.c_void_p),
                    len(arr),
                    self.scale,
                )
            )
        pcm = np.frombuffer(data, dtype=np.int16).astype(np.float32) * self.scale
        self._buf = np.concatenate([self._buf, pcm])
        return len(pcm)

    def write_f32(self, x: np.ndarray) -> int:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if self._handle:
            return int(
                self._lib.ring_write_f32(
                    self._handle, x.ctypes.data_as(ctypes.c_void_p), len(x)
                )
            )
        self._buf = np.concatenate([self._buf, x])
        return len(x)

    def available(self) -> int:
        if self._handle:
            return int(self._lib.ring_available(self._handle))
        return len(self._buf)

    def read(self, n: int) -> Optional[np.ndarray]:
        if self._handle:
            out = np.empty(n, np.float32)
            got = self._lib.ring_read(
                self._handle, out.ctypes.data_as(ctypes.c_void_p), n
            )
            return out if got == n else None
        if len(self._buf) < n:
            return None
        out, self._buf = self._buf[:n].copy(), self._buf[n:]
        return out

    def drain(self) -> np.ndarray:
        n = self.available()
        if n == 0:
            return np.zeros(0, np.float32)
        out = self.read(n)
        return out if out is not None else np.zeros(0, np.float32)
