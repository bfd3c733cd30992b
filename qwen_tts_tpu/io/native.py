"""ctypes bindings for the native C++ runtime (csrc/qtts_runtime.cpp).

Provides the fast path for host-side runtime work — mmap + parallel page
prefetch of checkpoint shards, multithreaded bf16→f32, atomic WAV writes —
with automatic build-on-first-use and a clean "not available" signal so
callers fall back to the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
# QTTS_NATIVE_LIB overrides the library path (e.g. the ASan/UBSan build from
# `make -C csrc sanitize`).
_LIB_PATH = os.environ.get(
    "QTTS_NATIVE_LIB", os.path.join(_CSRC, "libqtts_runtime.so")
)
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC], capture_output=True, check=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.qtts_open.restype = ctypes.c_void_p
        lib.qtts_open.argtypes = [ctypes.c_char_p]
        lib.qtts_data.restype = ctypes.c_void_p
        lib.qtts_data.argtypes = [ctypes.c_void_p]
        lib.qtts_size.restype = ctypes.c_uint64
        lib.qtts_size.argtypes = [ctypes.c_void_p]
        lib.qtts_header_len.restype = ctypes.c_uint64
        lib.qtts_header_len.argtypes = [ctypes.c_void_p]
        lib.qtts_close.argtypes = [ctypes.c_void_p]
        lib.qtts_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.qtts_bf16_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int
        ]
        lib.qtts_f32_to_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64
        ]
        lib.qtts_write_wav.restype = ctypes.c_int
        lib.qtts_write_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


class NativeMap:
    """mmap'd safetensors file via the native runtime (zero-copy view)."""

    def __init__(self, path: str, prefetch_threads: int = 0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native runtime not available")
        self._lib = lib
        self._handle = lib.qtts_open(path.encode())
        if not self._handle:
            raise OSError(f"qtts_open failed for {path}")
        if prefetch_threads:
            lib.qtts_prefetch(self._handle, prefetch_threads)
        self.size = lib.qtts_size(self._handle)
        self.header_len = lib.qtts_header_len(self._handle)
        data_ptr = lib.qtts_data(self._handle)
        self._buf = np.ctypeslib.as_array(
            ctypes.cast(data_ptr, ctypes.POINTER(ctypes.c_uint8)),
            shape=(self.size,),
        )

    def header_bytes(self) -> bytes:
        return self._buf[8 : 8 + self.header_len].tobytes()

    def view(self, begin: int, end: int) -> np.ndarray:
        """uint8 view of [begin, end) within the data section."""
        start = 8 + self.header_len
        return self._buf[start + begin : start + end]

    def prefetch(self, n_threads: int = 8) -> None:
        self._lib.qtts_prefetch(self._handle, n_threads)

    def close(self):
        if self._handle:
            self._buf = None
            self._lib.qtts_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def bf16_to_f32(src: np.ndarray, n_threads: int = 8) -> np.ndarray:
    """Multithreaded bf16(uint16 view) → f32."""
    lib = get_lib()
    src = np.ascontiguousarray(src.view(np.uint16))
    out = np.empty(src.shape, np.float32)
    lib.qtts_bf16_to_f32(
        src.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p),
        src.size, n_threads,
    )
    return out


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 24000) -> None:
    lib = get_lib()
    if lib is None:
        from qwen_tts_tpu.io.wav import write_wav as py_write

        return py_write(path, samples, sample_rate)
    samples = np.ascontiguousarray(samples, np.float32)
    rc = lib.qtts_write_wav(
        path.encode(), samples.ctypes.data_as(ctypes.c_void_p),
        samples.size, sample_rate,
    )
    if rc != 0:
        raise OSError(f"qtts_write_wav failed with code {rc}")
