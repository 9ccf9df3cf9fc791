"""ctypes bindings for the native data-loading library.

Builds `libstyl3r_io.so` on first use (g++ + libjpeg, see Makefile) and
exposes batched JPEG decode + Lanczos resize; the Python/PIL path in
styl3r_tpu.data remains the fallback when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent
_LIB_PATH = _NATIVE_DIR / "libstyl3r_io.so"
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None
    lib.styl3r_decode_jpeg_batch.restype = ctypes.c_int
    lib.styl3r_decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.styl3r_resize_lanczos_f32.restype = None
    lib.styl3r_resize_lanczos_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_jpeg_batch(
    jpegs: List[bytes], out_shape: Tuple[int, int], num_threads: int = 8
) -> Optional[np.ndarray]:
    """Decode + resize a batch of JPEG byte strings to (n, h, w, 3) f32 [0,1].
    Returns None when the native library is unavailable or any decode fails
    (callers fall back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    n = len(jpegs)
    h, w = out_shape
    blob = b"".join(jpegs)
    data = np.frombuffer(blob, dtype=np.uint8)
    sizes = np.asarray([len(j) for j in jpegs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    out = np.zeros((n, h, w, 3), np.float32)
    ok = lib.styl3r_decode_jpeg_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
        num_threads,
    )
    if ok != n:
        return None
    return out


def resize_lanczos(image: np.ndarray, out_shape: Tuple[int, int]) -> Optional[np.ndarray]:
    """(h, w, 3) f32 [0,1] -> Lanczos-resized (out_h, out_w, 3)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, np.float32)
    h, w = out_shape
    out = np.zeros((h, w, 3), np.float32)
    lib.styl3r_resize_lanczos_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.shape[0],
        src.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
    )
    return out
