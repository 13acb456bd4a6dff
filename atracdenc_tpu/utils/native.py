"""ctypes loader for the native host runtime (native/libatracpack.so).

Builds the library on first use if a compiler is available; all callers fall
back to the NumPy implementations in utils/bitpack.py when the native library
cannot be built, so the framework stays functional everywhere.
"""
import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libatracpack.so")
_lib = None
_tried = False


def load():
    """Returns the loaded CDLL or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.pack_frames.restype = ctypes.c_int
    lib.pack_frames.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.unpack_fields.restype = None
    lib.unpack_fields.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32),
    ]
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_frames(values: np.ndarray, widths: np.ndarray, frame_bytes: int):
    """Native pack_frames; returns None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, np.uint32)
    widths = np.ascontiguousarray(widths, np.int32)
    n, k = values.shape
    out = np.empty((n, frame_bytes), np.uint8)
    rc = lib.pack_frames(_ptr(values, ctypes.c_uint32), _ptr(widths, ctypes.c_int32),
                         n, k, frame_bytes, _ptr(out, ctypes.c_uint8))
    if rc != 0:
        raise ValueError("frame overflow: fields exceed frame size")
    return out


def unpack_fields(frames: np.ndarray, offsets: np.ndarray, widths: np.ndarray):
    """Native unpack_fields; returns None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    widths = np.ascontiguousarray(widths, np.int32)
    n, k = offsets.shape
    out = np.empty((n, k), np.uint32)
    lib.unpack_fields(_ptr(frames, ctypes.c_uint8), frames.shape[1],
                      _ptr(offsets, ctypes.c_int64), _ptr(widths, ctypes.c_int32),
                      n, k, _ptr(out, ctypes.c_uint32))
    return out
