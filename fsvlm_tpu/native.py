"""ctypes bindings for the native C++ image decoder (native/decoder.cpp).

``decode_file(path, pre_size)`` returns a (pre_size, pre_size, 3) uint8
array: JPEG decode with DCT-domain downscaling + bilinear shorter-edge
resize + center crop, all in C++ with the GIL released — a Python thread
pool achieves real parallelism (the reference needs worker *processes* for
the same, data_manager.py:42-49).

Falls back to the PIL path when the shared library hasn't been built
(``make -C native``); ``native_available()`` reports which path is active.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "libfsvlm_native.so",
    )


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # best-effort build; stays silent on failure (PIL fallback)
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.fsvlm_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fsvlm_decode_file.restype = ctypes.c_int
        lib.fsvlm_decode_resize_crop.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fsvlm_decode_resize_crop.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available():
    return _load() is not None


def decode_file(path, pre_size):
    """Returns (pre_size, pre_size, 3) uint8, or None if native decode is
    unavailable or the file isn't a decodable JPEG."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((pre_size, pre_size, 3), np.uint8)
    rc = lib.fsvlm_decode_file(
        path.encode(), pre_size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    if rc != 0:
        return None
    return out


def decode_bytes(data, pre_size):
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((pre_size, pre_size, 3), np.uint8)
    rc = lib.fsvlm_decode_resize_crop(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        pre_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out
