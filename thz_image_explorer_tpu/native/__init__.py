"""Native (C) host runtime, built lazily with the system compiler.

pybind11 is not available in this environment, so the library is a plain
shared object loaded via ctypes. If no compiler is present the callers fall
back to pure-Python implementations with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "thznative.c")
_SO = os.path.join(_HERE, "_thznative.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", "-o", _SO, _SRC, "-lpthread"],
                check=True,
                capture_output=True,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return False


def load():
    """Return the ctypes library handle, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.thz_polygon_mask.restype = ctypes.c_longlong
        lib.thz_polygon_mask.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.thz_cmd_slot_new.restype = ctypes.c_void_p
        lib.thz_cmd_slot_free.argtypes = [ctypes.c_void_p]
        lib.thz_cmd_slot_put.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.thz_cmd_slot_take.restype = ctypes.c_int
        lib.thz_cmd_slot_take.argtypes = [
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.thz_cmd_slot_close.argtypes = [ctypes.c_void_p]
        lib.thz_cmd_slot_drain.restype = ctypes.c_int
        lib.thz_cmd_slot_drain.argtypes = [ctypes.c_void_p]
        lib.thz_cmd_queue_new.restype = ctypes.c_void_p
        lib.thz_cmd_queue_free.argtypes = [ctypes.c_void_p]
        lib.thz_cmd_queue_push.restype = ctypes.c_int
        lib.thz_cmd_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.thz_cmd_queue_pop.restype = ctypes.c_int
        lib.thz_cmd_queue_pop.argtypes = [
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.thz_cmd_queue_drain.restype = ctypes.c_longlong
        lib.thz_cmd_queue_drain.argtypes = [ctypes.c_void_p]
        lib.thz_cmd_queue_size.restype = ctypes.c_longlong
        lib.thz_cmd_queue_size.argtypes = [ctypes.c_void_p]
        lib.thz_cmd_queue_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
