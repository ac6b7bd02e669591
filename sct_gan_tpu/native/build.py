"""Build + load the native library (g++ → .so, cached by source mtime)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_tokenizer.cpp")
_LIB = os.path.join(_DIR, "libfast_tokenizer.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _needs_build() -> bool:
    return (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if stale) and dlopen the native library; None on failure."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if _needs_build():
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB)
        lib.ft_create.restype = ctypes.c_void_p
        lib.ft_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.ft_add_token.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_int32]
        lib.ft_destroy.argtypes = [ctypes.c_void_p]
        lib.ft_encode.restype = ctypes.c_int32
        lib.ft_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.ft_encode_lines.restype = ctypes.c_int32
        lib.ft_encode_lines.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32]
        _lib = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def native_available() -> bool:
    return load_library() is not None
