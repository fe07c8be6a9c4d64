"""Native (C++) components, loaded via ctypes.

The reference leans on native wheels for metric hot spots (``editdistance``
C++ ext, ``bitarray`` C ext — reference ``requirements.txt:12,27``).  Here
the sources live in ``cpp/`` and build on demand with g++ (the image has no
pybind11; the C ABI + ctypes keeps the binding layer dependency-free).
Every native entry point has a pure-python fallback at its call site.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_BUILD_DIR = os.path.join(_CPP_DIR, "build")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    srcs = [
        os.path.join(_CPP_DIR, "editdistance.cc"),
        os.path.join(_CPP_DIR, "tokenizer.cc"),
    ]
    so = os.path.join(_BUILD_DIR, "libpdec_native.so")
    try:
        if not os.path.exists(so) or any(
            os.path.getmtime(src) > os.path.getmtime(so) for src in srcs
        ):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs,
                 "-o", so],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.pdec_editdistance.restype = ctypes.c_longlong
        lib.pdec_editdistance.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_longlong,
        ]
        _lib = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def _codepoints(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def editdistance(a: str, b: str) -> int:
    """Levenshtein distance (native); raises ImportError if unbuildable so
    callers fall back to pure python."""
    lib = _build_and_load()
    if lib is None:
        raise ImportError("native editdistance unavailable")
    ca = np.ascontiguousarray(_codepoints(a))
    cb = np.ascontiguousarray(_codepoints(b))
    pa = ca.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    pb = cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    return int(lib.pdec_editdistance(pa, len(ca), pb, len(cb)))
