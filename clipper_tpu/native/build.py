"""Build helper for the native host-side components.

Compiles the C++ sources in this directory into one shared library
(`_clipper_native.so`) with a plain C ABI consumed via ctypes. Rebuilds
automatically when any source is newer than the library. No external build
system or bindings dependency needed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent
_SOURCES = ["dsd.cpp", "maxclique.cpp", "plyio.cpp"]
_LIB = _DIR / "_clipper_native.so"
_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None


def _needs_build() -> bool:
    if not _LIB.exists():
        return True
    lib_mtime = _LIB.stat().st_mtime
    return any((_DIR / s).exists() and (_DIR / s).stat().st_mtime > lib_mtime
               for s in _SOURCES)


def build() -> Path:
    srcs = [str(_DIR / s) for s in _SOURCES if (_DIR / s).exists()]
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-pthread", *srcs, "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _CACHED
    with _LOCK:
        if _CACHED is not None:
            return _CACHED
        try:
            if _needs_build():
                build()
            _CACHED = ctypes.CDLL(str(_LIB))
        except (OSError, subprocess.CalledProcessError):
            return None
        return _CACHED
