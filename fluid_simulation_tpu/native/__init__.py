"""ctypes bindings for the native runtime library (libfstpu.so).

Auto-builds with the in-image g++ on first use when the shared object is
missing; every consumer has a NumPy fallback, so an unbuildable environment
degrades gracefully rather than failing (pybind11 is not available here —
plain C ABI + ctypes instead).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfstpu.so")
_lock = threading.Lock()
_lib = None

# Must match fstpu_abi_version() in geometry.cpp. A stale .so with an older
# ABI would read pointer arguments from the wrong slots (ADVICE r2).
_ABI_VERSION = 3


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def load_library() -> ctypes.CDLL:
    """Load (building if needed) the native library; raises OSError when
    unavailable so callers can fall back to NumPy."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        # always run make: a no-op when current, a rebuild when the sources
        # are newer than a stale .so (make tracks the dependency mtimes)
        if not _build() and not os.path.exists(_LIB_PATH):
            raise OSError("libfstpu.so unavailable and could not be built")
        lib = ctypes.CDLL(_LIB_PATH)
        try:
            got = int(lib.fstpu_abi_version())
        except AttributeError:
            got = -1
        if got != _ABI_VERSION:
            raise OSError(
                f"libfstpu.so ABI version {got} != expected {_ABI_VERSION} "
                "(stale build that `make` could not refresh); run "
                f"`make -C {_DIR} clean all`")
        _lib = lib
        return _lib
