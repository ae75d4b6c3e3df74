"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the host-side runtime around it —
currently the mocap clip parser — is C++ compiled on demand with g++
(no pybind11 in the image; plain C ABI + ctypes). Every entry point has a
pure-Python fallback so the package works without a toolchain.
"""
import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "clip_parser.cpp")
_LIB = os.path.join(_DIR, "libclip_parser.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB + ".tmp", _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if stale) and load the native library; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.clip_parse_file.restype = ctypes.c_int
        lib.clip_parse_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_long),
        ]
        _lib = lib
        return _lib


def parse_clip_file(path: str) -> Optional[Tuple[np.ndarray, float]]:
    """Parse one retargeted-clip JSON file natively.

    Returns (frames (N, 19) float32, frame_duration) or None if the native
    library is unavailable / the file does not fit the restricted grammar
    (callers fall back to json.loads)."""
    lib = load_library()
    if lib is None:
        return None
    cpath = os.fsencode(path)
    fd = ctypes.c_double()
    n = ctypes.c_long()
    rc = lib.clip_parse_file(cpath, None, 0, ctypes.byref(fd), ctypes.byref(n))
    if rc != 0 or n.value <= 0 or n.value % 19 != 0:
        return None
    out = np.empty(n.value, dtype=np.float32)
    rc = lib.clip_parse_file(
        cpath,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n.value,
        ctypes.byref(fd),
        ctypes.byref(n),
    )
    if rc != 0:
        return None
    return out.reshape(-1, 19), float(fd.value)
