"""Native host runtime: C++ kernels for the data path, loaded via ctypes.

Builds ``libaat_host.so`` from aat_host.cpp on first use (cached beside the
source); all entry points have pure-numpy fallbacks in
:mod:`aat_tpu.runtime.host_ops` so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return False


def load_library():
    """Return the ctypes library, building it if needed; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        so_path = os.path.join(here, "libaat_host.so")
        src_path = os.path.join(here, "aat_host.cpp")
        if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(src_path)
        ):
            if not _build(src_path, so_path):
                return None
        lib = ctypes.CDLL(so_path)

        i64 = ctypes.c_int64
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_double))

        lib.assemble_segments.argtypes = [f32p, i64, i64p, i64p, i64p, i64, i64, f32p, f32p]
        lib.assemble_segments.restype = None
        lib.normalize_pad.argtypes = [f64pp, i64p, i64, i64, f32p, i64p]
        lib.normalize_pad.restype = None
        lib.smoothed_amplitude.argtypes = [f32p, i64, i64, f32p]
        lib.smoothed_amplitude.restype = None
        lib.find_minima.argtypes = [f32p, i64, ctypes.c_float, ctypes.c_float, i64p, i64]
        lib.find_minima.restype = i64
        lib.edit_distance.argtypes = [i64p, i64, i64p, i64]
        lib.edit_distance.restype = i64

        _LIB = lib
        return _LIB
