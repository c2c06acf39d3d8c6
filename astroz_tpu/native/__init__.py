"""Native (C++) runtime components, loaded via ctypes.

The reference's ingest/runtime layer is native Zig (src/Tle.zig, the
C API, the CPython extension); here the equivalents are C++ compiled
on demand with the system toolchain and bound through ctypes — no
pybind11 required. Everything has a pure-Python fallback, so the
package works without a compiler; with one, catalog parsing drops from
~100 ms to ~2 ms for the 13k-satellite active catalog.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libastroz_native.so")
_SRC = os.path.join(_DIR, "tle_parser.cpp")
_SRC2 = os.path.join(_DIR, "frame_scanner.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

N_COLS = 12  # must match tle_parser.cpp Col enum


def _build() -> bool:
    """Compile the shared library if the source is newer or the .so is
    missing. Returns True on success."""
    try:
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC2))
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return True
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               _SRC, _SRC2, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.astroz_parse_catalog.restype = ctypes.c_int
            lib.astroz_parse_catalog.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.c_longlong, ctypes.c_longlong]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return get_lib() is not None


def parse_catalog(text: str
                  ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parse a TLE/3LE catalog natively.

    Returns (cols, satnums) with cols shaped (12, n) in the TleArrays
    column order, or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode("utf-8", errors="replace")
    # upper bound: every pair of lines could be one satellite
    max_sats = max(1, data.count(b"\n") // 2 + 1)
    cols = np.zeros((N_COLS, max_sats), np.float64)
    satnums = np.zeros(max_sats, np.int64)
    n = lib.astroz_parse_catalog(
        data, len(data),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        satnums.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        max_sats, max_sats)
    if n < 0:
        return None
    return cols[:, :n].copy(), satnums[:n].copy()


def scan_frames(kind: str, data: bytes,
                sync_pattern: Optional[bytes] = None
                ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Scan a telemetry buffer for frame boundaries natively.

    ``kind`` is ``"ccsds"`` or ``"vita49"``. Returns ``(offsets,
    lengths)`` int64 arrays of frame candidates (validation mirrors the
    Python parsers), or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    fn = (lib.astroz_scan_ccsds if kind == "ccsds"
          else lib.astroz_scan_vita49)
    sync = sync_pattern or b""
    # every frame needs >= 4 bytes (header), so n/4 + 1 bounds the count
    max_frames = len(data) // 4 + 1
    offsets = np.zeros(max_frames, np.int64)
    lengths = np.zeros(max_frames, np.int64)
    n = fn(data, len(data), sync, len(sync),
           offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
           lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
           max_frames)
    if n < 0:
        return None
    return offsets[:n].copy(), lengths[:n].copy()
