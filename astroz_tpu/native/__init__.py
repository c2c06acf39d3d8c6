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
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libastroz_native.so")
_SRC = os.path.join(_DIR, "tle_parser.cpp")
_SRC2 = os.path.join(_DIR, "frame_scanner.cpp")
_SRC3 = os.path.join(_DIR, "scalar_sgp4.cpp")
_SRC4 = os.path.join(_DIR, "c_api.cpp")
_SRC_EXT = os.path.join(_DIR, "scalar_ext.c")
_EXT_SO = os.path.join(_DIR, "_astroz_scalar.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

N_COLS = 12  # must match tle_parser.cpp Col enum


def _build() -> bool:
    """Compile the shared library if the source is newer or the .so is
    missing. Returns True on success."""
    try:
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC2),
                        os.path.getmtime(_SRC3), os.path.getmtime(_SRC4),
                        os.path.getmtime(_SRC_EXT),
                        os.path.getmtime(os.path.join(_DIR,
                                                      "scalar_fields.h")))
        main_fresh = (os.path.exists(_SO)
                      and os.path.getmtime(_SO) >= src_mtime)
        ext_fresh = (os.path.exists(_EXT_SO)
                     and os.path.getmtime(_EXT_SO) >= src_mtime)
        if main_fresh and ext_fresh:
            return True
        if main_fresh:
            # only the optional CPython extension is missing/stale (a
            # silent ext-build failure must not be latched by a fresh
            # main .so — that cost a round of 6x scalar-loop perf)
            _build_ext()
            return True
        cmd = ["g++", *_BUILD_FLAGS, "-std=c++17", _SRC, _SRC2, _SRC3,
               _SRC4, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        _build_ext()
        return True
    except Exception:
        return False


# -fno-math-errno: no errno bookkeeping around sqrt/sin/cos ->
# inline sqrtsd + fused sincos calls (results unchanged, the parity
# fuzz gates stay exact); -march=native is safe because the .so is a
# per-machine build artifact (gitignored). -fopenmp-simd: honor
# `#pragma omp simd` (forces if-conversion + vectorization of the
# 8-wide sgp4 lane loops) without any OpenMP runtime dependency.
_BUILD_FLAGS = ["-O3", "-march=native", "-fno-math-errno",
                "-fopenmp-simd", "-mprefer-vector-width=512",
                "-shared", "-fPIC"]


def _build_ext() -> None:
    """Compile the optional CPython extension for the per-call scalar
    path (ctypes remains the fallback if Python.h is unavailable).
    Failures are tolerated but REPORTED via ASTROZ_NATIVE_DEBUG=1 —
    a silent failure here once hid a 6x scalar-loop regression.

    Any failure UNLINKS a pre-existing ``_EXT_SO``: callers only reach
    here when the extension is missing or stale, so whatever sits on
    disk was built against older sources — loading it would bind a
    stale ABI against freshly-packed vectors. Deleting it makes a
    failed rebuild fall back to ctypes instead."""
    try:
        import sysconfig
        inc = sysconfig.get_paths()["include"]
        if not os.path.exists(os.path.join(inc, "Python.h")):
            # header-less host: the g++ attempt is doomed — skip it
            # cheaply instead of re-failing on every fresh process
            _unlink_ext()
            return
        cmd = ["g++", *_BUILD_FLAGS, "-std=c++17", f"-I{inc}",
               _SRC_EXT, _SRC3, "-o", _EXT_SO]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except subprocess.CalledProcessError as exc:
        _unlink_ext()
        if os.environ.get("ASTROZ_NATIVE_DEBUG"):
            sys.stderr.write("astroz native ext build failed:\n"
                             + exc.stderr.decode(errors="replace"))
    except Exception:
        _unlink_ext()


def _unlink_ext() -> None:
    try:
        os.unlink(_EXT_SO)
    except OSError:
        pass


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
            for fn in (lib.astroz_scan_ccsds, lib.astroz_scan_vita49):
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_longlong,
                    ctypes.c_char_p, ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_longlong),
                    ctypes.POINTER(ctypes.c_longlong),
                    ctypes.c_longlong]
            lib.astroz_scalar_sgp4.restype = ctypes.c_int
            lib.astroz_scalar_sgp4.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_double,
                ctypes.POINTER(ctypes.c_double)]
            lib.astroz_scalar_sgp4_array.restype = ctypes.c_longlong
            lib.astroz_scalar_sgp4_array.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int)]
            lib.astroz_sgp4_grid.restype = ctypes.c_longlong
            lib.astroz_sgp4_grid.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_double),
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int)]
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


#: packed element-vector layout for the native scalar propagator —
#: MUST match the F enum in scalar_sgp4.cpp
SCALAR_FIELDS = (
    "radiusearthkm", "xke", "j2", "j3oj2",
    "mo", "mdot", "argpo", "argpdot", "nodeo", "nodedot", "nodecf",
    "cc1", "bstar", "cc4", "t2cof", "isimp", "omgcof", "eta",
    "xmcof", "delmo", "sinmao", "d2", "d3", "d4", "cc5",
    "t3cof", "t4cof", "t5cof", "no_unkozai", "ecco", "inclo",
    "deep", "aycof", "xlcof", "con41", "x1mth2", "x7thm1",
    "gsto", "dedt", "didt", "domdt", "dnodt", "dmdt", "irez",
    "xlamo", "del1", "del2", "del3", "xfact",
    "d2201", "d2211", "d3210", "d3222", "d4410", "d4422",
    "d5220", "d5232", "d5421", "d5433",
    "zmos", "zmol",
    "se2", "se3", "si2", "si3", "sl2", "sl3", "sl4",
    "sgh2", "sgh3", "sgh4", "sh2", "sh3",
    "ee2", "e3", "xi2", "xi3", "xl2", "xl3", "xl4",
    "xgh2", "xgh3", "xgh4", "xh2", "xh3",
    "peo", "pinco", "plo", "pgho", "pho")

_GRAV_FIELDS = frozenset(("radiusearthkm", "xke", "j2", "j3oj2"))


def pack_scalar_sat(sat) -> Optional[np.ndarray]:
    """Pack an initialized ops.scalar.Sat into the native propagator's
    element vector; None when the native library is unavailable."""
    if get_lib() is None:
        return None
    vec = np.zeros(len(SCALAR_FIELDS), np.float64)
    grav = sat.whichconst
    deep = sat.method == "d"
    for i, name in enumerate(SCALAR_FIELDS):
        if name in _GRAV_FIELDS:
            vec[i] = getattr(grav, name)
        elif name == "deep":
            vec[i] = 1.0 if deep else 0.0
        else:
            src = sat.__dict__.get(name, sat.extra.get(name))
            if src is None and not deep:
                continue  # deep-only coefficient on a shallow sat
            vec[i] = float(src if src is not None else 0.0)
    return vec


def _get_ext():
    """Import the CPython extension module (fast per-call path),
    None if it failed to build."""
    global _EXT, _EXT_TRIED
    if _EXT is not None or _EXT_TRIED:
        return _EXT
    _EXT_TRIED = True
    if get_lib() is None or not os.path.exists(_EXT_SO):
        return None
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "astroz_tpu.native._astroz_scalar", _EXT_SO)
        _EXT = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_EXT)
    except Exception:
        _EXT = None
    return _EXT


_EXT = None
_EXT_TRIED = False


class ScalarEngine:
    """Per-satellite native scalar propagator handle (caches the packed
    vector; ~0.5 us/call through the CPython extension, ~4 us through
    the ctypes fallback, vs ~20 us for the pure-Python scalar path)."""

    __slots__ = ("_vec", "_vec_p", "_vec_addr", "_out", "_out_p", "_ext")

    def __init__(self, vec: np.ndarray):
        self._vec = np.ascontiguousarray(vec)
        self._vec_p = self._vec.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double))
        self._vec_addr = self._vec.ctypes.data
        self._out = np.zeros(6, np.float64)
        self._out_p = self._out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double))
        self._ext = _get_ext()

    def sgp4(self, tsince_min: float):
        """Returns (error, (rx, ry, rz), (vx, vy, vz))."""
        if self._ext is not None:
            return self._ext.propagate(self._vec_addr, tsince_min)
        e = _LIB.astroz_scalar_sgp4(self._vec_p, tsince_min, self._out_p)
        o = self._out
        return e, (o[0], o[1], o[2]), (o[3], o[4], o[5])

    def sgp4_array(self, tsince_min: np.ndarray):
        """Vectorized loop over a tsince array (one native crossing)."""
        t = np.ascontiguousarray(tsince_min, np.float64)
        n = t.shape[0]
        out = np.empty((n, 6), np.float64)
        err = np.empty(n, np.int32)
        _LIB.astroz_scalar_sgp4_array(
            self._vec_p, t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            err.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return err, out[:, :3], out[:, 3:]


def scalar_engine(sat) -> Optional[ScalarEngine]:
    """Build a native scalar engine for an initialized ops.scalar.Sat,
    or None when the native library is unavailable."""
    vec = pack_scalar_sat(sat)
    if vec is None:
        return None
    return ScalarEngine(vec)


def sgp4_grid(vecs: np.ndarray, tsince: np.ndarray
              ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(n_sats, n_times) grid in ONE native crossing.

    ``vecs`` is the packed element matrix ``(n_sats, len(SCALAR_FIELDS))``
    (rows from :func:`pack_scalar_sat`); ``tsince`` is ``(n_sats,
    n_times)`` minutes past each satellite's epoch. Returns ``(err, r,
    v)`` shaped ``(n_sats, n_times)`` / ``(n_sats, n_times, 3)`` — or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vecs = np.ascontiguousarray(vecs, np.float64)
    tsince = np.ascontiguousarray(tsince, np.float64)
    n_s, nf = vecs.shape
    n_t = tsince.shape[1]
    out = np.empty((n_s, n_t, 6), np.float64)
    err = np.empty((n_s, n_t), np.int32)
    n_env = int(os.environ.get("ASTROZ_NATIVE_THREADS", "0"))
    n_workers = n_env if n_env > 0 else min(os.cpu_count() or 1, n_s, 16)
    n_workers = min(n_workers, n_s)
    if n_workers > 1 and n_s * n_t >= 10_000:
        # thread over satellite ranges writing DISJOINT rows of the
        # shared buffers (ctypes releases the GIL) — the reference's
        # 16-thread batch-range loop, Constellation.zig:360-382
        from concurrent.futures import ThreadPoolExecutor
        bounds = np.linspace(0, n_s, n_workers + 1).astype(int)

        def run(k):
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            if lo == hi:
                return
            lib.astroz_sgp4_grid(
                vecs[lo:hi].ctypes.data_as(
                    ctypes.POINTER(ctypes.c_double)), hi - lo, nf,
                tsince[lo:hi].ctypes.data_as(
                    ctypes.POINTER(ctypes.c_double)), n_t,
                out[lo:hi].ctypes.data_as(
                    ctypes.POINTER(ctypes.c_double)),
                err[lo:hi].ctypes.data_as(ctypes.POINTER(ctypes.c_int)))

        with ThreadPoolExecutor(n_workers) as pool:
            list(pool.map(run, range(n_workers)))
    else:
        lib.astroz_sgp4_grid(
            vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_s,
            nf, tsince.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n_t, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            err.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    # r/v are views into the interleaved native buffer: no copies, so
    # peak memory stays ~one result-sized buffer
    return err, out[:, :, :3], out[:, :, 3:]


def sat_core(sat, jdsatepoch: float, jdsatepochF: float):
    """Build a `_astroz_scalar.SatCore` — the all-C per-call propagator
    (tsince computation + propagate + result tuple in one C round trip;
    reference: satrec.zig:169-201). Returns None when the CPython
    extension is unavailable (ctypes ScalarEngine is the fallback).
    The core COPIES the element vector, so nothing needs keeping alive.
    """
    ext = _get_ext()
    if ext is None or not hasattr(ext, "SatCore"):
        return None
    vec = pack_scalar_sat(sat)
    if vec is None:
        return None
    vec = np.ascontiguousarray(vec)
    return ext.SatCore(vec.ctypes.data, vec.shape[0],
                       float(jdsatepoch), float(jdsatepochF))
