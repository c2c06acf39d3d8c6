"""Standalone C ABI (native/c_api.cpp) vs the Python implementations.

The C API mirrors the reference's src/c_api/root.zig:13-79 surface with
identical error-code values (error.zig); these tests gate it against
the package's own Python paths: tle.iter_tles for parsing,
ops.scalar.sgp4init/sgp4 for init+propagate (the C++ init is a
translation of that code), calculations/frames/time for the orbital
and coordinate helpers.
"""

import ctypes
import math

import numpy as np
import pytest

from astroz_tpu import native

from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2
from test_sdp4 import GPS_L1, GPS_L2, GEO_L1, GEO_L2, HEO_L1, HEO_L2

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class HohmannResult(ctypes.Structure):
    _fields_ = [("semi_major_axis", ctypes.c_double),
                ("delta_v1", ctypes.c_double),
                ("delta_v2", ctypes.c_double),
                ("total_delta_v", ctypes.c_double),
                ("transfer_time", ctypes.c_double),
                ("transfer_time_days", ctypes.c_double)]


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    assert lib is not None
    lib.astroz_version.restype = ctypes.c_uint
    lib.tle_parse.restype = ctypes.c_int
    lib.tle_parse.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_void_p)]
    lib.tle_free.argtypes = [ctypes.c_void_p]
    lib.tle_get_satellite_number.restype = ctypes.c_uint
    lib.tle_get_satellite_number.argtypes = [ctypes.c_void_p]
    for f in ("tle_get_epoch", "tle_get_inclination",
              "tle_get_eccentricity", "tle_get_mean_motion"):
        getattr(lib, f).restype = ctypes.c_double
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.sgp4_init.restype = ctypes.c_int
    lib.sgp4_init.argtypes = [ctypes.c_void_p, ctypes.c_int,
                              ctypes.POINTER(ctypes.c_void_p)]
    lib.sgp4_free.argtypes = [ctypes.c_void_p]
    lib.sgp4_propagate.restype = ctypes.c_int
    lib.sgp4_propagate.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                   ctypes.POINTER(ctypes.c_double),
                                   ctypes.POINTER(ctypes.c_double)]
    lib.sgp4_propagate_batch.restype = ctypes.c_int
    lib.sgp4_propagate_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_uint]
    lib.orbital_hohmann.restype = ctypes.c_int
    lib.orbital_hohmann.argtypes = [ctypes.c_double, ctypes.c_double,
                                    ctypes.c_double,
                                    ctypes.POINTER(HohmannResult)]
    for f in ("orbital_velocity", "orbital_period",
              "orbital_escape_velocity"):
        getattr(lib, f).restype = ctypes.c_double
        getattr(lib, f).argtypes = [ctypes.c_double] * (
            3 if f == "orbital_velocity" else 2)
    lib.coords_eci_to_ecef.argtypes = [ctypes.POINTER(ctypes.c_double),
                                       ctypes.c_double,
                                       ctypes.POINTER(ctypes.c_double)]
    lib.coords_ecef_to_geodetic.argtypes = [ctypes.POINTER(ctypes.c_double),
                                            ctypes.POINTER(ctypes.c_double)]
    lib.coords_julian_to_gmst.restype = ctypes.c_double
    lib.coords_julian_to_gmst.argtypes = [ctypes.c_double]
    return lib


def _parse(lib, l1, l2):
    h = ctypes.c_void_p()
    code = lib.tle_parse(f"{l1}\n{l2}".encode(), ctypes.byref(h))
    assert code == 0
    return h


def _sgp4_init(lib, tle_h, grav=0):
    h = ctypes.c_void_p()
    code = lib.sgp4_init(tle_h, grav, ctypes.byref(h))
    assert code == 0
    return h


def test_version(lib):
    v = lib.astroz_version()
    assert (v >> 16, (v >> 8) & 0xFF, v & 0xFF) == (0, 1, 0)


def test_tle_parse_and_getters(lib):
    from astroz_tpu.tle import iter_tles
    tle = next(iter_tles(f"{ISS_L1}\n{ISS_L2}"))
    h = _parse(lib, ISS_L1, ISS_L2)
    try:
        assert lib.tle_get_satellite_number(h) == tle.satnum == 25544
        epoch_j2000_s = (tle.epoch_jd - 2451545.0) * 86400.0
        assert lib.tle_get_epoch(h) == pytest.approx(epoch_j2000_s)
        assert lib.tle_get_inclination(h) == pytest.approx(
            math.degrees(tle.inclo))
        assert lib.tle_get_eccentricity(h) == pytest.approx(tle.ecco)
        assert lib.tle_get_mean_motion(h) == pytest.approx(
            tle.no_kozai * 1440.0 / (2.0 * math.pi))
    finally:
        lib.tle_free(h)


def test_tle_parse_bad_input(lib):
    h = ctypes.c_void_p()
    assert lib.tle_parse(b"not a tle", ctypes.byref(h)) == -1
    assert lib.tle_parse(b"1 short\n2 short", ctypes.byref(h)) == -1


@pytest.mark.parametrize("l1,l2,grav", [
    (ISS_L1, ISS_L2, 0), (TRAJ_L1, TRAJ_L2, 1),
    (GPS_L1, GPS_L2, 1), (GEO_L1, GEO_L2, 1), (HEO_L1, HEO_L2, 1),
])
def test_propagate_matches_python_scalar(lib, l1, l2, grav):
    """C-API init+propagate == ops.scalar (which is itself gated
    against tcppver goldens and the live python-sgp4). Deep-space
    lines (GPS/GEO/HEO) exercise the SDP4 path the reference's C API
    refuses (sgp4.zig error -10)."""
    from astroz_tpu.ops import scalar as sc
    from astroz_tpu.tle import iter_tles

    tle = next(iter_tles(f"{l1}\n{l2}"))
    sat = sc.sgp4init(sc.wgs72() if grav else sc.wgs84(), tle.epoch_jd,
                      tle.bstar, tle.ecco, tle.argpo, tle.inclo, tle.mo,
                      tle.no_kozai, tle.nodeo)

    th = _parse(lib, l1, l2)
    sh = _sgp4_init(lib, th, grav)
    pos = (ctypes.c_double * 3)()
    vel = (ctypes.c_double * 3)()
    try:
        for t in np.linspace(-720.0, 2880.0, 31):
            code = lib.sgp4_propagate(sh, float(t), pos, vel)
            e, r, v = sc.sgp4(sat, float(t))
            assert (code == 0) == (e == 0)
            if e == 0:
                for a, b in zip(list(pos) + list(vel), list(r) + list(v)):
                    assert abs(a - b) < 1e-9, (a, b, t)
    finally:
        lib.sgp4_free(sh)
        lib.tle_free(th)


def test_propagate_batch(lib):
    th = _parse(lib, ISS_L1, ISS_L2)
    sh = _sgp4_init(lib, th, 0)
    n = 17
    times = (ctypes.c_double * n)(*np.linspace(0.0, 360.0, n))
    results = (ctypes.c_double * (6 * n))()
    pos = (ctypes.c_double * 3)()
    vel = (ctypes.c_double * 3)()
    try:
        assert lib.sgp4_propagate_batch(sh, times, results, n) == 0
        for i in range(n):
            lib.sgp4_propagate(sh, times[i], pos, vel)
            # the batch rides the 8-wide SIMD block path, whose FMA
            # contraction differs from the scalar path by ~1 ulp —
            # gated at the documented 1e-9 km SIMD-vs-scalar contract
            for a, b in zip(results[6 * i:6 * i + 3], pos):
                assert abs(a - b) < 1e-9, (a, b, i)
            for a, b in zip(results[6 * i + 3:6 * i + 6], vel):
                assert abs(a - b) < 1e-9, (a, b, i)
    finally:
        lib.sgp4_free(sh)
        lib.tle_free(th)


def test_hohmann_matches_python(lib):
    from astroz_tpu.calculations import hohmann_transfer
    mu = 398600.4418
    r1, r2 = 6678.0, 42164.0
    out = HohmannResult()
    assert lib.orbital_hohmann(mu, r1, r2, ctypes.byref(out)) == 0
    dv1, dv2, tot, t = (float(x) for x in hohmann_transfer(r1, r2, mu))
    assert out.delta_v1 == pytest.approx(dv1, rel=1e-12)
    assert out.delta_v2 == pytest.approx(dv2, rel=1e-12)
    assert out.total_delta_v == pytest.approx(tot, rel=1e-12)
    assert out.transfer_time == pytest.approx(t, rel=1e-12)
    assert out.transfer_time_days == pytest.approx(t / 86400.0, rel=1e-12)
    assert out.semi_major_axis == pytest.approx(0.5 * (r1 + r2))
    # value errors match the reference guards (orbital_mechanics.zig:18-20)
    assert lib.orbital_hohmann(mu, -1.0, r2, ctypes.byref(out)) == -20
    assert lib.orbital_hohmann(mu, r1, r1 + 500.0, ctypes.byref(out)) == -20


def test_orbital_scalars(lib):
    mu = 398600.4418
    assert lib.orbital_velocity(mu, 7000.0, 7000.0) == pytest.approx(
        math.sqrt(mu / 7000.0))
    assert lib.orbital_period(mu, 42164.0) == pytest.approx(
        2 * math.pi * math.sqrt(42164.0 ** 3 / mu))
    assert lib.orbital_escape_velocity(mu, 6378.137) == pytest.approx(
        math.sqrt(2 * mu / 6378.137))
    assert lib.orbital_velocity(mu, -1.0, 7000.0) == -1.0
    assert lib.orbital_period(mu, 0.0) == -1.0


def test_coords_match_python(lib):
    from astroz_tpu.frames import ecef_to_geodetic_deg, teme_to_ecef
    from astroz_tpu.time import gstime_scalar

    eci = (ctypes.c_double * 3)(6524.834, 6862.875, 6448.296)
    out = (ctypes.c_double * 3)()
    gmst = 1.2345
    lib.coords_eci_to_ecef(eci, gmst, out)
    ref = np.asarray(teme_to_ecef(np.array(list(eci)), gmst))
    np.testing.assert_allclose(list(out), ref, rtol=1e-12)

    lla = (ctypes.c_double * 3)()
    lib.coords_ecef_to_geodetic(out, lla)
    ref_lla = np.asarray(ecef_to_geodetic_deg(np.array(list(out))))
    np.testing.assert_allclose(list(lla), ref_lla, rtol=0, atol=1e-6)

    jd = 2460310.5
    # 1e-9 rad: the Python gstime reduces the polynomial in a
    # different association order (7e-12 rad apart at J2024)
    assert lib.coords_julian_to_gmst(jd) == pytest.approx(
        float(gstime_scalar(jd)), abs=1e-9)


def test_c_init_matches_python_pack_fuzz(lib):
    """The C++ sgp4_init writes the same packed element vector as
    Python sgp4init + pack_scalar_sat, across random synthetic TLEs in
    all regimes (the init translation's ULP-level gate)."""
    from astroz_tpu.ops import scalar as sc
    from astroz_tpu.tle import iter_tles
    from test_screening import synthetic_leo_text

    # mixed real lines + synthetic LEO catalog
    text = "\n".join([ISS_L1, ISS_L2, GPS_L1, GPS_L2, GEO_L1, GEO_L2,
                      HEO_L1, HEO_L2, synthetic_leo_text(30)])
    pos = (ctypes.c_double * 3)()
    vel = (ctypes.c_double * 3)()
    n_checked = 0
    for tle in iter_tles(text):
        l1, l2 = tle.line1, tle.line2
        sat = sc.sgp4init(sc.wgs84(), tle.epoch_jd, tle.bstar, tle.ecco,
                          tle.argpo, tle.inclo, tle.mo, tle.no_kozai,
                          tle.nodeo)
        th = _parse(lib, l1, l2)
        sh = _sgp4_init(lib, th, 0)
        try:
            for t in (0.0, 437.5, 1440.0):
                code = lib.sgp4_propagate(sh, t, pos, vel)
                e, r, v = sc.sgp4(sat, t)
                assert (code == 0) == (e == 0)
                if e == 0:
                    for a, b in zip(list(pos) + list(vel),
                                    list(r) + list(v)):
                        assert abs(a - b) < 1e-9
            n_checked += 1
        finally:
            lib.sgp4_free(sh)
            lib.tle_free(th)
    assert n_checked >= 30


def test_c_consumer_compiles_and_runs(lib, tmp_path):
    """Compile a real C program against astroz_c.h and run it linked
    to libastroz_native.so — proves the ABI from C, not just ctypes."""
    import os
    import subprocess

    import astroz_tpu.native as nat

    src = tmp_path / "demo.c"
    src.write_text(r'''
#include <stdio.h>
#include <math.h>
#include "astroz_c.h"

int main(void) {
    astroz_init();
    if (astroz_version() != ((0u<<16)|(1u<<8)|0u)) return 1;
    void *tle = 0, *sat = 0;
    const char *lines =
      "1 25544U 98067A   24001.50000000  .00016717  00000-0"
      "  10270-3 0  9993\n"
      "2 25544  51.6400 200.0000 0001234  90.0000 270.0000 "
      "15.50000000000017";
    if (tle_parse(lines, &tle) != ASTROZ_OK) return 2;
    if (tle_get_satellite_number(tle) != 25544u) return 3;
    if (sgp4_init(tle, 0, &sat) != ASTROZ_OK) return 4;
    double pos[3], vel[3];
    if (sgp4_propagate(sat, 360.0, pos, vel) != ASTROZ_OK) return 5;
    double r = sqrt(pos[0]*pos[0] + pos[1]*pos[1] + pos[2]*pos[2]);
    if (!(r > 6500.0 && r < 7100.0)) return 6;
    printf("%.6f %.6f %.6f\n", pos[0], pos[1], pos[2]);
    sgp4_free(sat);
    tle_free(tle);
    astroz_deinit();
    return 0;
}
''')
    nat_dir = os.path.dirname(os.path.abspath(nat.__file__))
    exe = tmp_path / "demo"
    subprocess.run(
        ["gcc", str(src), f"-I{nat_dir}", f"-L{nat_dir}",
         "-lastroz_native", f"-Wl,-rpath,{nat_dir}", "-lm",
         "-o", str(exe)], check=True, capture_output=True, timeout=60)
    out = subprocess.run([str(exe)], check=True, capture_output=True,
                         timeout=30, text=True)
    assert len(out.stdout.split()) == 3
