"""SDP4 deep-space golden-vector validation.

Golden data are python-sgp4 values for three resonance regimes, as
recorded in the reference's test suite (src/Sdp4.zig:1421-1588).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astroz_tpu.constants import WGS72
from astroz_tpu.ops.sgp4 import sgp4_init
from astroz_tpu.ops.sdp4 import (fresh_carry, sdp4_init, sdp4_propagate,
                                 sdp4_propagate_scan)
from astroz_tpu.tle import TleArrays, parse_lines

GPS_L1 = "1 20413U 90005A   24186.00000000  .00000012  00000+0  10000-3 0  9992"
GPS_L2 = "2 20413  55.4408  61.4858 0112981 129.5765 231.5553  2.00561730104446"
GEO_L1 = "1 28626U 05004A   24186.00000000 -.00000098  00000+0  00000+0 0  9998"
GEO_L2 = "2 28626   0.0163 279.8379 0003069  20.3251 343.1766  1.00270142 70992"
HEO_L1 = "1 09880U 77021B   24186.00000000  .00000023  00000+0  00000+0 0  9999"
HEO_L2 = "2 09880  63.4300  75.8891 7318036 269.8735  16.7549  2.00611684 54321"


def init_pair(line1, line2, grav=WGS72):
    t = parse_lines(line1, line2)
    els = sgp4_init(grav, no_kozai=t.no_kozai, ecco=t.ecco, inclo=t.inclo,
                    nodeo=t.nodeo, argpo=t.argpo, mo=t.mo, bstar=t.bstar,
                    epoch_jd=t.epoch_jd)
    deep = sdp4_init(grav, els)
    return els, deep


def test_init_gps_20413():
    """irez=0 init coefficients (Sdp4.zig:1421-1447)."""
    els, deep = init_pair(GPS_L1, GPS_L2)
    assert bool(els.is_deep)
    assert abs(float(els.no_unkozai) - 0.0087511706) < 1e-8
    assert abs(float(els.a) - 4.1643039044) < 1e-6
    assert int(deep.irez) == 0
    assert abs(float(els.gsto) - 4.9305096469) < 1e-6
    assert abs(float(deep.zmos) - 3.1269253661) < 1e-6
    assert abs(float(deep.zmol) - 1.2769002197) < 1e-6
    assert abs(float(deep.se2) - 7.4611141471e-05) < 1e-12
    assert abs(float(deep.se3) - (-2.6550152994e-05)) < 1e-12
    assert abs(float(deep.dedt) - (-1.3083083111e-10)) < 1e-17
    assert abs(float(deep.dnodt) - (-1.9461479899e-08)) < 1e-15


def test_init_geo_28626():
    """irez=1 (geosynchronous) del coefficients (Sdp4.zig:1450-1465)."""
    els, deep = init_pair(GEO_L1, GEO_L2)
    assert int(deep.irez) == 1
    assert abs(float(els.no_unkozai) - 0.0043749477) < 1e-8
    assert abs(float(deep.del1) - (-6.3971905151e-13)) < 1e-20
    assert abs(float(deep.del2) - 1.4103492854e-11) < 1e-18
    assert abs(float(deep.del3) - 1.9783801291e-12) < 1e-19


def test_init_heo_09880():
    """irez=2 (half-day) D coefficients (Sdp4.zig:1467-1479)."""
    els, deep = init_pair(HEO_L1, HEO_L2)
    assert int(deep.irez) == 2
    assert abs(float(els.no_unkozai) - 0.0087538538) < 1e-8
    assert abs(float(deep.d2201) - (-1.2912381830e-11)) < 1e-18
    assert abs(float(deep.d2211) - 8.0024701733e-11) < 1e-18


def _propagate(els, deep, t):
    r, v, err, _ = sdp4_propagate(els, deep, t, WGS72)
    return np.asarray(r), np.asarray(v), np.asarray(err)


def test_propagate_gps_20413():
    """Trajectory goldens at t=0/720/1440 (Sdp4.zig:1482-1516)."""
    els, deep = init_pair(GPS_L1, GPS_L2)
    r, v, err = _propagate(els, deep, 0.0)
    assert err == 0
    np.testing.assert_allclose(
        r, [12743.39105131, 23518.44806062, 28.23195962], atol=0.01)
    np.testing.assert_allclose(
        v, [-1.93584727, 1.00575086, 3.16821707], atol=1e-5)
    r, v, err = _propagate(els, deep, 720.0)
    np.testing.assert_allclose(
        r, [12513.21380970, 23633.30126287, 414.75154681], atol=0.01)
    r, v, err = _propagate(els, deep, 1440.0)
    np.testing.assert_allclose(
        r, [12279.27857794, 23740.96214221, 801.15912584], atol=0.01)


def test_propagate_geo_28626():
    """GEO trajectory incl. Lyddane low-inclination path
    (Sdp4.zig:1519-1540)."""
    els, deep = init_pair(GEO_L1, GEO_L2)
    r, v, err = _propagate(els, deep, 0.0)
    assert err == 0
    np.testing.assert_allclose(
        r, [9727.65902952, -41014.43193269, -9.39974955], atol=0.01)
    np.testing.assert_allclose(
        v, [2.99252607, 0.71003488, 0.00039212], atol=1e-5)
    r, v, err = _propagate(els, deep, 1440.0)
    np.testing.assert_allclose(r[:2], [10430.11028794, -40841.32649665],
                               atol=0.01)


def test_propagate_heo_09880():
    """Half-day resonance trajectory (Sdp4.zig:1543-1563)."""
    els, deep = init_pair(HEO_L1, HEO_L2)
    r, v, err = _propagate(els, deep, 0.0)
    assert err == 0
    np.testing.assert_allclose(
        r, [2575.93297901, 13237.27540045, 1419.07364030], atol=0.01)
    np.testing.assert_allclose(
        v, [-1.59368245, 3.99224937, 5.03078896], atol=1e-5)
    r, v, err = _propagate(els, deep, 1440.0)
    np.testing.assert_allclose(
        r, [2175.00194988, 14214.96552375, 2741.44350110], atol=0.01)


def test_batched_grid_matches_scalar():
    """Dense (n_times, n_sats) mixed grid == per-(sat,time) calls —
    the analogue of Sdp4Batch.zig:564-601 mixed-irez equivalence."""
    tles = [(GPS_L1, GPS_L2), (GEO_L1, GEO_L2), (HEO_L1, HEO_L2)]
    parsed = [parse_lines(*t) for t in tles]
    arrs = TleArrays.from_tles(parsed)
    els = sgp4_init(WGS72, no_kozai=arrs.no_kozai, ecco=arrs.ecco,
                    inclo=arrs.inclo, nodeo=arrs.nodeo, argpo=arrs.argpo,
                    mo=arrs.mo, bstar=arrs.bstar, epoch_jd=arrs.epoch_jd)
    deep = sdp4_init(WGS72, els)
    times = jnp.asarray([0.0, 360.0, 720.0, 1440.0])
    r, v, err, _ = sdp4_propagate(els, deep, times[:, None], WGS72)
    assert r.shape == (4, 3, 3)
    assert np.all(np.asarray(err) == 0)
    for s, (l1, l2) in enumerate(tles):
        e1, d1 = init_pair(l1, l2)
        for i, t in enumerate(times):
            r1, v1, _ = _propagate(e1, d1, float(t))
            np.testing.assert_allclose(np.asarray(r[i, s]), r1, atol=1e-9)


def test_mixed_catalog_near_earth_lanes_exact():
    """Near-earth sats through the unified kernel == pure SGP4 path."""
    from astroz_tpu.ops.sgp4 import sgp4_propagate
    ISS_L1 = ("1 25544U 98067A   24127.82853009  .00015698  00000+0"
              "  27310-3 0  9995")
    ISS_L2 = ("2 25544  51.6393 160.4574 0003580 140.6673 205.7250 "
              "15.50957674452123")
    parsed = [parse_lines(ISS_L1, ISS_L2), parse_lines(GEO_L1, GEO_L2)]
    arrs = TleArrays.from_tles(parsed)
    els = sgp4_init(WGS72, no_kozai=arrs.no_kozai, ecco=arrs.ecco,
                    inclo=arrs.inclo, nodeo=arrs.nodeo, argpo=arrs.argpo,
                    mo=arrs.mo, bstar=arrs.bstar, epoch_jd=arrs.epoch_jd)
    deep = sdp4_init(WGS72, els)
    times = jnp.asarray([0.0, 60.0, 720.0, 1440.0])
    r, v, err, _ = sdp4_propagate(els, deep, times[:, None], WGS72)
    # lane 0 (ISS) must match the near-earth-only kernel to fp roundoff
    iss = parse_lines(ISS_L1, ISS_L2)
    els1 = sgp4_init(WGS72, no_kozai=iss.no_kozai, ecco=iss.ecco,
                     inclo=iss.inclo, nodeo=iss.nodeo, argpo=iss.argpo,
                     mo=iss.mo, bstar=iss.bstar, epoch_jd=iss.epoch_jd)
    r1, v1, err1 = sgp4_propagate(els1, times[:, None], WGS72)
    np.testing.assert_allclose(np.asarray(r[:, 0]),
                               np.asarray(r1[:, 0]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v[:, 0]),
                               np.asarray(v1[:, 0]), atol=1e-12)


def test_scan_carry_matches_stateless():
    """Carry-vs-fresh convergence (Sdp4Batch.zig:603-629): scanning a
    sorted time grid with a threaded carry must equal fresh restarts."""
    tles = [(GPS_L1, GPS_L2), (GEO_L1, GEO_L2), (HEO_L1, HEO_L2)]
    parsed = [parse_lines(*t) for t in tles]
    arrs = TleArrays.from_tles(parsed)
    els = sgp4_init(WGS72, no_kozai=arrs.no_kozai, ecco=arrs.ecco,
                    inclo=arrs.inclo, nodeo=arrs.nodeo, argpo=arrs.argpo,
                    mo=arrs.mo, bstar=arrs.bstar, epoch_jd=arrs.epoch_jd)
    deep = sdp4_init(WGS72, els)
    times = jnp.asarray([0.0, 180.0, 360.0, 720.0, 1440.0, 2880.0])
    r_scan, v_scan, err_scan = sdp4_propagate_scan(els, deep, times, WGS72)
    r_flat, v_flat, err_flat, _ = sdp4_propagate(
        els, deep, times[:, None], WGS72)
    np.testing.assert_allclose(np.asarray(r_scan), np.asarray(r_flat),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_scan), np.asarray(v_flat),
                               atol=1e-9)


def test_jit_and_carry_roundtrip():
    els, deep = init_pair(HEO_L1, HEO_L2)
    f = jax.jit(lambda e, d, t, c: sdp4_propagate(e, d, t, WGS72, carry=c))
    c = fresh_carry(deep, els.no_unkozai)
    r1, v1, e1, c = f(els, deep, jnp.asarray(720.0), c)
    r2, v2, e2, c = f(els, deep, jnp.asarray(1440.0), c)
    np.testing.assert_allclose(
        np.asarray(r2), [2175.00194988, 14214.96552375, 2741.44350110],
        atol=0.01)
