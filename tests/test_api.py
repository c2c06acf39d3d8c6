"""python-sgp4 drop-in API surface tests.

The reference CI asserts astroz.api vs sgp4.api position parity < 1 mm
(ci.yaml:101-153); the sgp4 package is not installed here, so parity is
asserted against the python-sgp4 golden trajectory recorded in
tests/test_sgp4.py and against the internal catalog path.
"""

import numpy as np
import pytest

from astroz_tpu.api import (Satrec, SatrecArray, WGS72, WGS84, days2mdhms,
                            jday)

from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2, TRAJ_REF
from test_sdp4 import GEO_L1, GEO_L2


def test_jday_matches_python_sgp4_convention():
    jd, fr = jday(2024, 1, 1, 12, 0, 0.0)
    assert jd == 2460310.5
    assert fr == 0.5


def test_days2mdhms():
    mon, day, hr, minute, sec = days2mdhms(2024, 127.82853009)
    assert (mon, day) == (5, 6)
    assert hr == 19
    assert minute == 53
    assert abs(sec - 4.999776) < 1e-3


def test_twoline2rv_properties():
    sat = Satrec.twoline2rv(ISS_L1, ISS_L2, WGS84)
    assert sat.satnum == 25544
    assert abs(sat.no_kozai - 0.06767329492593213) < 1e-14
    assert abs(sat.ecco - 0.0003580) < 1e-12
    assert sat.epochyr == 24
    assert not sat.is_deep_space
    assert sat.method == "n"
    assert sat.error == 0
    assert sat.classification == "U"
    assert sat.intldesg == "98067A"


def test_sgp4_golden_trajectory():
    sat = Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72)
    for t_min, r_ref, v_ref in TRAJ_REF:
        jd = sat.jdsatepoch
        fr = sat.jdsatepochF + t_min / 1440.0
        e, r, v = sat.sgp4(jd, fr)
        assert e == 0
        assert np.linalg.norm(np.subtract(r, r_ref)) < 0.1
        assert np.linalg.norm(np.subtract(v, v_ref)) < 1e-4
        assert abs(sat.t - t_min) < 1e-9


def test_sgp4_tsince():
    sat = Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72)
    e, r, v = sat.sgp4_tsince(360.0)
    assert e == 0
    assert np.linalg.norm(np.subtract(r, TRAJ_REF[6][1])) < 0.1


def test_sgp4_array_single_sat():
    sat = Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72)
    times = np.array([row[0] for row in TRAJ_REF])
    jd = np.full_like(times, sat.jdsatepoch)
    fr = sat.jdsatepochF + times / 1440.0
    e, r, v = sat.sgp4_array(jd, fr)
    assert r.shape == (len(times), 3)
    for i, (_, r_ref, _) in enumerate(TRAJ_REF):
        assert np.linalg.norm(r[i] - r_ref) < 0.1


def test_satrec_array_mixed():
    sats = [Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72),
            Satrec.twoline2rv(GEO_L1, GEO_L2, WGS72)]
    arr = SatrecArray(sats)
    times = np.array([0.0, 360.0, 720.0])
    jd = np.full_like(times, sats[0].jdsatepoch)
    fr = sats[0].jdsatepochF + times / 1440.0
    e, r, v = arr.sgp4(jd, fr)
    assert e.shape == (2, 3)
    assert r.shape == (2, 3, 3)
    assert np.all(e == 0)
    # ISS row matches goldens (fast path: 100 m budget)
    assert np.linalg.norm(r[0, 0] - TRAJ_REF[0][1]) < 0.1
    assert np.linalg.norm(r[0, 1] - TRAJ_REF[6][1]) < 0.1
    # GEO row at geostationary radius
    assert 42000 < np.linalg.norm(r[1, 0]) < 42400
    # velocities=False fast path
    e2, r2 = arr.sgp4(jd, fr, velocities=False)
    np.testing.assert_allclose(r2, r, atol=1e-9)


def test_sgp4init_elementwise():
    sat_tle = Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72)
    epoch_1949 = sat_tle.jdsatepoch + sat_tle.jdsatepochF - 2433281.5
    # python-sgp4 idiom: construct, then initialize in place
    sat = Satrec()
    ret = sat.sgp4init(
        WGS72, "i", 25544, epoch_1949, sat_tle.bstar, 0.0, 0.0,
        sat_tle.ecco, sat_tle.argpo, sat_tle.inclo, sat_tle.mo,
        sat_tle.no_kozai, sat_tle.nodeo)
    assert ret is sat
    assert sat.error == 0
    jd, fr = sat_tle.jdsatepoch, sat_tle.jdsatepochF + 0.25
    e1, r1, v1 = sat_tle.sgp4(jd, fr)
    e2, r2, v2 = sat.sgp4(jd, fr)
    assert np.linalg.norm(np.subtract(r1, r2)) < 1e-6


def test_sgp4init_after_sgp4_rebinds_core():
    """An in-place ``sgp4init`` AFTER a propagate call must drop the
    lazily-bound native scalar core (which owns a copy of the OLD
    element vector and shadows ``sgp4`` as an instance attribute) —
    otherwise subsequent calls keep answering with the old orbit."""
    sat = Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72)
    jd, fr = sat.jdsatepoch, sat.jdsatepochF
    e1, r1, v1 = sat.sgp4(jd, fr)  # binds the native core
    assert e1 == 0
    assert np.linalg.norm(r1) < 8000  # LEO
    # re-init in place with a geosynchronous orbit
    epoch_1949 = jd + fr - 2433281.5
    sat.sgp4init(WGS72, "i", 99999, epoch_1949, 0.0, 0.0, 0.0,
                 2e-4, 1.0, 0.01, 2.0, 0.004375, 1.0)
    e2, r2, v2 = sat.sgp4(jd, fr)
    assert e2 == 0
    assert np.linalg.norm(r2) > 40000, "stale pre-init elements served"
    # the rebound fast path (2nd call after re-init) must agree
    e3, r3, v3 = sat.sgp4(jd, fr)
    np.testing.assert_allclose(r3, r2, atol=1e-9)


def test_decay_error_code():
    l1 = "1 25544U 98067A   24001.50000000  .00016717  00000-0  99999+2 0  9999"
    sat = Satrec.twoline2rv(l1, TRAJ_L2, WGS72)
    e, r, v = sat.sgp4(sat.jdsatepoch + 1.0, sat.jdsatepochF)
    assert e != 0
    assert r == (0.0, 0.0, 0.0)


def test_python_sgp4_attribute_parity():
    """Attribute list from the reference's compat script
    (benchmarks/sgp4_compat_test.py:44-58)."""
    sat = Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72)
    for attr in ("satnum", "jdsatepoch", "jdsatepochF", "epochyr",
                 "epochdays", "ndot", "nddot", "bstar", "inclo", "nodeo",
                 "ecco", "argpo", "mo", "no_kozai", "no", "a", "alta",
                 "altp", "error", "t", "method", "operationmode",
                 "classification", "intldesg", "elnum", "revnum",
                 "ephtype", "gsto", "mdot", "argpdot", "nodedot"):
        assert hasattr(sat, attr), attr
        getattr(sat, attr)


def test_sgp4_array_large_lanes_path():
    """>= 4096 times takes the time-as-lanes layout; results must match
    the small-batch path exactly (same f64 kernel)."""
    sat = Satrec.twoline2rv(TRAJ_L1, TRAJ_L2, WGS72)
    n = 5000
    times = np.linspace(0.0, 1440.0, n)
    jd = np.full(n, sat.jdsatepoch)
    fr = sat.jdsatepochF + times / 1440.0
    e, r, v = sat.sgp4_array(jd, fr)
    assert r.shape == (n, 3) and np.all(e == 0)
    # spot-check against the small path
    e2, r2, v2 = sat.sgp4_array(jd[::100], fr[::100])
    np.testing.assert_allclose(r[::100], r2, atol=2e-6)

    # deep-space satellite through the lanes path
    from test_sdp4 import GEO_L1, GEO_L2
    g = Satrec.twoline2rv(GEO_L1, GEO_L2, WGS72)
    jd = np.full(4608, g.jdsatepoch)
    fr = g.jdsatepochF + np.linspace(0, 1, 4608)
    e, r, v = g.sgp4_array(jd, fr)
    assert np.all(e == 0)
    rn = np.linalg.norm(r, axis=-1)
    assert 42000 < rn.min() < rn.max() < 42400


def test_create_sgp4_propagator_astrojax_style():
    """Functional (params, propagate_fn) surface matching astrojax's
    API shape (reference benches astrojax, jax_cpu_bench.py:4) —
    jit/vmap-compatible and consistent with Satrec."""
    import jax
    import jax.numpy as jnp

    from astroz_tpu.api import Satrec, WGS72, create_sgp4_propagator
    from test_sgp4 import ISS_L1, ISS_L2

    params, fn = create_sgp4_propagator(ISS_L1, ISS_L2)
    t = jnp.linspace(0.0, 1440.0, 5)
    r, v = jax.jit(fn)(params, t)
    assert r.shape == (5, 3) and v.shape == (5, 3)

    sat = Satrec.twoline2rv(ISS_L1, ISS_L2, WGS72)
    _, r0, v0 = sat.sgp4_tsince(720.0)
    d = np.linalg.norm(np.asarray(r)[2] - np.asarray(r0))
    assert d < 1e-6, d  # both f64 paths; agreement to numerical noise


def test_satrec_array_sgp4_into():
    """Into-buffer parity path (reference satrec.zig:896-988)."""
    from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2
    from astroz_tpu.api import Satrec, SatrecArray

    sats = [Satrec.twoline2rv(ISS_L1, ISS_L2),
            Satrec.twoline2rv(TRAJ_L1, TRAJ_L2)]
    arr = SatrecArray(sats)
    jd = np.full(5, sats[0].jdsatepoch)
    fr = sats[0].jdsatepochF + np.linspace(0.0, 1.0, 5)
    e_ref, r_ref, v_ref = arr.sgp4(jd, fr)

    r_out = np.zeros((2, 5, 3))
    v_out = np.zeros((2, 5, 3))
    e_out = np.zeros((2, 5), np.int32)
    arr.sgp4_into(jd, fr, r_out, v_out, e_out)
    np.testing.assert_array_equal(r_out, r_ref)
    np.testing.assert_array_equal(v_out, v_ref)
    np.testing.assert_array_equal(e_out, e_ref)


def test_satrec_array_mixed_gravity_device_path(monkeypatch):
    """Mixed-gravity SatrecArrays must propagate each satellite under
    its OWN constants on the device path too (regression: the merged
    catalog applied satrecs[0]'s model to everyone). The native CPU
    path is disabled so the XLA group-wise branch is exercised."""
    import numpy as np

    from astroz_tpu.api import Satrec, SatrecArray, WGS72, WGS84, jday

    L1 = ("1 25544U 98067A   24127.82853009  .00015698  00000+0"
          "  27310-3 0  9995")
    L2 = ("2 25544  51.6393 160.4574 0003580 140.6673 205.7250 "
          "15.50957674452123")
    s72 = Satrec.twoline2rv(L1, L2, WGS72)
    s84 = Satrec.twoline2rv(L1, L2, WGS84)
    arr = SatrecArray([s72, s84])
    assert arr._grav_groups is not None

    monkeypatch.setattr(SatrecArray, "_sgp4_native",
                        lambda self, jd, fr: None)
    jd0, fr0 = jday(2024, 5, 7, 0, 0, 0.0)
    jds = np.full(5, jd0)
    frs = fr0 + np.arange(5) / 48.0
    e, r, v = arr.sgp4(jds, frs)
    assert not e.any()
    # row 0 must match a pure-WGS72 array, row 1 a pure-WGS84 one
    e72, r72, _ = SatrecArray([s72]).sgp4(jds, frs)
    e84, r84, _ = SatrecArray([s84]).sgp4(jds, frs)
    np.testing.assert_allclose(r[0], r72[0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(r[1], r84[0], rtol=0, atol=1e-6)
    # and the two models genuinely differ (sanity that the test bites)
    assert np.abs(r[0] - r[1]).max() > 1e-3
