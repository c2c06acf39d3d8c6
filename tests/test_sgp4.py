"""SGP4 golden-vector validation.

Golden data are published python-sgp4 / Vallado AIAA 2006-6753 values, as
recorded in the reference's test suite (src/Sgp4.zig:906-948,
src/validation_tests.zig:331-374, src/Sgp4Batch.zig:235-297).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astroz_tpu.constants import WGS72, WGS84
from astroz_tpu.ops.sgp4 import sgp4_init, sgp4_propagate
from astroz_tpu.tle import TleArrays, parse_lines

ISS_L1 = "1 25544U 98067A   24127.82853009  .00015698  00000+0  27310-3 0  9995"
ISS_L2 = "2 25544  51.6393 160.4574 0003580 140.6673 205.7250 15.50957674452123"

# python-sgp4 v2.25 reference trajectory (validation_tests.zig:331-349)
TRAJ_L1 = "1 25544U 98067A   24001.50000000  .00016717  00000-0  10270-3 0  9993"
TRAJ_L2 = "2 25544  51.6400 200.0000 0001234  90.0000 270.0000 15.50000000000017"
TRAJ_REF = [
    (0.0, (-6388.6251039457, -2316.4105418668, -10.5105608841),
     (1.6184721938, -4.4688535806, 6.0095711744)),
    (30.0, (4120.4071597960, -2524.2256992174, 4767.3396263188),
     (5.7416339274, 4.3213445779, -2.6670882178)),
    (60.0, (2737.1301383237, 4555.4713955647, -4241.6250638171),
     (-6.7027938836, 0.6446517922, -3.6368442517)),
    (90.0, (-6553.5121437682, -1479.8966428166, -1028.6875809764),
     (0.1847982377, -4.8867524243, 5.8962546577)),
    (120.0, (3053.5363712212, -3227.0877061800, 5131.1902821670),
     (6.5442323039, 3.6613485711, -1.5875959823)),
    (180.0, (-6467.5318299250, -588.4786603082, -2008.8485417963),
     (-1.2580863427, -5.1084756785, 5.5652923317)),
    (360.0, (-5564.4087742750, 1216.0553986884, -3713.3763010911),
     (-3.9513152824, -4.9410186329, 4.3086655820)),
    (720.0, (-1479.3844792026, 3958.1883289274, -5328.0625952509),
     (-7.2451444567, -2.4477674475, 0.1933342585)),
    (1440.0, (6475.4254340451, 2031.6698883792, -355.1829280487),
     (-1.7172177336, 4.4491247647, -5.9962431939)),
]


def init_from_tle(line1, line2, grav):
    t = parse_lines(line1, line2)
    return sgp4_init(grav, no_kozai=t.no_kozai, ecco=t.ecco, inclo=t.inclo,
                     nodeo=t.nodeo, argpo=t.argpo, mo=t.mo, bstar=t.bstar,
                     epoch_jd=t.epoch_jd)


def test_init_coefficients_iss_wgs84():
    """Init coefficient parity with python-sgp4 (Sgp4.zig:920-924)."""
    els = init_from_tle(ISS_L1, ISS_L2, WGS84)
    assert abs(float(els.no_kozai) - 0.06767329492593213) < 1e-15
    assert abs(float(els.a) - 1.064977141044385) < 1e-12
    assert abs(float(els.mdot) - 0.067673302731475) < 1e-12
    assert abs(float(els.argpdot) - 0.000044767460455) < 1e-12
    assert abs(float(els.nodedot) - (-6.016088837547746e-05)) < 1e-12
    assert not bool(els.is_deep)
    assert int(els.error) == 0


def test_iss_t0_submeter():
    """t=0 state within 1 m / 10 mm/s of python-sgp4 (Sgp4.zig:930-947)."""
    els = init_from_tle(ISS_L1, ISS_L2, WGS84)
    r, v, err = sgp4_propagate(els, 0.0, WGS84)
    ref_r = np.array([-5887.061832, 3151.888264, -1263.887271])
    ref_v = np.array([-3.250642, -3.745001, 5.837125])
    assert int(err) == 0
    assert np.linalg.norm(np.asarray(r) - ref_r) < 0.001
    assert np.linalg.norm(np.asarray(v) - ref_v) < 0.00001


def test_trajectory_vs_python_sgp4():
    """9-epoch trajectory table to <100 m / <1e-4 km/s
    (validation_tests.zig:352-374)."""
    els = init_from_tle(TRAJ_L1, TRAJ_L2, WGS84)
    times = jnp.asarray([row[0] for row in TRAJ_REF])
    r, v, err = sgp4_propagate(els, times, WGS84)
    r = np.asarray(r)
    v = np.asarray(v)
    assert np.all(np.asarray(err) == 0)
    for i, (_, ref_r, ref_v) in enumerate(TRAJ_REF):
        np.testing.assert_allclose(r[i], ref_r, atol=0.1)
        np.testing.assert_allclose(v[i], ref_v, atol=1e-4)


def test_vallado_00005_wgs72():
    """Vallado AIAA 2006-6753 tcppver vectors, sat 00005
    (Sgp4Batch.zig:235-297)."""
    l1 = "1 00005U 58002B   00179.78495062  .00000023  00000-0  28098-4 0  4753"
    l2 = "2 00005  34.2682 348.7242 1859667 331.7664  19.3264 10.82419157413667"
    els = init_from_tle(l1, l2, WGS72)
    r0, v0, e0 = sgp4_propagate(els, 0.0, WGS72)
    np.testing.assert_allclose(
        np.asarray(r0), [7022.46529266, -1400.08296755, 0.03995155],
        atol=0.01)
    np.testing.assert_allclose(
        np.asarray(v0), [1.893841015, 6.405893759, 4.534807250], atol=1e-6)
    r360, v360, e360 = sgp4_propagate(els, 360.0, WGS72)
    np.testing.assert_allclose(
        np.asarray(r360), [-7154.03120202, -3783.17682504, -3536.19412294],
        atol=0.01)
    np.testing.assert_allclose(
        np.asarray(v360), [4.741887409, -4.151817765, -2.093935425],
        atol=1e-6)


def test_vallado_06251_wgs72():
    l1 = "1 06251U 62025E   06176.82412014  .00008885  00000-0  12808-3 0  3985"
    l2 = "2 06251  58.0579  54.0425 0030035 139.1568 221.1854 15.56387291  6774"
    els = init_from_tle(l1, l2, WGS72)
    r0, v0, e0 = sgp4_propagate(els, 0.0, WGS72)
    np.testing.assert_allclose(
        np.asarray(r0), [3988.31022699, 5498.96657235, 0.90055879],
        atol=0.01)
    np.testing.assert_allclose(
        np.asarray(v0), [-3.290032738, 2.357652820, 6.496623475], atol=1e-6)


def test_batched_matches_scalar():
    """Dense (n_times, n_sats) grid == per-time scalar calls — the analogue
    of the reference's SIMD-vs-scalar equivalence tests (Sgp4.zig:950-1020),
    here exact because it is the same code path."""
    tles = [(ISS_L1, ISS_L2), (TRAJ_L1, TRAJ_L2)]
    parsed = [parse_lines(*t) for t in tles]
    arrs = TleArrays.from_tles(parsed)
    els = sgp4_init(WGS84, no_kozai=arrs.no_kozai, ecco=arrs.ecco,
                    inclo=arrs.inclo, nodeo=arrs.nodeo, argpo=arrs.argpo,
                    mo=arrs.mo, bstar=arrs.bstar, epoch_jd=arrs.epoch_jd)
    times = jnp.asarray([0.0, 10.0, 60.0, 120.0, 360.0, 720.0, 1440.0])
    # dense grid: broadcast (n_times, 1) x (n_sats,)
    r, v, err = sgp4_propagate(els, times[:, None], WGS84)
    assert r.shape == (7, 2, 3)
    for s, (l1, l2) in enumerate(tles):
        els1 = init_from_tle(l1, l2, WGS84)
        for i, t in enumerate(times):
            r1, v1, _ = sgp4_propagate(els1, float(t), WGS84)
            np.testing.assert_allclose(np.asarray(r[i, s]),
                                       np.asarray(r1), atol=1e-9)


def test_jit_compiles():
    els = init_from_tle(ISS_L1, ISS_L2, WGS84)
    f = jax.jit(lambda e, t: sgp4_propagate(e, t, WGS84))
    r, v, err = f(els, jnp.asarray([0.0, 60.0]))
    assert r.shape == (2, 3)
    assert int(err[0]) == 0


def test_decayed_satellite_flags_error():
    """A huge-drag satellite must flag error 1/6 and zero-fill, not NaN."""
    t = parse_lines(ISS_L1, ISS_L2)
    els = sgp4_init(WGS84, no_kozai=t.no_kozai, ecco=t.ecco, inclo=t.inclo,
                    nodeo=t.nodeo, argpo=t.argpo, mo=t.mo, bstar=1.0,
                    epoch_jd=t.epoch_jd)
    r, v, err = sgp4_propagate(els, 14400.0, WGS84)
    assert int(err) != 0
    assert np.all(np.isfinite(np.asarray(r)))
    np.testing.assert_allclose(np.asarray(r), 0.0)
