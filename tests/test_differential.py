"""Differential validation sweeps against independent implementations.

Mirrors the reference's CI cross-check against the real python-sgp4
package (/root/reference/.github/workflows/ci.yaml:101-153 and
benchmarks/sgp4_compat_test.py): a broad randomized catalog covering
every regime (LEO, low-perigee isimp, near-180 inclination, GEO irez=1
incl. Lyddane, half-day irez=2, deep non-resonant), swept over +-1440
minutes, gated in meters.

Two oracles:

* ``tests/oracle_sgp4.py`` — an independent scalar numpy transcription
  of the published Vallado algorithm, itself validated against the
  hard-coded python-sgp4/Vallado goldens below. Always runs.
* the real ``sgp4`` package — used when installed (CI installs it;
  the offline dev sandbox may not have it): ``test_live_python_sgp4``.
"""

import math

import numpy as np
import pytest

from astroz_tpu.constants import TWO_PI, WGS72
from astroz_tpu.ops.sgp4 import sgp4_init
from astroz_tpu.ops.fast import propagate_fast
from astroz_tpu.propagation import catalog_from_elements, propagate_tsince
from astroz_tpu.tle import parse_lines

import oracle_sgp4 as oracle

EPOCH_JD = 2460310.5


# ---------------------------------------------------------------------------
# Oracle self-validation against the published golden vectors
# ---------------------------------------------------------------------------


GOLDENS = [
    # (line1, line2, grav, [(tsince, r_ref), ...])
    ("1 25544U 98067A   24127.82853009  .00015698  00000+0  27310-3 0  9995",
     "2 25544  51.6393 160.4574 0003580 140.6673 205.7250 15.50957674452123",
     "wgs84",
     [(0.0, (-5887.061832, 3151.888264, -1263.887271))]),
    ("1 00005U 58002B   00179.78495062  .00000023  00000-0  28098-4 0  4753",
     "2 00005  34.2682 348.7242 1859667 331.7664  19.3264 10.82419157413667",
     "wgs72",
     [(0.0, (7022.46529266, -1400.08296755, 0.03995155)),
      (360.0, (-7154.03120202, -3783.17682504, -3536.19412294))]),
    ("1 06251U 62025E   06176.82412014  .00008885  00000-0  12808-3 0  3985",
     "2 06251  58.0579  54.0425 0030035 139.1568 221.1854 15.56387291  6774",
     "wgs72",
     [(0.0, (3988.31022699, 5498.96657235, 0.90055879))]),
    ("1 20413U 90005A   24186.00000000  .00000012  00000+0  10000-3 0  9992",
     "2 20413  55.4408  61.4858 0112981 129.5765 231.5553  2.00561730104446",
     "wgs72",
     [(0.0, (12743.39105131, 23518.44806062, 28.23195962)),
      (720.0, (12513.21380970, 23633.30126287, 414.75154681)),
      (1440.0, (12279.27857794, 23740.96214221, 801.15912584))]),
    ("1 28626U 05004A   24186.00000000 -.00000098  00000+0  00000+0 0  9998",
     "2 28626   0.0163 279.8379 0003069  20.3251 343.1766  1.00270142 70992",
     "wgs72",
     [(0.0, (9727.65902952, -41014.43193269, -9.39974955))]),
    ("1 09880U 77021B   24186.00000000  .00000023  00000+0  00000+0 0  9999",
     "2 09880  63.4300  75.8891 7318036 269.8735  16.7549  2.00611684 54321",
     "wgs72",
     [(0.0, (2575.93297901, 13237.27540045, 1419.07364030)),
      (1440.0, (2175.00194988, 14214.96552375, 2741.44350110))]),
]


def _oracle_from_tle(l1, l2, gravname):
    t = parse_lines(l1, l2)
    grav = oracle.wgs84() if gravname == "wgs84" else oracle.wgs72()
    return oracle.sgp4init(grav, float(t.epoch_jd), float(t.bstar),
                           float(t.ecco), float(t.argpo), float(t.inclo),
                           float(t.mo), float(t.no_kozai), float(t.nodeo))


def test_oracle_matches_goldens():
    """The scalar oracle reproduces every published golden vector (all
    regimes: high-e, drag, deep irez=0/1/2) to < 1 cm — so it is a
    trustworthy independent reference for the random sweeps below."""
    for l1, l2, gravname, rows in GOLDENS:
        sat = _oracle_from_tle(l1, l2, gravname)
        for tsince, r_ref in rows:
            e, r, _ = oracle.sgp4(sat, tsince)
            assert e == 0
            d = np.linalg.norm(np.subtract(r, r_ref))
            assert d < 1e-5, f"{l1[2:7]} t={tsince}: {d * 1e3:.4f} m"


# ---------------------------------------------------------------------------
# Randomized regime-covering catalog
# ---------------------------------------------------------------------------


def random_elements(n: int, seed: int = 7):
    """Element sets spanning every algorithmic regime."""
    rng = np.random.default_rng(seed)
    kind = rng.choice(6, size=n, p=[0.45, 0.10, 0.10, 0.15, 0.10, 0.10])
    rev_day = np.select(
        [kind == 0, kind == 1, kind == 2, kind == 3, kind == 4, kind == 5],
        [rng.uniform(12.0, 16.0, n),        # LEO
         rng.uniform(16.0, 16.6, n),        # low perigee (isimp)
         rng.uniform(12.0, 15.0, n),        # near-180 inclination LEO
         rng.normal(1.0027, 2e-4, n),       # GEO band (irez=1)
         rng.uniform(1.893, 2.118, n),      # half-day band (irez=2)
         rng.uniform(1.5, 2.5, n)])         # deep non-resonant
    ecco = np.select(
        [kind == 0, kind == 1, kind == 2, kind == 3, kind == 4, kind == 5],
        [rng.uniform(1e-4, 0.05, n), rng.uniform(1e-4, 0.01, n),
         rng.uniform(1e-4, 0.05, n), rng.uniform(1e-4, 0.01, n),
         rng.uniform(0.50, 0.73, n), rng.uniform(0.01, 0.30, n)])
    inclo = np.select(
        [kind == 0, kind == 1, kind == 2, kind == 3, kind == 4, kind == 5],
        [rng.uniform(0.3, 1.8, n), rng.uniform(0.3, 1.8, n),
         rng.uniform(3.10, 3.141, n),       # retrograde near-180
         rng.uniform(0.0, 0.3, n),          # includes Lyddane (< 0.2)
         rng.uniform(0.9, 1.2, n), rng.uniform(0.3, 1.8, n)])
    no_kozai = rev_day * TWO_PI / 1440.0
    bstar = np.where(kind <= 2, rng.uniform(-1e-4, 5e-4, n), 0.0)
    return dict(
        no_kozai=no_kozai, ecco=ecco, inclo=inclo,
        nodeo=rng.uniform(0.0, TWO_PI, n),
        argpo=rng.uniform(0.0, TWO_PI, n),
        mo=rng.uniform(0.0, TWO_PI, n),
        bstar=bstar,
        epoch_jd=np.full(n, EPOCH_JD) + rng.uniform(-0.5, 0.5, n))


def oracle_sweep(fields, times):
    """(n_times, n_sats) oracle errors + positions + velocities."""
    n = len(fields["no_kozai"])
    grav = oracle.wgs72()
    errs = np.zeros((len(times), n), np.int64)
    rs = np.zeros((len(times), n, 3))
    vs = np.zeros((len(times), n, 3))
    for s in range(n):
        sat = oracle.sgp4init(
            grav, float(fields["epoch_jd"][s]), float(fields["bstar"][s]),
            float(fields["ecco"][s]), float(fields["argpo"][s]),
            float(fields["inclo"][s]), float(fields["mo"][s]),
            float(fields["no_kozai"][s]), float(fields["nodeo"][s]))
        for i, t in enumerate(times):
            e, r, v = oracle.sgp4(sat, float(t))
            errs[i, s] = e
            rs[i, s] = r
            vs[i, s] = v
    return errs, rs, vs


N_SWEEP = 1000
SWEEP_TIMES = np.linspace(-1440.0, 1440.0, 13)


@pytest.fixture(scope="module")
def sweep_data():
    fields = random_elements(N_SWEEP)
    o_err, o_r, o_v = oracle_sweep(fields, SWEEP_TIMES)
    els = sgp4_init(WGS72, **fields)
    cat = catalog_from_elements(els, WGS72)
    return fields, cat, o_err, o_r, o_v


def _compare(err, r, v, o_err, o_r, o_v, pos_tol_km, vel_tol_kms,
             err_agree=0.99):
    err = np.asarray(err)
    ok = (err == 0) & (o_err == 0)
    # error codes must agree on nearly every lane (edge-of-regime lanes
    # may flip between codes at f32 precision)
    agree = (err == 0) == (o_err == 0)
    assert agree.mean() >= err_agree, \
        f"error-code agreement {agree.mean():.4f}"
    assert ok.mean() > 0.8  # the sweep must mostly propagate cleanly
    dr = np.linalg.norm(np.asarray(r, np.float64) - o_r, axis=-1)
    dv = np.linalg.norm(np.asarray(v, np.float64) - o_v, axis=-1)
    worst = float(dr[ok].max())
    assert worst < pos_tol_km, f"worst position diff {worst * 1e3:.2f} m"
    worst_v = float(dv[ok].max())
    assert worst_v < vel_tol_kms, \
        f"worst velocity diff {worst_v * 1e6:.2f} mm/s"


def test_differential_f64_vs_oracle(sweep_data):
    """f64 path vs the independent oracle: sub-meter everywhere
    (both are f64 transcriptions; disagreement = vectorization bug)."""
    _, cat, o_err, o_r, o_v = sweep_data
    r, v, err = propagate_tsince(cat, SWEEP_TIMES[:, None])
    _compare(err, r, v, o_err, o_r, o_v,
             pos_tol_km=1e-3, vel_tol_kms=1e-6)


def test_differential_fast_vs_oracle(sweep_data):
    """Split-precision fast path vs the oracle over +-1440 min: inside
    the reference's < 100 m accuracy budget (README.md:55-57)."""
    _, cat, o_err, o_r, o_v = sweep_data
    t = np.broadcast_to(SWEEP_TIMES[:, None], (len(SWEEP_TIMES), len(cat)))
    r, v, err = propagate_fast(cat.els, cat.deep, np.ascontiguousarray(t),
                               cat.grav, resonance_steps=4)
    _compare(err, r, v, o_err, o_r, o_v,
             pos_tol_km=0.1, vel_tol_kms=1e-3, err_agree=0.98)


# ---------------------------------------------------------------------------
# Live cross-check against the real python-sgp4 (runs where installed)
# ---------------------------------------------------------------------------


def test_live_python_sgp4():
    """Direct comparison with the real sgp4 package, < 1 mm at epoch and
    < 100 m over a day — the reference CI's gate (ci.yaml:101-153)."""
    sgp4_api = pytest.importorskip("sgp4.api")
    from astroz_tpu import api as zapi

    for l1, l2, gravname, _ in GOLDENS:
        grav = (sgp4_api.WGS84 if gravname == "wgs84" else sgp4_api.WGS72)
        ref = sgp4_api.Satrec.twoline2rv(l1, l2, grav)
        ours = zapi.Satrec.twoline2rv(
            l1, l2, zapi.WGS84 if gravname == "wgs84" else zapi.WGS72)
        jd, fr = ref.jdsatepoch, ref.jdsatepochF
        for dt_min in (0.0, 90.0, 720.0, 1440.0):
            e1, r1, v1 = ref.sgp4(jd, fr + dt_min / 1440.0)
            e2, r2, v2 = ours.sgp4(jd, fr + dt_min / 1440.0)
            assert e1 == e2
            tol = 1e-6 if dt_min == 0.0 else 0.1       # km
            tol_v = 1e-8 if dt_min == 0.0 else 1e-4    # km/s
            assert np.linalg.norm(np.subtract(r1, r2)) < tol
            assert np.linalg.norm(np.subtract(v1, v2)) < tol_v
