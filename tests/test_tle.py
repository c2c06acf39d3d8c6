import json
import math

import numpy as np
import pytest

from astroz_tpu.constants import TWO_PI, DEG2RAD
from astroz_tpu.tle import (Tle, TleArrays, iter_tles, parse, parse_lines,
                            parse_omm, parse_satnum)

ISS_L1 = "1 25544U 98067A   24127.82853009  .00015698  00000+0  27310-3 0  9995"
ISS_L2 = "2 25544  51.6393 160.4574 0003580 140.6673 205.7250 15.50957674452123"


def test_parse_lines_basic():
    t = parse_lines(ISS_L1, ISS_L2)
    assert t.satnum == 25544
    assert t.classification == "U"
    assert t.intldesg == "98067A"
    assert t.epochyr == 24
    assert abs(t.epochdays - 127.82853009) < 1e-10
    assert abs(t.inclo - 51.6393 * DEG2RAD) < 1e-12
    assert abs(t.nodeo - 160.4574 * DEG2RAD) < 1e-12
    assert abs(t.ecco - 0.0003580) < 1e-12
    assert abs(t.argpo - 140.6673 * DEG2RAD) < 1e-12
    assert abs(t.mo - 205.7250 * DEG2RAD) < 1e-12
    # mean motion rev/day -> rad/min
    assert abs(t.no_kozai - 15.50957674 * TWO_PI / 1440.0) < 1e-12
    # bstar implied-decimal: 27310-3 -> 0.27310e-3
    assert abs(t.bstar - 0.27310e-3) < 1e-15
    assert t.revnum == 45212


def test_bstar_negative_exponent():
    l1 = "1 00005U 58002B   00179.78495062  .00000023  00000-0  28098-4 0  4753"
    l2 = "2 00005  34.2682 348.7242 1859667 331.7664  19.3264 10.82419157413667"
    t = parse_lines(l1, l2)
    assert abs(t.bstar - 0.28098e-4) < 1e-18
    assert abs(t.ecco - 0.1859667) < 1e-12


def test_epoch_jd():
    t = parse_lines(ISS_L1, ISS_L2)
    # python-sgp4 convention: jdsatepoch is the half-integer midnight JD
    assert t.jdsatepoch % 1.0 == 0.5
    assert 0.0 <= t.jdsatepochF < 1.0
    # epoch 2024-05-06 ~19:53 UTC
    assert abs(t.epoch_jd - 2460437.32853009) < 1e-7


def test_alpha5():
    assert parse_satnum("A0001") == 100001
    assert parse_satnum("Z9999") == 339999
    assert parse_satnum("25544") == 25544
    # I and O are skipped in Alpha-5
    with pytest.raises(Exception):
        parse_satnum("I0000")


def test_iter_tles_3le_and_crlf():
    text = ("ISS (ZARYA)\r\n" + ISS_L1 + "\r\n" + ISS_L2 + "\r\n"
            "\r\n"
            "0 VANGUARD 1\r\n"
            "1 00005U 58002B   00179.78495062  .00000023  00000-0  28098-4 0  4753\r\n"
            "2 00005  34.2682 348.7242 1859667 331.7664  19.3264 10.82419157413667\r\n"
            "orphan line that should be skipped\r\n")
    tles = list(iter_tles(text))
    assert len(tles) == 2
    assert tles[0].satnum == 25544
    assert tles[0].name == "ISS (ZARYA)"
    assert tles[1].satnum == 5
    assert tles[1].name == "VANGUARD 1"


def test_parse_single():
    t = parse(ISS_L1 + "\n" + ISS_L2)
    assert t.satnum == 25544


def test_omm_roundtrip():
    t0 = parse_lines(ISS_L1, ISS_L2)
    omm = {
        "OBJECT_NAME": "ISS (ZARYA)",
        "OBJECT_ID": "1998-067A",
        "EPOCH": "2024-05-06T19:53:05.000",
        "MEAN_MOTION": 15.50957674,
        "ECCENTRICITY": 0.0003580,
        "INCLINATION": 51.6393,
        "RA_OF_ASC_NODE": 160.4574,
        "ARG_OF_PERICENTER": 140.6673,
        "MEAN_ANOMALY": 205.7250,
        "NORAD_CAT_ID": 25544,
        "BSTAR": 0.00027310,
        "MEAN_MOTION_DOT": 0.00015698,
        "REV_AT_EPOCH": 45212,
    }
    ts = parse_omm(json.dumps([omm]))
    assert len(ts) == 1
    t = ts[0]
    assert t.satnum == 25544
    assert abs(t.ecco - t0.ecco) < 1e-12
    assert abs(t.inclo - t0.inclo) < 1e-12
    assert abs(t.no_kozai - t0.no_kozai) < 1e-12
    assert abs(t.epoch_jd - t0.epoch_jd) < 1e-6  # within ~0.1 s
    assert abs(t.bstar - t0.bstar) < 1e-10


def test_tle_arrays():
    tles = [parse_lines(ISS_L1, ISS_L2)] * 3
    arr = TleArrays.from_tles(tles)
    assert len(arr) == 3
    assert arr.no_kozai.shape == (3,)
    assert arr.satnum.dtype == np.int64
    np.testing.assert_allclose(arr.ecco, 0.000358)


def test_format_lines_roundtrip_randomized():
    """format_lines -> parse_lines round-trips every field across a
    randomized element population (incl. Alpha-5 satnums and negative
    bstar), and the native C++ parser agrees on the formatted text."""
    import numpy as np

    from astroz_tpu.tle import TleArrays, format_lines, parse_lines

    rng = np.random.default_rng(3)
    n = 200
    lines = []
    recs = []
    for k in range(n):
        rec = dict(
            satnum=int(rng.integers(1, 339999)),
            epoch_jd=float(2460000.5 + rng.uniform(0, 365)),
            ecco=float(rng.uniform(0, 0.8)),
            inclo_deg=float(rng.uniform(0, 180)),
            nodeo_deg=float(rng.uniform(0, 360)),
            argpo_deg=float(rng.uniform(0, 360)),
            mo_deg=float(rng.uniform(0, 360)),
            no_rev_day=float(rng.uniform(0.9, 17.0)),
            bstar=float(rng.uniform(-1e-3, 1e-2)),
            ndot_rev_day2=float(rng.uniform(-1e-4, 1e-3)),
        )
        l1, l2 = format_lines(**rec)
        t = parse_lines(l1, l2)
        assert t.satnum == rec["satnum"]
        assert abs(t.epoch_jd - rec["epoch_jd"]) < 1e-7  # ~10 ms
        assert abs(t.ecco - rec["ecco"]) < 1e-7
        assert abs(np.degrees(t.inclo) - rec["inclo_deg"]) < 1e-4
        assert abs(t.no_kozai * 1440 / (2 * np.pi)
                   - rec["no_rev_day"]) < 1e-7
        assert abs(t.bstar - rec["bstar"]) < abs(rec["bstar"]) * 1e-4 + 1e-12
        lines += [l1, l2]
        recs.append(rec)

    text = "\n".join(lines)
    nat = TleArrays.from_text(text, allow_native=True)
    py = TleArrays.from_text(text, allow_native=False)
    assert len(nat) == len(py) == n
    for field in ("satnum", "epoch_jd", "no_kozai", "ecco", "inclo",
                  "nodeo", "argpo", "mo", "bstar"):
        np.testing.assert_allclose(getattr(nat, field),
                                   getattr(py, field), rtol=0, atol=1e-12)
