import math

import numpy as np

from astroz_tpu.time import (days2mdhms, epoch_to_jd, gstime_scalar,
                             iso8601_to_jd, jd_to_datetime_parts, jday,
                             doy_to_month_day, month_day_to_doy)


def test_jday_j2000():
    jd, fr = jday(2000, 1, 1, 12, 0, 0.0)
    assert jd + fr == 2451545.0


def test_jday_known_date():
    # Vallado example 3-4: 1996-10-26 14:20:00 -> JD 2450383.09722222
    jd, fr = jday(1996, 10, 26, 14, 20, 0.0)
    assert abs((jd + fr) - 2450383.0972222222) < 1e-8


def test_days2mdhms_roundtrip():
    mon, day, hr, minute, sec = days2mdhms(2024, 127.82853009)
    assert (mon, day) == (5, 6)
    assert hr == 19
    assert minute == 53
    assert abs(sec - 4.9997) < 0.001


def test_doy_leap():
    assert doy_to_month_day(2024, 60) == (2, 29)
    assert doy_to_month_day(2023, 60) == (3, 1)
    assert month_day_to_doy(2024, 2, 29) == 60
    assert month_day_to_doy(2024, 3, 1) == 61


def test_epoch_to_jd_pivot():
    jd98, fr98 = epoch_to_jd(98, 1.0)
    jd24, fr24 = epoch_to_jd(24, 1.0)
    assert jd98 + fr98 < 2451545.0 < jd24 + fr24


def test_gstime_j2000():
    # GMST at J2000.0 ~ 4.8950 rad (reference: Sdp4.zig gstime test)
    assert abs(gstime_scalar(2451545.0) - 4.8949612) < 1e-3


def test_gstime_matches_jnp():
    from astroz_tpu.time import gstime
    jds = np.linspace(2451545.0, 2460000.0, 7)
    for jd in jds:
        assert abs(float(gstime(jd)) - gstime_scalar(jd)) < 1e-9


def test_jd_to_datetime_roundtrip():
    jd, fr = jday(2024, 5, 6, 19, 53, 5.0)
    y, m, d, hh, mm, ss = jd_to_datetime_parts(jd + fr)
    assert (y, m, d, hh, mm) == (2024, 5, 6, 19, 53)
    assert abs(ss - 5.0) < 1e-4  # f64 JD resolution is ~1e-5 s


def test_iso8601():
    jd, fr = iso8601_to_jd("2000-01-01T12:00:00Z")
    assert jd + fr == 2451545.0
    jd2, fr2 = iso8601_to_jd("2024-05-06T19:53:05.123")
    y, m, d, hh, mm, ss = jd_to_datetime_parts(jd2 + fr2)
    assert (y, m, d, hh, mm) == (2024, 5, 6, 19, 53)
    assert abs(ss - 5.123) < 1e-4
