"""High-level Constellation API tests (reference __init__.py surface)."""

import datetime
import json

import numpy as np
import pytest

from astroz_tpu.constellation import (Constellation, load_tle_text,
                                      propagate, screen)

from test_propagation import MIXED_TEXT
from test_sgp4 import TRAJ_L1, TRAJ_L2, TRAJ_REF


def test_load_from_file(tmp_path):
    p = tmp_path / "cat.tle"
    p.write_text(MIXED_TEXT)
    con = Constellation(str(p))
    assert con.num_satellites == 5
    assert con.num_deep_space == 3


def test_load_raw_text_passthrough():
    assert load_tle_text(MIXED_TEXT) == MIXED_TEXT


def test_load_group_alias_uses_fetch():
    calls = []

    def fake_fetch(url):
        calls.append(url)
        return MIXED_TEXT

    text = load_tle_text("starlink", fetch=fake_fetch)
    assert "GROUP=starlink" in calls[0]
    assert text == MIXED_TEXT
    load_tle_text("norad:25544", fetch=fake_fetch)
    assert "CATNR=25544" in calls[1]
    load_tle_text("25544", fetch=fake_fetch)
    assert "CATNR=25544" in calls[2]


def test_load_omm_json():
    omm = [{
        "OBJECT_NAME": "ISS (ZARYA)", "OBJECT_ID": "1998-067A",
        "EPOCH": "2024-01-01T12:00:00", "MEAN_MOTION": 15.5,
        "ECCENTRICITY": 0.0001234, "INCLINATION": 51.64,
        "RA_OF_ASC_NODE": 200.0, "ARG_OF_PERICENTER": 90.0,
        "MEAN_ANOMALY": 270.0, "NORAD_CAT_ID": 25544,
        "BSTAR": 0.0001027,
    }]
    con = Constellation(json.dumps(omm))
    assert con.num_satellites == 1
    assert con.satnums[0] == 25544
    r, v, e = con.propagate([0.0, 30.0], start_time=con.epochs_jd[0])
    assert np.all(np.asarray(e) == 0)
    rn = np.linalg.norm(np.asarray(r), axis=-1)
    assert np.all((rn > 6600) & (rn < 6900))


def test_propagate_convenience_with_norad_select():
    epoch = 2460311.0  # TRAJ epoch
    r, v, e = propagate(MIXED_TEXT, [0.0, 360.0], start_time=epoch,
                        norad_id=20413)
    assert r.shape == (2, 1, 3)
    rn = np.linalg.norm(np.asarray(r[0, 0]))
    assert 20000 < rn < 30000  # GPS orbit radius ~26500 km


def test_propagate_minutes_from_datetime():
    con = Constellation("\n".join([TRAJ_L1, TRAJ_L2]))
    start = datetime.datetime(2024, 1, 1, 12, 0, 0)
    times_min = [row[0] for row in TRAJ_REF]
    r, v, e = con.propagate(times_min, start_time=start)
    assert np.all(np.asarray(e) == 0)
    for i, (_, r_ref, _) in enumerate(TRAJ_REF):
        assert np.linalg.norm(np.asarray(r[i, 0], np.float64)
                              - r_ref) < 0.1


def test_propagate_datetime_array():
    con = Constellation("\n".join([TRAJ_L1, TRAJ_L2]))
    times = [datetime.datetime(2024, 1, 1, 12, 0, 0),
             datetime.datetime(2024, 1, 1, 18, 0, 0)]
    r, v, e = con.propagate(times)
    assert r.shape == (2, 1, 3)
    assert np.all(np.asarray(e) == 0)


def test_screen_all_vs_target_surface():
    epoch = 2460311.0
    times = np.linspace(0.0, 180.0, 10)
    out = screen(MIXED_TEXT, times, start_time=epoch, threshold_km=50.0,
                 block=8)
    assert len(out) == 4  # (i, j, dmin, tmin)
    md, ti, mask = screen(MIXED_TEXT, times, start_time=epoch,
                          target="\n".join([TRAJ_L1, TRAJ_L2]),
                          threshold_km=10.0)
    assert md.shape == (5,)
    assert bool(mask[0])  # the target itself is sat 0 -> distance 0


def test_select_missing_raises():
    con = Constellation(MIXED_TEXT)
    with pytest.raises(ValueError):
        con.select([99999999])
