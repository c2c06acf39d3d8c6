"""Spacecraft maneuvers, mission planning, Monte-Carlo tests.

Gates: Earth->Mars Hohmann ~5.6 km/s total, ~259 days (Mission.zig:
339-340); impulse raises/changes orbit as commanded; MC statistics
behave (mean near nominal, CI shrinks with n).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from astroz_tpu.calculations import state_to_elements
from astroz_tpu.constants import EARTH
from astroz_tpu.mission import (MissionParameters, PointKind, plan_mission,
                                synodic_period_days)
from astroz_tpu.constants import BODIES
from astroz_tpu.montecarlo import (MonteCarloConfig, export_csv,
                                   run_hohmann_monte_carlo)
from astroz_tpu.spacecraft import (Impulse, ImpulseKind, SatelliteSize,
                                   Spacecraft, phase_change_dv,
                                   plane_change_dv)
from astroz_tpu.tle import parse_lines

from test_sgp4 import TRAJ_L1, TRAJ_L2

RE = EARTH.eq_radius
MU = EARTH.mu


def circular_sc(alt=700.0):
    r = RE + alt
    vc = np.sqrt(MU / r)
    return Spacecraft(state=np.array([r, 0, 0, 0, vc, 0]),
                      mass_kg=500.0, size=SatelliteSize.MEDIUM)


def test_earth_mars_mission_plan():
    plan = plan_mission(MissionParameters(origin="earth",
                                          destination="mars"))
    assert abs(plan.total_dv_kms - 5.6) < 0.2       # Mission.zig:339
    assert abs(plan.transfer_time_days - 259.0) < 5  # Mission.zig:340
    assert 750 < plan.synodic_period_days < 800      # ~780 days
    kinds = {p.kind for p in plan.trajectory}
    assert {PointKind.WAYPOINT, PointKind.TRAJECTORY,
            PointKind.PLANET} <= kinds
    # trajectory starts at origin radius, ends at destination radius
    dep = plan.trajectory[0]
    arr = plan.trajectory[-1]
    assert abs(np.linalg.norm(dep.position_km)
               - BODIES["earth"].semi_major_axis) < 1e3
    assert abs(np.linalg.norm(arr.position_km)
               - BODIES["mars"].semi_major_axis) < 1e3


def test_mission_validation():
    with pytest.raises(ValueError):
        MissionParameters(origin="earth", destination="earth")
    with pytest.raises(ValueError):
        MissionParameters(origin="earth", destination="sun")


def test_spacecraft_from_tle_propagates():
    sc = Spacecraft.from_tle(parse_lines(TRAJ_L1, TRAJ_L2))
    times, states = sc.propagate(0.0, 0.1, 10.0)
    rn = np.linalg.norm(states[:, :3], axis=-1)
    assert np.all((rn > RE + 200) & (rn < RE + 800))


def test_prograde_impulse_raises_orbit():
    sc = circular_sc(700.0)
    a0 = float(state_to_elements(jnp.asarray(sc.state[:3]),
                                 jnp.asarray(sc.state[3:])).semi_major_axis)
    imp = Impulse(time=600.0, kind=ImpulseKind.PROGRADE, magnitude=0.1)
    sc.propagate(0.0, 0.05, 10.0, impulses=[imp])
    a1 = float(state_to_elements(jnp.asarray(sc.state[:3]),
                                 jnp.asarray(sc.state[3:])).semi_major_axis)
    assert a1 > a0 + 100.0  # 100 m/s prograde at LEO: +~350 km sma


def test_plane_change_impulse_changes_inclination():
    sc = circular_sc(700.0)
    # equatorial start; request 5 deg inclination change
    di = np.deg2rad(5.0)
    imp = Impulse(time=300.0, kind=ImpulseKind.PLANE_CHANGE,
                  delta_inclination=di)
    sc.propagate(0.0, 0.02, 5.0, impulses=[imp])
    el = state_to_elements(jnp.asarray(sc.state[:3]),
                           jnp.asarray(sc.state[3:]))
    assert abs(float(el.inclination) - di) < np.deg2rad(0.5)


def test_phase_change_dv_formula():
    dv, t_phase = phase_change_dv(7000.0, np.deg2rad(10.0))
    assert 0.0 < dv < 0.2
    t_orig = 2 * np.pi * np.sqrt(7000.0 ** 3 / MU)
    assert t_phase < t_orig  # positive phase shift -> faster orbit


def test_plane_change_dv_small_angle():
    v = 7.5
    dv = plane_change_dv(v, np.deg2rad(1.0), 0.0, np.deg2rad(51.6))
    assert abs(dv - 2 * v * np.sin(np.deg2rad(0.5))) < 1e-12


def test_abnormal_orbit_guard():
    r = RE + 500.0
    v_esc = np.sqrt(2 * MU / r) * 1.1
    sc = Spacecraft(state=np.array([r, 0, 0, 0, v_esc, 0]))
    times, states = sc.propagate(0.0, 0.5, 60.0)
    # guard stops early: escape orbit never produces a full trajectory
    assert times[-1] < 0.5 * 86400.0


def test_attitude_triad_and_propagation():
    sc = circular_sc()
    v1 = np.array([1.0, 0.0, 0.0])
    v2 = np.array([0.0, 1.0, 0.0])
    sc.update_attitude(v1, v2, v1, v2)  # identity attitude
    np.testing.assert_allclose(sc.quaternion, [1, 0, 0, 0], atol=1e-12)
    sc.angular_velocity = np.array([0.0, 0.0, 0.1])
    sc.propagate_attitude(0.1, 10.0)
    # rotated about z by ~1 rad: q = [cos .5, 0, 0, sin .5]
    assert abs(sc.quaternion[0] - np.cos(0.5)) < 1e-6
    assert abs(sc.quaternion[3] - np.sin(0.5)) < 1e-6


def test_monte_carlo_statistics(tmp_path):
    cfg = MonteCarloConfig(n_samples=2000, r1_sigma_km=5.0,
                           r2_sigma_km=20.0)
    res = run_hohmann_monte_carlo(cfg)
    tot = res["total_delta_v"]
    assert abs(tot.mean - 3.85) < 0.1  # LEO->GEO ~3.85 km/s
    assert tot.std > 0
    assert tot.ci95_low < tot.mean < tot.ci95_high
    assert tot.n + tot.n_failed == 2000
    # CI shrinks with more samples
    res_small = run_hohmann_monte_carlo(
        MonteCarloConfig(n_samples=100, r1_sigma_km=5.0,
                         r2_sigma_km=20.0))
    width_big = tot.ci95_high - tot.ci95_low
    ts = res_small["total_delta_v"]
    assert width_big < (ts.ci95_high - ts.ci95_low)
    # CSV export
    p = tmp_path / "mc.csv"
    export_csv(res, str(p))
    assert p.read_text().startswith("metric,mean")


def test_monte_carlo_mu_sigma_has_effect():
    """Regression: perturbed mu samples were computed then dropped."""
    base = run_hohmann_monte_carlo(MonteCarloConfig(
        n_samples=500, r1_sigma_km=0.0, r2_sigma_km=0.0, mu_sigma=0.0))
    wide = run_hohmann_monte_carlo(MonteCarloConfig(
        n_samples=500, r1_sigma_km=0.0, r2_sigma_km=0.0,
        mu_sigma=2000.0))
    assert base["total_delta_v"].std < 1e-12
    assert wide["total_delta_v"].std > 1e-5


def test_inward_transfer_trajectory_time_order():
    """Regression: Mars->Earth trajectory points ran backwards in
    time (position at t0 was the arrival end of the ellipse)."""
    plan = plan_mission(MissionParameters(origin="mars",
                                          destination="earth"))
    traj = [p for p in plan.trajectory
            if p.kind == PointKind.TRAJECTORY]
    r_start = np.linalg.norm(traj[0].position_km)
    r_end = np.linalg.norm(traj[-1].position_km)
    assert abs(r_start - BODIES["mars"].semi_major_axis) < 1e4
    assert abs(r_end - BODIES["earth"].semi_major_axis) < 1e4
