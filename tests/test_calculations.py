"""calculations + orbital_mechanics validation.

Gates from the reference: Hohmann vs poliastro < 0.1% (README.md:59 —
pinned here to the published LEO->GEO figures), orbital period 1e-10
relative (validation_tests), element/state round-trips, Lambert
consistency with two-body propagation, TRIAD/quaternion identities.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from astroz_tpu.calculations import (OrbitalElements, elements_to_state,
                                     hohmann_transfer as hohmann_raw,
                                     mean_elements_to_state,
                                     mean_from_eccentric, propagate_attitude,
                                     quaternion_multiply,
                                     rotmat_to_quaternion,
                                     solve_kepler_newton, state_to_elements,
                                     triad, true_anomaly_from_eccentric)
from astroz_tpu.constants import EARTH
from astroz_tpu.orbital_mechanics import (bi_elliptic_transfer,
                                          escape_velocity,
                                          hohmann_transfer,
                                          lambert_solver_simple,
                                          orbital_period, orbital_velocity)
from astroz_tpu.propagators import Propagator, DormandPrince87, TwoBody

MU = EARTH.mu
RE = EARTH.eq_radius


def test_kepler_newton_roundtrip():
    rng = np.random.default_rng(0)
    m = rng.uniform(0, 2 * np.pi, 1000)
    e = rng.uniform(0, 0.95, 1000)
    big_e = np.asarray(solve_kepler_newton(m, e))
    m_back = np.asarray(mean_from_eccentric(big_e, e))
    err = np.abs((m_back - m + np.pi) % (2 * np.pi) - np.pi)
    assert err.max() < 1e-10


def test_elements_state_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        el = OrbitalElements(
            semi_major_axis=jnp.asarray(rng.uniform(6700, 45000)),
            eccentricity=jnp.asarray(rng.uniform(0.001, 0.8)),
            inclination=jnp.asarray(rng.uniform(0.01, np.pi - 0.01)),
            raan=jnp.asarray(rng.uniform(0, 2 * np.pi)),
            argument_of_perigee=jnp.asarray(rng.uniform(0, 2 * np.pi)),
            true_anomaly=jnp.asarray(rng.uniform(0, 2 * np.pi)),
            mean_anomaly=jnp.asarray(0.0))
        r, v = elements_to_state(el)
        back = state_to_elements(r, v)
        assert abs(float(back.semi_major_axis - el.semi_major_axis)) < 1e-4
        assert abs(float(back.eccentricity - el.eccentricity)) < 1e-9
        assert abs(float(back.inclination - el.inclination)) < 1e-9
        d_raan = (float(back.raan - el.raan) + np.pi) % (2 * np.pi) - np.pi
        assert abs(d_raan) < 1e-8


def test_hohmann_leo_to_geo_published_values():
    """LEO (6678 km) -> GEO (42164 km): dv1 ~ 2.44, dv2 ~ 1.47 km/s,
    ~5.25 h (standard textbook/poliastro numbers, <0.1%)."""
    res = hohmann_transfer(6678.0, 42164.0)
    assert abs(res.delta_v1 - 2.4258) < 0.003
    assert abs(res.delta_v2 - 1.4668) < 0.003
    assert abs(res.transfer_time / 3600.0 - 5.2750) < 0.01


def test_orbital_period_iss():
    # ISS at a ~ 6790 km: period ~ 5566 s; relative precision 1e-10
    a = 6790.0
    p = float(orbital_period(a))
    assert abs(p / (2 * np.pi * np.sqrt(a ** 3 / MU)) - 1.0) < 1e-12


def test_velocities():
    assert abs(float(orbital_velocity(RE + 400)) - 7.6686) < 1e-3
    assert abs(float(escape_velocity(RE)) - 11.18) < 5e-3


def test_bi_elliptic_beats_hohmann_for_large_ratio():
    """For r2/r1 > ~15.6 with high rb, bi-elliptic needs less dv."""
    r1 = 7000.0
    r2 = 7000.0 * 20.0
    hoh = hohmann_transfer(r1, r2)
    bi = bi_elliptic_transfer(r1, r2, r2 * 10.0)
    assert bi.total_delta_v < hoh.total_delta_v


def test_bi_elliptic_validation():
    with pytest.raises(ValueError):
        bi_elliptic_transfer(7000.0, 14000.0, 10000.0)


def test_lambert_matches_two_body_propagation():
    """Lambert velocities must connect r1 to r2 in exactly tof under
    two-body dynamics."""
    r1 = np.array([7000.0, 0.0, 0.0])
    r2 = np.array([0.0, 8000.0, 1000.0])
    tof = 3000.0
    res = lambert_solver_simple(r1, r2, tof)
    state0 = np.concatenate([r1, np.asarray(res.v1)])
    prop = Propagator(DormandPrince87(TwoBody(), rtol=1e-12, atol=1e-12))
    end = prop.propagate_to(state0, 0.0, tof, tof)
    assert np.linalg.norm(end[:3] - r2) < 1.0  # < 1 km closure
    assert np.linalg.norm(end[3:] - np.asarray(res.v2)) < 1e-3


def test_triad_recovers_rotation():
    rng = np.random.default_rng(3)
    # random rotation matrix via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    v1 = np.array([1.0, 0.2, -0.3])
    v2 = np.array([0.1, 1.0, 0.4])
    a = triad(q @ v1, q @ v2, v1, v2)
    np.testing.assert_allclose(np.asarray(a), q, atol=1e-10)


def test_rotmat_to_quaternion_identity_and_multiply():
    q = rotmat_to_quaternion(jnp.eye(3))
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-12)
    # 90 deg about z
    rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    qz = np.asarray(rotmat_to_quaternion(jnp.asarray(rz)))
    np.testing.assert_allclose(qz, [np.sqrt(0.5), 0, 0, np.sqrt(0.5)],
                               atol=1e-12)
    # q*q = 180 deg about z
    q180 = np.asarray(quaternion_multiply(jnp.asarray(qz),
                                          jnp.asarray(qz)))
    np.testing.assert_allclose(q180, [0, 0, 0, 1], atol=1e-12)


def test_attitude_propagation_torque_free_conserves_momentum():
    inertia = jnp.asarray([10.0, 12.0, 20.0])
    w0 = jnp.asarray([0.05, -0.02, 0.1])
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    q, w = propagate_attitude(q0, w0, inertia, jnp.zeros(3), 0.1, 3000)
    # |q| = 1 and kinetic energy ~conserved under torque-free RK4
    assert abs(float(jnp.linalg.norm(q)) - 1.0) < 1e-9
    t0 = 0.5 * float(jnp.sum(inertia * w0 * w0))
    t1 = 0.5 * float(jnp.sum(inertia * w * w))
    assert abs(t1 / t0 - 1.0) < 1e-6
