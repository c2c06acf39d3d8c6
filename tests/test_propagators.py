"""Numerical propagation validation.

Ports the reference's physics gates (validation_tests.zig): two-body
energy conservation to 1e-10 over many orbits through DP87 (:376-406),
circular return-to-start (:26-43), DP87-beats-RK4 (:207-248), J2
magnitude/regression (:80-139), J3/J4 << J2 (:141-163), drag altitude
scaling (:165-184), SRP shadow (:186-205), third-body tide
(ForceModel.zig:449-466) — plus a zonal-potential-gradient check that
pins every J-term formula against jax.grad of the published potential.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astroz_tpu.constants import EARTH, AU_KM
from astroz_tpu.propagators import (Composite, Drag, DormandPrince87,
                                    ImprovedDrag, J2, J3, J4, Propagator,
                                    Rk4, SolarRadiationPressure, ThirdBody,
                                    TwoBody, propagate_fixed,
                                    propagate_numerical)

MU = EARTH.mu
RE = EARTH.eq_radius


def circular_state(alt_km=500.0, incl=0.9):
    r = RE + alt_km
    vc = np.sqrt(MU / r)
    return np.array([r, 0.0, 0.0,
                     0.0, vc * np.cos(incl), vc * np.sin(incl)])


def energy(states):
    r = np.linalg.norm(states[..., :3], axis=-1)
    v = np.linalg.norm(states[..., 3:], axis=-1)
    return 0.5 * v * v - MU / r


# ---------------------------------------------------------------------------
# Zonal formulas vs potential gradient
# ---------------------------------------------------------------------------


def zonal_potential(r_vec, n):
    """Force function V = mu/r (... - Jn (R/r)^n Pn(z/r)) for one term."""
    r = jnp.linalg.norm(r_vec)
    s = r_vec[2] / r
    if n == 2:
        pn, jn = 0.5 * (3 * s ** 2 - 1), EARTH.j2
    elif n == 3:
        pn, jn = 0.5 * (5 * s ** 3 - 3 * s), EARTH.j3
    else:
        pn, jn = 0.125 * (35 * s ** 4 - 30 * s ** 2 + 3), EARTH.j4
    return -MU / r * jn * (RE / r) ** n * pn


@pytest.mark.parametrize("n,model", [(2, J2()), (3, J3()), (4, J4())])
def test_zonal_accel_is_potential_gradient(n, model):
    rng = np.random.default_rng(n)
    for _ in range(5):
        r_vec = rng.normal(size=3)
        r_vec = r_vec / np.linalg.norm(r_vec) * rng.uniform(6800, 42000)
        a_ref = jax.grad(lambda rv: zonal_potential(rv, n))(
            jnp.asarray(r_vec))
        a = model(jnp.asarray(r_vec), jnp.zeros(3), 0.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                                   rtol=1e-9, atol=1e-18)


def test_j3_j4_much_smaller_than_j2():
    r = jnp.asarray(circular_state()[:3])
    v = jnp.zeros(3)
    a2 = np.linalg.norm(np.asarray(J2()(r, v, 0.0)))
    a3 = np.linalg.norm(np.asarray(J3()(r, v, 0.0)))
    a4 = np.linalg.norm(np.asarray(J4()(r, v, 0.0)))
    assert a3 < 0.01 * a2
    assert a4 < 0.01 * a2


def test_j2_magnitude_formula():
    """|a_J2| ~ 1.5 J2 mu Re^2 / r^4 at the equator, < 1% off
    (validation_tests.zig:80-98)."""
    r = RE + 500.0
    a = J2()(jnp.asarray([r, 0.0, 0.0]), jnp.zeros(3), 0.0)
    expected = 1.5 * EARTH.j2 * MU * RE ** 2 / r ** 4
    assert abs(np.linalg.norm(np.asarray(a)) / expected - 1.0) < 0.01


def test_j2_nodal_regression_direction():
    """Prograde orbit under J2 regresses westward (node decreases)
    (validation_tests.zig:100-139)."""
    state = circular_state(700.0, incl=np.deg2rad(51.6))
    accel = Composite([TwoBody(), J2()])
    period = 2 * np.pi * np.sqrt((RE + 700.0) ** 3 / MU)
    times, states = propagate_fixed(accel, state, 0.0, 10 * period, 10.0)
    s = np.asarray(states)
    h = np.cross(s[:, :3], s[:, 3:])
    node = np.arctan2(h[:, 0], -h[:, 1])
    dnode = np.unwrap(node) - node[0]
    assert dnode[-1] < -1e-4  # westward
    # rate vs Vallado analytic < 1%
    n_mm = np.sqrt(MU / (RE + 700.0) ** 3)
    rate_ref = -1.5 * n_mm * EARTH.j2 * (RE / (RE + 700.0)) ** 2 \
        * np.cos(np.deg2rad(51.6))
    rate = dnode[-1] / (10 * period)
    assert abs(rate / rate_ref - 1.0) < 0.01


# ---------------------------------------------------------------------------
# Integrators
# ---------------------------------------------------------------------------


def test_two_body_energy_conservation_dp87_100_orbits():
    state = circular_state(800.0)
    period = 2 * np.pi * np.sqrt((RE + 800.0) ** 3 / MU)
    prop = Propagator(DormandPrince87(TwoBody(), rtol=1e-12, atol=1e-12))
    times, states = prop.propagate(state, 0.0, 100 * period,
                                   10 * period)
    e = energy(states)
    assert np.abs(e / e[0] - 1.0).max() < 1e-10


def test_circular_orbit_returns_to_start():
    state = circular_state(500.0)
    period = 2 * np.pi * np.sqrt((RE + 500.0) ** 3 / MU)
    prop = Propagator(DormandPrince87(TwoBody(), rtol=1e-12, atol=1e-12))
    end = prop.propagate_to(state, 0.0, period, period)
    assert np.linalg.norm(end[:3] - state[:3]) < 0.001  # < 1 m


def test_dp87_beats_rk4():
    """Same coarse outer step: DP87 (sub-stepping) must conserve energy
    orders of magnitude better than raw RK4 (validation_tests.zig:
    207-248)."""
    state = circular_state(500.0)
    period = 2 * np.pi * np.sqrt((RE + 500.0) ** 3 / MU)
    dt = period / 20.0
    accel = TwoBody()
    rk4_tr = Propagator(Rk4(accel)).propagate(state, 0.0, period, dt)[1]
    dp_tr = Propagator(DormandPrince87(accel)).propagate(
        state, 0.0, period, dt)[1]
    err_rk4 = abs(energy(rk4_tr)[-1] / energy(rk4_tr)[0] - 1.0)
    err_dp = abs(energy(dp_tr)[-1] / energy(dp_tr)[0] - 1.0)
    assert err_dp < err_rk4 / 100.0


def test_fixed_step_batched():
    """The Monte-Carlo fast path: a batch of perturbed states through
    one scan."""
    base = circular_state(600.0)
    batch = base[None, :] + np.random.default_rng(0).normal(
        0, 1e-3, (32, 6))
    times, states = propagate_fixed(TwoBody(), batch, 0.0, 5400.0, 60.0)
    assert states.shape == (91, 32, 6)
    e = energy(np.asarray(states))
    assert np.abs(e[-1] / e[0] - 1.0).max() < 1e-5  # rk4 at 60 s


# ---------------------------------------------------------------------------
# Drag / SRP / third body
# ---------------------------------------------------------------------------


def test_drag_opposes_velocity_and_scales_with_altitude():
    low = circular_state(200.0)
    high = circular_state(800.0)
    d = Drag()
    a_low = np.asarray(d(jnp.asarray(low[:3]), jnp.asarray(low[3:]), 0.0))
    a_high = np.asarray(d(jnp.asarray(high[:3]), jnp.asarray(high[3:]),
                          0.0))
    assert np.dot(a_low, low[3:]) < 0  # opposes velocity
    assert np.linalg.norm(a_low) > 100 * np.linalg.norm(a_high)


def test_improved_drag_corotation():
    state = circular_state(300.0)
    d = ImprovedDrag()
    a = np.asarray(d(jnp.asarray(state[:3]), jnp.asarray(state[3:]), 0.0))
    assert np.linalg.norm(a) > 0
    # denser atmosphere at higher F10.7
    d_hot = ImprovedDrag(f107=250.0)
    a_hot = np.asarray(d_hot(jnp.asarray(state[:3]),
                             jnp.asarray(state[3:]), 0.0))
    assert np.linalg.norm(a_hot) > np.linalg.norm(a)


def test_srp_magnitude_and_shadow():
    srp = SolarRadiationPressure(cr=1.3, area_m2=4.0, mass_kg=1000.0)
    # sunlit: satellite on the sun side
    r_lit = jnp.asarray([7000.0, 0.0, 0.0])
    a_lit = np.asarray(srp(r_lit, jnp.zeros(3), 0.0))
    expected = 4.56e-6 * 1.3 * 4.0 / 1000.0 / 1000.0  # km/s^2
    assert abs(np.linalg.norm(a_lit) / expected - 1.0) < 0.01
    assert a_lit[0] < 0  # pushes away from sun (+x)
    # shadowed: directly behind earth
    a_dark = np.asarray(srp(jnp.asarray([-7000.0, 0.0, 0.0]),
                            jnp.zeros(3), 0.0))
    assert np.linalg.norm(a_dark) == 0.0


def test_third_body_tidal_magnitude():
    """Tidal acceleration from the sun at LEO ~ 2 mu_s r / d^3
    (ForceModel.zig:449-466)."""
    mu_sun = 1.32712440018e11
    sun = lambda t: jnp.asarray([AU_KM, 0.0, 0.0])
    tb = ThirdBody(mu_sun, sun)
    r = jnp.asarray([7000.0, 0.0, 0.0])
    a = np.asarray(tb(r, jnp.zeros(3), 0.0))
    expected = 2 * mu_sun * 7000.0 / AU_KM ** 3
    assert abs(np.linalg.norm(a) / expected - 1.0) < 0.01


# ---------------------------------------------------------------------------
# propagate_numerical surface
# ---------------------------------------------------------------------------


def test_propagate_numerical_api():
    state = circular_state(500.0)
    times, states = propagate_numerical(state, 0.0, 5400.0, 600.0,
                                        j2=EARTH.j2)
    assert times.shape == (10,)
    assert states.shape == (10, 6)
    rn = np.linalg.norm(states[:, :3], axis=-1)
    assert np.all((rn > RE + 400) & (rn < RE + 600))
    t2, s2 = propagate_numerical(state, 0.0, 5400.0, 60.0,
                                 integrator="rk4")
    assert s2.shape[0] == 91


def test_third_body_battin_matches_naive_where_naive_is_accurate():
    """Battin's cancellation-free third-body form must equal the naive
    d/|d|^3 - rb/|rb|^3 difference in the regime where the naive f64
    computation is still accurate (nearby body), and stay consistent
    for the Sun (where the naive form loses ~5 leading digits)."""
    import jax.numpy as jnp
    import numpy as np

    from astroz_tpu.propagators.forces import ThirdBody

    r = jnp.asarray([[7000.0, 1000.0, -2000.0]])
    for mu_b, rb in ((4902.800066, np.array([384400.0, 0.0, 0.0])),
                     (1.32712440018e11, np.array([1.496e8, 0.0, 0.0]))):
        a_b = np.asarray(ThirdBody(mu_b, lambda t: jnp.asarray(rb))(
            r, None, 0.0))[0]
        d = rb - np.asarray(r)[0]
        a_n = mu_b * (d / np.linalg.norm(d) ** 3
                      - rb / np.linalg.norm(rb) ** 3)
        assert abs((a_b - a_n) / np.linalg.norm(a_b)).max() < 1e-11
