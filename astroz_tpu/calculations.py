"""Astrodynamics math toolbox.

Rebuild of ``src/calculations.zig`` (~30 pure functions: Vector3D ops at
calculations.zig:8-50, element/state conversions at :158-247, Kepler
Newton at :262-281, hohmannTransfer at :110-125, TRIAD at :283-305,
rotation-matrix->quaternion at :357-390, rigid-body attitude RK4 at
:429-462, impulse at :480-485). All functions are jnp-elementwise and
broadcast over leading axes, so the same code serves scalars, catalogs,
and Monte-Carlo ensembles.

Formulas are the standard published ones (Vallado ch. 2; Markley &
Crassidis for TRIAD/quaternions).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .constants import EARTH, TWO_PI

MU_EARTH = EARTH.mu


class OrbitalElements(NamedTuple):
    """Classical Keplerian elements (angles rad, sma km)."""

    semi_major_axis: jnp.ndarray
    eccentricity: jnp.ndarray
    inclination: jnp.ndarray
    raan: jnp.ndarray
    argument_of_perigee: jnp.ndarray
    true_anomaly: jnp.ndarray
    mean_anomaly: jnp.ndarray


# ---------------------------------------------------------------------------
# Kepler equation
# ---------------------------------------------------------------------------


def solve_kepler_newton(mean_anomaly, eccentricity, iters: int = 20,
                        tol: float = 1e-12):
    """Classical Kepler M = E - e sin E via damped Newton
    (calculations.zig:262-281). Fixed-trip masked loop."""
    m = jnp.remainder(jnp.asarray(mean_anomaly), TWO_PI)
    e = jnp.asarray(eccentricity)
    big_e = jnp.where(e > 0.8, jnp.full_like(m, jnp.pi), m)
    done = jnp.zeros(jnp.shape(m + e), bool)
    for _ in range(iters):
        f = big_e - e * jnp.sin(big_e) - m
        fp = 1.0 - e * jnp.cos(big_e)
        step = f / fp
        big_e = jnp.where(done, big_e, big_e - step)
        done = done | (jnp.abs(step) < tol)
    return big_e


def true_anomaly_from_eccentric(big_e, ecc):
    return 2.0 * jnp.arctan2(jnp.sqrt(1.0 + ecc) * jnp.sin(big_e / 2.0),
                             jnp.sqrt(1.0 - ecc) * jnp.cos(big_e / 2.0))


def eccentric_from_true(nu, ecc):
    return 2.0 * jnp.arctan2(jnp.sqrt(1.0 - ecc) * jnp.sin(nu / 2.0),
                             jnp.sqrt(1.0 + ecc) * jnp.cos(nu / 2.0))


def mean_from_eccentric(big_e, ecc):
    return big_e - ecc * jnp.sin(big_e)


# ---------------------------------------------------------------------------
# Element <-> state conversions (calculations.zig:158-247)
# ---------------------------------------------------------------------------


def elements_to_state(el: OrbitalElements, mu: float = MU_EARTH):
    """Keplerian elements -> inertial (r km, v km/s)."""
    a, e = el.semi_major_axis, el.eccentricity
    nu = el.true_anomaly
    p = a * (1.0 - e * e)
    r_mag = p / (1.0 + e * jnp.cos(nu))
    # perifocal
    cnu, snu = jnp.cos(nu), jnp.sin(nu)
    r_pf = jnp.stack([r_mag * cnu, r_mag * snu, jnp.zeros_like(r_mag)],
                     axis=-1)
    sqmp = jnp.sqrt(mu / p)
    v_pf = jnp.stack([-sqmp * snu, sqmp * (e + cnu),
                      jnp.zeros_like(r_mag)], axis=-1)
    # rotation perifocal -> inertial: Rz(-raan) Rx(-i) Rz(-argp)
    co, so = jnp.cos(el.raan), jnp.sin(el.raan)
    ci, si = jnp.cos(el.inclination), jnp.sin(el.inclination)
    cw, sw = jnp.cos(el.argument_of_perigee), jnp.sin(el.argument_of_perigee)
    r11 = co * cw - so * sw * ci
    r12 = -co * sw - so * cw * ci
    r21 = so * cw + co * sw * ci
    r22 = -so * sw + co * cw * ci
    r31 = sw * si
    r32 = cw * si

    def rot(p3):
        x, y = p3[..., 0], p3[..., 1]
        return jnp.stack([r11 * x + r12 * y, r21 * x + r22 * y,
                          r31 * x + r32 * y], axis=-1)

    return rot(r_pf), rot(v_pf)


def state_to_elements(r, v, mu: float = MU_EARTH) -> OrbitalElements:
    """Inertial state -> classical elements (calculations.zig:216-247)."""
    r = jnp.asarray(r)
    v = jnp.asarray(v)
    r_mag = jnp.linalg.norm(r, axis=-1)
    v_mag = jnp.linalg.norm(v, axis=-1)
    h = jnp.cross(r, v)
    h_mag = jnp.linalg.norm(h, axis=-1)
    n = jnp.stack([-h[..., 1], h[..., 0], jnp.zeros_like(h_mag)], axis=-1)
    n_mag = jnp.linalg.norm(n, axis=-1)
    rv = jnp.sum(r * v, axis=-1)
    e_vec = ((v_mag ** 2 - mu / r_mag)[..., None] * r
             - rv[..., None] * v) / mu
    ecc = jnp.linalg.norm(e_vec, axis=-1)
    energy = 0.5 * v_mag ** 2 - mu / r_mag
    a = -mu / (2.0 * energy)
    incl = jnp.arccos(jnp.clip(h[..., 2] / h_mag, -1.0, 1.0))

    n_safe = jnp.where(n_mag > 1e-12, n_mag, 1.0)
    raan = jnp.arccos(jnp.clip(n[..., 0] / n_safe, -1.0, 1.0))
    raan = jnp.where(n[..., 1] < 0.0, TWO_PI - raan, raan)
    raan = jnp.where(n_mag > 1e-12, raan, 0.0)

    e_safe = jnp.where(ecc > 1e-12, ecc, 1.0)
    ne = jnp.sum(n * e_vec, axis=-1) / (n_safe * e_safe)
    argp = jnp.arccos(jnp.clip(ne, -1.0, 1.0))
    argp = jnp.where(e_vec[..., 2] < 0.0, TWO_PI - argp, argp)
    argp = jnp.where((n_mag > 1e-12) & (ecc > 1e-12), argp, 0.0)

    re_cos = jnp.sum(r * e_vec, axis=-1) / (r_mag * e_safe)
    nu = jnp.arccos(jnp.clip(re_cos, -1.0, 1.0))
    nu = jnp.where(rv < 0.0, TWO_PI - nu, nu)
    # circular orbit: true anomaly from node line
    nr = jnp.sum(n * r, axis=-1) / (n_safe * r_mag)
    nu_circ = jnp.arccos(jnp.clip(nr, -1.0, 1.0))
    nu_circ = jnp.where(r[..., 2] < 0.0, TWO_PI - nu_circ, nu_circ)
    nu = jnp.where(ecc > 1e-12, nu, nu_circ)

    big_e = eccentric_from_true(nu, ecc)
    m = jnp.remainder(mean_from_eccentric(big_e, ecc), TWO_PI)
    return OrbitalElements(a, ecc, incl, raan, argp, nu, m)


def mean_elements_to_state(a, e, i, raan, argp, mean_anom,
                           mu: float = MU_EARTH):
    """Elements with mean anomaly -> state (solves Kepler)."""
    big_e = solve_kepler_newton(mean_anom, e)
    nu = true_anomaly_from_eccentric(big_e, e)
    el = OrbitalElements(jnp.asarray(a), jnp.asarray(e), jnp.asarray(i),
                         jnp.asarray(raan), jnp.asarray(argp), nu,
                         jnp.asarray(mean_anom))
    return elements_to_state(el, mu)


def tle_to_elements(tle, mu: float = MU_EARTH) -> OrbitalElements:
    """TLE mean elements -> osculating-ish classical elements
    (calculations.zig:158-179: direct Kepler conversion, no SGP4)."""
    n_rad_s = tle.no_kozai / 60.0
    a = (mu / (n_rad_s * n_rad_s)) ** (1.0 / 3.0)
    big_e = solve_kepler_newton(tle.mo, tle.ecco)
    nu = true_anomaly_from_eccentric(big_e, tle.ecco)
    return OrbitalElements(jnp.asarray(a), jnp.asarray(tle.ecco),
                           jnp.asarray(tle.inclo), jnp.asarray(tle.nodeo),
                           jnp.asarray(tle.argpo), nu, jnp.asarray(tle.mo))


# ---------------------------------------------------------------------------
# Simple transfers / impulses (calculations.zig:110-125, :480-485)
# ---------------------------------------------------------------------------


def hohmann_transfer(r1_km, r2_km, mu: float = MU_EARTH):
    """Coplanar circular-to-circular transfer. Returns
    (dv1, dv2, total_dv, transfer_time_s)."""
    r1 = jnp.asarray(r1_km, jnp.result_type(1.0))
    r2 = jnp.asarray(r2_km, r1.dtype)
    a_t = 0.5 * (r1 + r2)
    v1 = jnp.sqrt(mu / r1)
    v2 = jnp.sqrt(mu / r2)
    v_p = jnp.sqrt(mu * (2.0 / r1 - 1.0 / a_t))
    v_a = jnp.sqrt(mu * (2.0 / r2 - 1.0 / a_t))
    dv1 = jnp.abs(v_p - v1)
    dv2 = jnp.abs(v2 - v_a)
    t = jnp.pi * jnp.sqrt(a_t ** 3 / mu)
    return dv1, dv2, dv1 + dv2, t


def impulse(v, dv):
    """Apply an instantaneous delta-V (calculations.zig:480-485)."""
    return jnp.asarray(v) + jnp.asarray(dv)


# ---------------------------------------------------------------------------
# Attitude: TRIAD, quaternions, rigid-body propagation
# ---------------------------------------------------------------------------


def triad(v1_body, v2_body, v1_ref, v2_ref):
    """TRIAD attitude determination (calculations.zig:283-305): rotation
    matrix taking reference frame to body frame from two vector pairs."""

    def tri(v1, v2):
        t1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
        c = jnp.cross(v1, v2)
        t2 = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        t3 = jnp.cross(t1, t2)
        return jnp.stack([t1, t2, t3], axis=-1)  # columns

    b = tri(jnp.asarray(v1_body), jnp.asarray(v2_body))
    r = tri(jnp.asarray(v1_ref), jnp.asarray(v2_ref))
    return b @ jnp.swapaxes(r, -1, -2)


def rotmat_to_quaternion(m):
    """Rotation matrix -> quaternion (w, x, y, z), Shepperd's branchless
    variant of calculations.zig:357-390."""
    m = jnp.asarray(m)
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    # four candidate constructions, pick the numerically best by mask
    qw = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    c0 = jnp.stack([qw,
                    (m[..., 2, 1] - m[..., 1, 2]) / (4 * qw),
                    (m[..., 0, 2] - m[..., 2, 0]) / (4 * qw),
                    (m[..., 1, 0] - m[..., 0, 1]) / (4 * qw)], axis=-1)
    c1 = jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / (4 * qx), qx,
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * qx),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * qx)], axis=-1)
    c2 = jnp.stack([(m[..., 0, 2] - m[..., 2, 0]) / (4 * qy),
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * qy), qy,
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * qy)], axis=-1)
    c3 = jnp.stack([(m[..., 1, 0] - m[..., 0, 1]) / (4 * qz),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * qz),
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * qz), qz], axis=-1)
    mags = jnp.stack([t, m00, m11, m22], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.select([best == 0, best == 1, best == 2], [c0, c1, c2], c3)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_multiply(q1, q2):
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], axis=-1)


def quaternion_derivative(q, omega_body):
    """qdot = 0.5 q * [0, omega]."""
    zero = jnp.zeros_like(omega_body[..., 0])
    oq = jnp.stack([zero, omega_body[..., 0], omega_body[..., 1],
                    omega_body[..., 2]], axis=-1)
    return 0.5 * quaternion_multiply(q, oq)


def propagate_attitude(q0, omega0, inertia_diag, torque, dt, n_steps: int):
    """Rigid-body attitude propagation: quaternion kinematics + Euler's
    equations via RK4 over n fixed steps (calculations.zig:429-462).

    Returns (q, omega) after n_steps of dt seconds.
    """
    inertia = jnp.asarray(inertia_diag)
    torque = jnp.asarray(torque)

    def deriv(q, w):
        qd = quaternion_derivative(q, w)
        # Euler: I wdot = T - w x (I w)
        iw = inertia * w
        wd = (torque - jnp.cross(w, iw)) / inertia
        return qd, wd

    def step(carry, _):
        q, w = carry
        k1q, k1w = deriv(q, w)
        k2q, k2w = deriv(q + 0.5 * dt * k1q, w + 0.5 * dt * k1w)
        k3q, k3w = deriv(q + 0.5 * dt * k2q, w + 0.5 * dt * k2w)
        k4q, k4w = deriv(q + dt * k3q, w + dt * k3w)
        q = q + dt / 6.0 * (k1q + 2 * k2q + 2 * k3q + k4q)
        w = w + dt / 6.0 * (k1w + 2 * k2w + 2 * k3w + k4w)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return (q, w), None

    (q, w), _ = jax.lax.scan(step, (jnp.asarray(q0), jnp.asarray(omega0)),
                             None, length=n_steps)
    return q, w
