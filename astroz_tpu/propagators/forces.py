"""Force models as composable pure acceleration functions.

Rebuild of ``src/propagators/ForceModel.zig`` (vtable interface at
ForceModel.zig:13-40; TwoBody :42-56, J2 :58-80, Drag :82-111, J3
:113-143, J4 :145-176, SRP + cylindrical shadow :178-228, ThirdBody
Battin :230-266, ImprovedDrag 5-layer atmosphere :268-349, Composite
:351-375). Formulas are the standard published ones (Vallado,
"Fundamentals of Astrodynamics and Applications", ch. 8-9).

A force model here is any callable ``accel(r, v, t) -> a`` with r in
km, v in km/s, t in seconds, a in km/s^2 — broadcasting over leading
axes so one model propagates a whole Monte-Carlo ensemble. Instead of
the reference's mutable ``sunPos``/``bodyPos`` fields (ForceModel.zig:
184,236), time-varying geometry is a ``pos_fn(t)`` callable.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ..constants import EARTH, SOLAR_PRESSURE, AU_KM

Accel = Callable[..., jnp.ndarray]

_MU = EARTH.mu
_RE = EARTH.eq_radius
_J2 = EARTH.j2
_J3 = EARTH.j3
_J4 = EARTH.j4


def _norm(r):
    return jnp.linalg.norm(r, axis=-1, keepdims=True)


def TwoBody(mu: float = _MU) -> Accel:
    """Point-mass gravity (ForceModel.zig:42-56)."""

    def accel(r, v, t):
        rn = _norm(r)
        return -mu * r / rn ** 3

    return accel


def J2(mu: float = _MU, j2: float = _J2, r_eq: float = _RE) -> Accel:
    """First zonal harmonic (ForceModel.zig:58-80)."""

    def accel(r, v, t):
        rn = _norm(r)
        z2 = (r[..., 2:3] / rn) ** 2
        k = -1.5 * j2 * mu * r_eq ** 2 / rn ** 5
        xy_term = 1.0 - 5.0 * z2
        z_term = 3.0 - 5.0 * z2
        return k * jnp.concatenate(
            [r[..., 0:1] * xy_term, r[..., 1:2] * xy_term,
             r[..., 2:3] * z_term], axis=-1)

    return accel


def J3(mu: float = _MU, j3: float = _J3, r_eq: float = _RE) -> Accel:
    """Second zonal harmonic (ForceModel.zig:113-143)."""

    def accel(r, v, t):
        rn = _norm(r)
        z = r[..., 2:3]
        zr = z / rn
        k = -2.5 * j3 * mu * r_eq ** 3 / rn ** 7
        xy_term = 3.0 * z - 7.0 * z * zr * zr
        z_term = 6.0 * z * zr - 7.0 * z * zr ** 3 - 0.6 * rn
        ax = k * r[..., 0:1] * xy_term
        ay = k * r[..., 1:2] * xy_term
        az = k * rn * z_term
        return jnp.concatenate([ax, ay, az], axis=-1)

    return accel


def J4(mu: float = _MU, j4: float = _J4, r_eq: float = _RE) -> Accel:
    """Third zonal harmonic (ForceModel.zig:145-176)."""

    def accel(r, v, t):
        rn = _norm(r)
        zr = r[..., 2:3] / rn
        zr2 = zr * zr
        zr4 = zr2 * zr2
        k = 1.875 * j4 * mu * r_eq ** 4 / rn ** 7
        xy_term = 1.0 - 14.0 * zr2 + 21.0 * zr4
        z_term = 5.0 - 70.0 * zr2 / 3.0 + 21.0 * zr4
        return k * jnp.concatenate(
            [r[..., 0:1] * xy_term, r[..., 1:2] * xy_term,
             r[..., 2:3] * z_term], axis=-1)

    return accel


def Drag(cd: float = 2.2, area_m2: float = 4.0, mass_kg: float = 1000.0,
         rho0: float = EARTH.sea_level_density,
         scale_height_m: float = EARTH.scale_height,
         r_eq: float = _RE) -> Accel:
    """Exponential-atmosphere drag (ForceModel.zig:82-111).

    Static atmosphere (no co-rotation) like the reference's basic model.
    """
    bc = cd * area_m2 / mass_kg  # m^2/kg

    def accel(r, v, t):
        rn = _norm(r)
        alt_m = (rn - r_eq) * 1000.0
        rho = rho0 * jnp.exp(-alt_m / scale_height_m)  # kg/m^3
        vn = _norm(v)
        # a [km/s^2] = -0.5 rho bc |v| v * 1000 (unit bookkeeping: v in
        # km/s; rho*bc in 1/m; 0.5*rho*bc*|v|^2 [km^2/s^2 / m] -> *1e3 km)
        return -0.5 * rho * bc * 1000.0 * vn * v

    return accel


#: US Standard Atmosphere layers (base altitude km, density kg/m^3,
#: scale height km) — reference: ForceModel.zig:268-320
_ATMO_LAYERS = (
    (0.0, 1.225, 8.44),
    (100.0, 5.297e-7, 6.05),
    (200.0, 2.789e-10, 37.5),
    (500.0, 6.967e-13, 71.8),
    (1000.0, 3.019e-15, 268.0),
)


def ImprovedDrag(cd: float = 2.2, area_m2: float = 4.0,
                 mass_kg: float = 1000.0, f107: float = 150.0,
                 r_eq: float = _RE,
                 rotation_rate: float = EARTH.rotation_rate) -> Accel:
    """Layered-atmosphere drag with solar-activity scaling and a
    co-rotating atmosphere (ForceModel.zig:268-349)."""
    bc = cd * area_m2 / mass_kg

    def accel(r, v, t):
        rn = _norm(r)
        alt = rn - r_eq  # km
        # piecewise-exponential density, branchless over the 5 layers
        rho = jnp.zeros_like(alt)
        for i, (base, rho0, h) in enumerate(_ATMO_LAYERS):
            upper = (_ATMO_LAYERS[i + 1][0] if i + 1 < len(_ATMO_LAYERS)
                     else jnp.inf)
            in_layer = (alt >= base) & (alt < upper)
            rho = jnp.where(in_layer,
                            rho0 * jnp.exp(-(alt - base) / h), rho)
        # solar activity scaling (reference: linear in F10.7 around 150)
        rho = rho * (1.0 + 0.3 * (f107 - 150.0) / 150.0)
        # velocity relative to the co-rotating atmosphere:
        # v_rel = v - omega x r, omega = [0, 0, rotation_rate]
        vrel = jnp.stack(
            [v[..., 0] + rotation_rate * r[..., 1],
             v[..., 1] - rotation_rate * r[..., 0],
             v[..., 2]], axis=-1)
        vn = _norm(vrel)
        return -0.5 * rho * bc * 1000.0 * vn * vrel

    return accel


def SolarRadiationPressure(cr: float = 1.3, area_m2: float = 4.0,
                           mass_kg: float = 1000.0,
                           sun_pos_fn: Optional[Callable] = None,
                           r_eq: float = _RE) -> Accel:
    """Cannonball SRP with cylindrical Earth shadow
    (ForceModel.zig:178-228). ``sun_pos_fn(t) -> (..., 3) km`` defaults
    to a fixed sun on the +X axis at 1 AU like the reference default.
    """
    k = SOLAR_PRESSURE * cr * area_m2 / mass_kg / 1000.0  # km/s^2 at 1 AU

    def accel(r, v, t):
        if sun_pos_fn is None:
            sun = jnp.zeros_like(r).at[..., 0].set(AU_KM)
        else:
            sun = jnp.broadcast_to(sun_pos_fn(t), r.shape)
        to_sun = sun - r
        d = _norm(to_sun)
        u = to_sun / d
        # cylindrical shadow: dark iff anti-sunward and within one
        # earth radius of the sun-earth axis
        sun_n = sun / _norm(sun)
        along = jnp.sum(r * sun_n, axis=-1, keepdims=True)
        perp = _norm(r - along * sun_n)
        lit = (along > 0.0) | (perp > r_eq)
        scale = (AU_KM / d) ** 2
        return jnp.where(lit, -k * scale * u, 0.0)

    return accel


def ThirdBody(mu_body: float, pos_fn: Callable) -> Accel:
    """Third-body tidal acceleration, Battin's formulation
    (ForceModel.zig:230-266). ``pos_fn(t) -> (..., 3) km`` gives the
    body's geocentric position.

    The naive ``d/|d|^3 - rb/|rb|^3`` difference cancels its ~4-5
    leading digits for a distant body (Sun at 1 AU vs a LEO radius:
    |r|/|rb| ~ 5e-5); Battin's identity rewrites it WITHOUT the
    subtraction:  a = -mu_b (r + f(q) rb) / |d|^3  with
    q = r.(r - 2 rb)/(rb.rb)  and
    f(q) = q (3 + 3q + q^2) / (1 + (1+q)^{3/2}),
    where every term is O(q) ~ 2 |r|/|rb| — no cancellation."""

    def accel(r, v, t):
        rb = jnp.broadcast_to(pos_fn(t), r.shape)
        d = rb - r                     # satellite -> body
        dn = _norm(d)
        rbsq = jnp.sum(rb * rb, axis=-1, keepdims=True)
        q = jnp.sum(r * (r - 2.0 * rb), axis=-1, keepdims=True) / rbsq
        fq = q * (3.0 + q * (3.0 + q)) \
            / (1.0 + (1.0 + q) * jnp.sqrt(1.0 + q))
        return -mu_body * (r + fq * rb) / dn ** 3

    return accel


def Composite(models: Sequence[Accel]) -> Accel:
    """Sum of force models (ForceModel.zig:351-375)."""
    models = tuple(models)

    def accel(r, v, t):
        total = models[0](r, v, t)
        for m in models[1:]:
            total = total + m(r, v, t)
        return total

    return accel


def earth_default_forces(j2: bool = True, drag: bool = False,
                         **drag_kwargs) -> Accel:
    """Convenience: TwoBody [+J2] [+Drag] like the reference's
    propagate_numerical default stack (propagator.zig:106-147)."""
    models = [TwoBody()]
    if j2:
        models.append(J2())
    if drag:
        models.append(Drag(**drag_kwargs))
    return Composite(models)
