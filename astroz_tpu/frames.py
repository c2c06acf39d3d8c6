"""Coordinate frames: TEME->ECEF rotation and ECEF->geodetic conversion.

TPU-native rebuild of ``src/WorldCoordinateSystem.zig`` (GMST rotation at
WorldCoordinateSystem.zig:87-95/:134-143, fixed-iteration geodetic at
:98-131). Everything here is elementwise jnp so it fuses straight into
the propagation kernels (the reference instead precomputes per-time GMST
sin/cos and rotates in the output loop, Constellation.zig:276-284).
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import (RAD2DEG, TWO_PI, WGS84, WGS84_ECC_SQ)
from .time import gstime


def teme_to_ecef(r_teme, gmst, xp=jnp):
    """Rotate TEME vectors into ECEF by the GMST z-rotation.

    ``r_teme``: (..., 3); ``gmst``: broadcastable to (...,). ``xp``
    selects the array module (pass numpy for the host-engine route —
    the same module-parametric trick as ops.sgp4.sgp4_init_np).
    """
    sin_g = xp.sin(gmst)
    cos_g = xp.cos(gmst)
    x, y, z = r_teme[..., 0], r_teme[..., 1], r_teme[..., 2]
    xe = cos_g * x + sin_g * y
    ye = -sin_g * x + cos_g * y
    return xp.stack([xe, ye, z], axis=-1)


def ecef_to_teme(r_ecef, gmst):
    return teme_to_ecef(r_ecef, -gmst)


def teme_to_ecef_at_jd(r_teme, jd_ut1):
    return teme_to_ecef(r_teme, gstime(jd_ut1))


def ecef_to_geodetic(r_ecef, iters: int = 10):
    """ECEF (km) -> geodetic (lat rad, lon rad, alt km), WGS-84.

    Fixed-point latitude iteration with a static trip count, exactly the
    reference's <=10-iteration scheme (WorldCoordinateSystem.zig:98-121),
    which is already the XLA-friendly formulation.
    """
    x, y, z = r_ecef[..., 0], r_ecef[..., 1], r_ecef[..., 2]
    lat, lon, alt = ecef_to_geodetic_xyz(x, y, z, iters)
    return jnp.stack([lat, lon, alt], axis=-1)


def ecef_to_geodetic_xyz(x, y, z, iters: int = 10, xp=jnp):
    """Component-plane form of :func:`ecef_to_geodetic` — used by the
    planes output layout so the conversion never materializes a
    minor-dim-3 array. Returns ``(lat, lon, alt)``. ``xp`` selects the
    array module (numpy for the host-engine route)."""
    a = WGS84.radius_earth_km
    e2 = WGS84_ECC_SQ
    lon = xp.arctan2(y, x)
    p = xp.sqrt(x * x + y * y)
    p_safe = xp.where(p > 1e-12, p, 1e-12)
    lat = xp.arctan2(z, p_safe * (1.0 - e2))
    n = xp.full_like(lat, a)
    for _ in range(iters):
        sin_lat = xp.sin(lat)
        n = a / xp.sqrt(1.0 - e2 * sin_lat * sin_lat)
        alt = p_safe / xp.cos(lat) - n
        lat = xp.arctan2(z, p_safe * (1.0 - e2 * n / (n + alt)))
    sin_lat = xp.sin(lat)
    n = a / xp.sqrt(1.0 - e2 * sin_lat * sin_lat)
    alt = p_safe / xp.cos(lat) - n
    return lat, lon, alt


def ecef_to_geodetic_deg(r_ecef):
    """Same as :func:`ecef_to_geodetic` but lat/lon in degrees."""
    g = ecef_to_geodetic(r_ecef)
    return jnp.stack(
        [g[..., 0] * RAD2DEG, g[..., 1] * RAD2DEG, g[..., 2]], axis=-1)


def geodetic_to_ecef(lat, lon, alt_km):
    """Geodetic (rad, rad, km) -> ECEF km (WGS-84)."""
    a = WGS84.radius_earth_km
    e2 = WGS84_ECC_SQ
    sin_lat = jnp.sin(lat)
    n = a / jnp.sqrt(1.0 - e2 * sin_lat * sin_lat)
    x = (n + alt_km) * jnp.cos(lat) * jnp.cos(lon)
    y = (n + alt_km) * jnp.cos(lat) * jnp.sin(lon)
    z = (n * (1.0 - e2) + alt_km) * sin_lat
    return jnp.stack([x, y, z], axis=-1)
