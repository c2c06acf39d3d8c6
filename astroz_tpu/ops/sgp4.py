"""SGP4 near-earth propagator — TPU-native (pure jnp, branchless).

Implements the standard published SGP4 algorithm (Vallado, "Revisiting
Spacetrack Report #3", AIAA 2006-6753) with the same staging as the
reference's ``src/Sgp4.zig`` (init at Sgp4.zig:108-417, propagate at
:419-603, SIMD twins at :646-867) — but designed for XLA:

* **Elementwise math over arbitrary array shapes.** Every formula is a
  jnp broadcast op, so a single code path covers one satellite, a
  catalog, or an ``(n_sats, n_times)`` dense grid. There is no separate
  "batch" module like ``Sgp4Batch.zig`` — the SoA :class:`Sgp4Elements`
  pytree *is* the batch layout, and XLA tiles it onto the VPU.
* **Branchless lane divergence.** All data-dependent branches (low-perigee
  s-tuning, isimp drag order, Kepler convergence, error states) are
  ``jnp.where`` masks — the same philosophy as the reference's ``@select``
  masks (Sgp4Batch.zig:135-145), which is also exactly what XLA wants.
* **Fixed-trip Newton.** The Kepler solve is a statically unrolled
  10-iteration masked Newton (reference: Sgp4.zig:646-750 uses a masked
  10-iteration loop with early exit; on TPU we keep all lanes running).
* **Errors as data.** Per-lane int32 error codes (python-sgp4 numbering)
  instead of exceptions; failed lanes are zero-filled like the
  reference's batch failure policy (Constellation.zig:511-528).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import GravityModel, TWO_PI, SGP4_DEEP_SPACE_THRESHOLD_MINUTES
from ..time import gstime

X2O3 = 2.0 / 3.0
_TEMP4 = 1.5e-12  # divide-by-zero guard near inclination = 180 deg


class Sgp4Elements(NamedTuple):
    """SoA pytree of precomputed SGP4 coefficients.

    Mirrors the 49-field ``Sgp4.Elements`` struct (Sgp4.zig:33-94) as a
    pytree of f64 arrays; every field has the same leading shape
    ``(n_sats,)`` (or scalar for a single satellite).
    """

    # mean elements at epoch
    no_kozai: jax.Array
    no_unkozai: jax.Array
    ecco: jax.Array
    inclo: jax.Array
    nodeo: jax.Array
    argpo: jax.Array
    mo: jax.Array
    bstar: jax.Array
    # epoch
    epoch_jd: jax.Array
    gsto: jax.Array
    # derived orbit geometry
    a: jax.Array  # semi-major axis, earth radii
    alta: jax.Array
    altp: jax.Array
    # secular rates
    mdot: jax.Array
    argpdot: jax.Array
    nodedot: jax.Array
    nodecf: jax.Array
    # drag coefficients
    cc1: jax.Array
    cc4: jax.Array
    cc5: jax.Array
    d2: jax.Array
    d3: jax.Array
    d4: jax.Array
    t2cof: jax.Array
    t3cof: jax.Array
    t4cof: jax.Array
    t5cof: jax.Array
    omgcof: jax.Array
    xmcof: jax.Array
    eta: jax.Array
    delmo: jax.Array
    sinmao: jax.Array
    # long-period / short-period coefficients
    aycof: jax.Array
    xlcof: jax.Array
    con41: jax.Array
    x1mth2: jax.Array
    x7thm1: jax.Array
    # masks / status
    isimp: jax.Array  # bool: simplified drag (perigee < 220 km or deep space)
    is_deep: jax.Array  # bool: period > 225 min -> needs SDP4
    error: jax.Array  # int32 init error code (0 = ok)

    @property
    def n_sats(self) -> int:
        return self.no_kozai.shape[0] if self.no_kozai.ndim else 1


def _unkozai(no_kozai, ecco, inclo, grav: GravityModel, xp=jnp):
    """Kozai -> Brouwer mean motion recovery (reference: Sgp4.zig:206-228)."""
    cosio = xp.cos(inclo)
    cosio2 = cosio * cosio
    eccsq = ecco * ecco
    omeosq = 1.0 - eccsq
    rteosq = xp.sqrt(omeosq)
    ak = (grav.xke / no_kozai) ** X2O3
    d1 = 0.75 * grav.j2 * (3.0 * cosio2 - 1.0) / (rteosq * omeosq)
    del_ = d1 / (ak * ak)
    adel = ak * (1.0 - del_ * del_
                 - del_ * (1.0 / 3.0 + 134.0 * del_ * del_ / 81.0))
    del_ = d1 / (adel * adel)
    no_unkozai = no_kozai / (1.0 + del_)
    return no_unkozai, omeosq, rteosq, cosio, cosio2


def _sgp4_init_core(xp, grav: GravityModel, *, no_kozai, ecco, inclo,
                    nodeo, argpo, mo, bstar, epoch_jd) -> Sgp4Elements:
    """Module-parametric init body: ``xp`` is ``jnp`` (jitted device
    path) or ``numpy`` (host ingest path — zero XLA compilation, see
    :func:`sgp4_init_np`). Every formula is an elementwise op both
    modules implement identically in f64."""
    dt = xp.float64 if xp is not jnp else xp.result_type(1.0)
    no_kozai = xp.asarray(no_kozai, dt)
    ecco = xp.asarray(ecco, dt)
    inclo = xp.asarray(inclo, dt)
    nodeo = xp.asarray(nodeo, dt)
    argpo = xp.asarray(argpo, dt)
    mo = xp.asarray(mo, dt)
    bstar = xp.asarray(bstar, dt)
    epoch_jd = xp.asarray(epoch_jd, dt)

    re = grav.radius_earth_km
    j2, j3oj2, j4 = grav.j2, grav.j3oj2, grav.j4

    # ---- input validation -> error flags (reference: Sgp4.zig:111-123) --
    safe_no = xp.where(no_kozai > 0.0, no_kozai, 1e-8)
    safe_ecc = xp.clip(ecco, 0.0, 0.999999)

    no_unkozai, omeosq, rteosq, cosio, cosio2 = _unkozai(
        safe_no, safe_ecc, inclo, grav, xp)

    ao = (grav.xke / no_unkozai) ** X2O3
    sinio = xp.sin(inclo)
    po = ao * omeosq
    con42 = 1.0 - 5.0 * cosio2
    con41 = -con42 - cosio2 - cosio2
    posq = po * po
    rp = ao * (1.0 - safe_ecc)
    is_deep = (TWO_PI / no_unkozai) >= SGP4_DEEP_SPACE_THRESHOLD_MINUTES

    gsto = gstime(epoch_jd, xp=xp)

    # ---- s-parameter tuning for low perigee (Sgp4.zig:301-382) ----------
    ss = 78.0 / re + 1.0
    qzms2t = ((120.0 - 78.0) / re) ** 4
    perige = (rp - 1.0) * re

    sfour_adj = xp.where(perige < 98.0, 20.0, perige - 78.0)
    qzms24 = xp.where(perige < 156.0,
                       ((120.0 - sfour_adj) / re) ** 4,
                       qzms2t)
    sfour = xp.where(perige < 156.0, sfour_adj / re + 1.0, ss)

    isimp = (rp < (220.0 / re + 1.0)) | is_deep

    pinvsq = 1.0 / posq
    tsi = 1.0 / (ao - sfour)
    eta = ao * safe_ecc * tsi
    etasq = eta * eta
    eeta = safe_ecc * eta
    psisq = xp.abs(1.0 - etasq)
    coef = qzms24 * tsi ** 4
    coef1 = coef / psisq ** 3.5
    cc2 = coef1 * no_unkozai * (
        ao * (1.0 + 1.5 * etasq + eeta * (4.0 + etasq))
        + 0.375 * j2 * tsi / psisq * con41
        * (8.0 + 3.0 * etasq * (8.0 + etasq)))
    cc1 = bstar * cc2
    big_e = safe_ecc > 1.0e-4
    cc3 = xp.where(
        big_e,
        -2.0 * coef * tsi * j3oj2 * no_unkozai * sinio
        / xp.where(big_e, safe_ecc, 1.0),
        0.0)
    x1mth2 = 1.0 - cosio2
    cc4 = 2.0 * no_unkozai * coef1 * ao * omeosq * (
        eta * (2.0 + 0.5 * etasq)
        + safe_ecc * (0.5 + 2.0 * etasq)
        - j2 * tsi / (ao * psisq)
        * (-3.0 * con41 * (1.0 - 2.0 * eeta + etasq * (1.5 - 0.5 * eeta))
           + 0.75 * x1mth2 * (2.0 * etasq - eeta * (1.0 + etasq))
           * xp.cos(2.0 * argpo)))
    cc5 = 2.0 * coef1 * ao * omeosq * (
        1.0 + 2.75 * (etasq + eeta) + eeta * etasq)

    cosio4 = cosio2 * cosio2
    temp1 = 1.5 * j2 * pinvsq * no_unkozai
    temp2 = 0.5 * temp1 * j2 * pinvsq
    temp3 = -0.46875 * j4 * pinvsq * pinvsq * no_unkozai
    mdot = (no_unkozai + 0.5 * temp1 * rteosq * con41
            + 0.0625 * temp2 * rteosq
            * (13.0 - 78.0 * cosio2 + 137.0 * cosio4))
    argpdot = (-0.5 * temp1 * con42
               + 0.0625 * temp2 * (7.0 - 114.0 * cosio2 + 395.0 * cosio4)
               + temp3 * (3.0 - 36.0 * cosio2 + 49.0 * cosio4))
    xhdot1 = -temp1 * cosio
    nodedot = xhdot1 + (0.5 * temp2 * (4.0 - 19.0 * cosio2)
                        + 2.0 * temp3 * (3.0 - 7.0 * cosio2)) * cosio
    omgcof = bstar * cc3 * xp.cos(argpo)
    xmcof = xp.where(big_e,
                      -X2O3 * coef * bstar / xp.where(big_e, eeta, 1.0),
                      0.0)
    nodecf = 3.5 * omeosq * xhdot1 * cc1
    t2cof = 1.5 * cc1

    near_180 = xp.abs(cosio + 1.0) > 1.5e-12
    xlcof = xp.where(
        near_180,
        -0.25 * j3oj2 * sinio * (3.0 + 5.0 * cosio)
        / xp.where(near_180, 1.0 + cosio, 1.0),
        -0.25 * j3oj2 * sinio * (3.0 + 5.0 * cosio) / _TEMP4)
    aycof = -0.5 * j3oj2 * sinio
    delmo = (1.0 + eta * xp.cos(mo)) ** 3
    sinmao = xp.sin(mo)
    x7thm1 = 7.0 * cosio2 - 1.0

    # ---- higher-order drag (isimp == 0 only; Sgp4.zig:394-417) ----------
    cc1sq = cc1 * cc1
    d2 = 4.0 * ao * tsi * cc1sq
    temp = d2 * tsi * cc1 / 3.0
    d3 = (17.0 * ao + sfour) * temp
    d4 = 0.5 * temp * ao * tsi * (221.0 * ao + 31.0 * sfour) * cc1
    t3cof = d2 + 2.0 * cc1sq
    t4cof = 0.25 * (3.0 * d3 + cc1 * (12.0 * d2 + 10.0 * cc1sq))
    t5cof = 0.2 * (3.0 * d4 + 12.0 * cc1 * d3 + 6.0 * d2 * d2
                   + 15.0 * cc1sq * (2.0 * d2 + cc1sq))
    zero = xp.zeros_like(d2)
    d2 = xp.where(isimp, zero, d2)
    d3 = xp.where(isimp, zero, d3)
    d4 = xp.where(isimp, zero, d4)
    t3cof = xp.where(isimp, zero, t3cof)
    t4cof = xp.where(isimp, zero, t4cof)
    t5cof = xp.where(isimp, zero, t5cof)

    error = xp.zeros(xp.shape(no_unkozai), xp.int32)
    error = xp.where((ecco >= 1.0) | (ecco < -0.001), xp.int32(1), error)
    error = xp.where(no_kozai <= 0.0, xp.int32(2), error)

    return Sgp4Elements(
        no_kozai=no_kozai, no_unkozai=no_unkozai, ecco=ecco, inclo=inclo,
        nodeo=nodeo, argpo=argpo, mo=mo, bstar=bstar, epoch_jd=epoch_jd,
        gsto=gsto, a=ao, alta=ao * (1.0 + safe_ecc) - 1.0,
        altp=ao * (1.0 - safe_ecc) - 1.0, mdot=mdot, argpdot=argpdot,
        nodedot=nodedot, nodecf=nodecf, cc1=cc1, cc4=cc4, cc5=cc5, d2=d2,
        d3=d3, d4=d4, t2cof=t2cof, t3cof=t3cof, t4cof=t4cof, t5cof=t5cof,
        omgcof=omgcof, xmcof=xmcof, eta=eta, delmo=delmo, sinmao=sinmao,
        aycof=aycof, xlcof=xlcof, con41=con41, x1mth2=x1mth2,
        x7thm1=x7thm1, isimp=isimp, is_deep=is_deep, error=error,
    )


@partial(jax.jit, static_argnames=("grav",))
def sgp4_init(grav: GravityModel, *, no_kozai, ecco, inclo, nodeo, argpo,
              mo, bstar, epoch_jd) -> Sgp4Elements:
    """Precompute SGP4 coefficients for one or many satellites.

    All arguments broadcast elementwise; pass full-catalog arrays to get
    a vectorized init (the analogue of the reference's per-satellite
    ``initElements`` loop + SoA transpose, Sgp4.zig:108-417 /
    Sgp4Batch.zig:78-110, fused into one XLA program). Jitted: on a
    remote TPU backend an unjitted init pays one network round trip per
    elementwise op — ~400 s for a full catalog vs ~1 s compiled.
    """
    return _sgp4_init_core(
        jnp, grav, no_kozai=no_kozai, ecco=ecco, inclo=inclo, nodeo=nodeo,
        argpo=argpo, mo=mo, bstar=bstar, epoch_jd=epoch_jd)


def sgp4_init_np(grav: GravityModel, *, no_kozai, ecco, inclo, nodeo,
                 argpo, mo, bstar, epoch_jd) -> Sgp4Elements:
    """Numpy-executed init: identical formulas, zero XLA compilation.

    The host ingest path (propagation.build_catalog) uses this — a full
    13k-satellite catalog inits in ~30 ms of numpy versus ~3.4 s of
    one-shot XLA compile per process for the jitted form. Returns an
    :class:`Sgp4Elements` whose leaves are numpy arrays (device_put by
    the catalog layer in a few packed transfers)."""
    import numpy as np
    return _sgp4_init_core(
        np, grav, no_kozai=no_kozai, ecco=ecco, inclo=inclo, nodeo=nodeo,
        argpo=argpo, mo=mo, bstar=bstar, epoch_jd=epoch_jd)


def solve_kepler(u, axnl, aynl, iters: int = 10):
    """Equinoctial Kepler solve: fixed-trip masked Newton.

    Reference: Sgp4.zig:495-546 (scalar) / :687-694 (SIMD masked loop with
    early exit). On TPU we statically unroll ``iters`` steps and freeze
    converged lanes with a mask — identical numerics, no data-dependent
    control flow.
    """
    eo1 = u
    done = jnp.zeros(jnp.shape(u), bool)
    sineo1 = jnp.sin(eo1)
    coseo1 = jnp.cos(eo1)
    for _ in range(iters):
        denom = 1.0 - coseo1 * axnl - sineo1 * aynl
        tem5 = (u - aynl * coseo1 + axnl * sineo1 - eo1) / denom
        tem5 = jnp.clip(tem5, -0.95, 0.95)
        eo1 = jnp.where(done, eo1, eo1 + tem5)
        done = done | (jnp.abs(tem5) < 1.0e-12)
        sineo1 = jnp.sin(eo1)
        coseo1 = jnp.cos(eo1)
    return eo1, sineo1, coseo1


def kepler_and_posvel(grav: GravityModel, *, am, nm, ep, xincp, nodep,
                      argpp, mp, aycof, xlcof, con41, x1mth2, x7thm1,
                      error):
    """Shared tail of SGP4 & SDP4: long-period terms, Kepler solve,
    short-period corrections, orientation vectors -> TEME km / km/s.

    Reference: the shared ``keplerAndPosVel`` stage (Sgp4.zig:646-750) +
    ``applyShortPeriodCorrections`` / ``computePositionVelocity``
    (Sgp4.zig:557-603).
    """
    sinip = jnp.sin(xincp)
    cosip = jnp.cos(xincp)

    axnl = ep * jnp.cos(argpp)
    temp = 1.0 / (am * (1.0 - ep * ep))
    aynl = ep * jnp.sin(argpp) + temp * aycof
    xl = mp + argpp + nodep + temp * xlcof * axnl

    u = jnp.remainder(xl - nodep, TWO_PI)
    eo1, sineo1, coseo1 = solve_kepler(u, axnl, aynl)

    # short-period preliminary quantities
    ecose = axnl * coseo1 + aynl * sineo1
    esine = axnl * sineo1 - aynl * coseo1
    el2 = axnl * axnl + aynl * aynl
    pl = am * (1.0 - el2)
    error = jnp.where((pl < 0.0) & (error == 0), 4, error)
    pl_safe = jnp.where(pl > 0.0, pl, 1.0)

    rl = am * (1.0 - ecose)
    rdotl = jnp.sqrt(am) * esine / rl
    rvdotl = jnp.sqrt(pl_safe) / rl
    betal = jnp.sqrt(jnp.abs(1.0 - el2))
    temp = esine / (1.0 + betal)
    sinu = am / rl * (sineo1 - aynl - axnl * temp)
    cosu = am / rl * (coseo1 - axnl + aynl * temp)
    su = jnp.arctan2(sinu, cosu)
    sin2u = (cosu + cosu) * sinu
    cos2u = 1.0 - 2.0 * sinu * sinu
    temp = 1.0 / pl_safe
    temp1 = 0.5 * grav.j2 * temp
    temp2 = temp1 * temp

    mrt = (rl * (1.0 - 1.5 * temp2 * betal * con41)
           + 0.5 * temp1 * x1mth2 * cos2u)
    su = su - 0.25 * temp2 * x7thm1 * sin2u
    xnode = nodep + 1.5 * temp2 * cosip * sin2u
    xinc = xincp + 1.5 * temp2 * cosip * sinip * cos2u
    mvt = rdotl - nm * temp1 * x1mth2 * sin2u / grav.xke
    rvdot = rvdotl + nm * temp1 * (x1mth2 * cos2u + 1.5 * con41) / grav.xke

    # orientation vectors
    sinsu = jnp.sin(su)
    cossu = jnp.cos(su)
    snod = jnp.sin(xnode)
    cnod = jnp.cos(xnode)
    sini = jnp.sin(xinc)
    cosi = jnp.cos(xinc)
    xmx = -snod * cosi
    xmy = cnod * cosi
    ux = xmx * sinsu + cnod * cossu
    uy = xmy * sinsu + snod * cossu
    uz = sini * sinsu
    vx = xmx * cossu - cnod * sinsu
    vy = xmy * cossu - snod * sinsu
    vz = sini * cossu

    re = grav.radius_earth_km
    vkmpersec = re * grav.xke / 60.0
    mrt_re = mrt * re
    r = jnp.stack([mrt_re * ux, mrt_re * uy, mrt_re * uz], axis=-1)
    v = jnp.stack(
        [vkmpersec * (mvt * ux + rvdot * vx),
         vkmpersec * (mvt * uy + rvdot * vy),
         vkmpersec * (mvt * uz + rvdot * vz)], axis=-1)

    error = jnp.where((mrt < 1.0) & (error == 0), 6, error)  # decayed
    ok = (error == 0)[..., None]
    r = jnp.where(ok, r, 0.0)
    v = jnp.where(ok, v, 0.0)
    return r, v, error


def update_secular(els: Sgp4Elements, tsince):
    """Near-earth secular + drag update (reference: Sgp4.zig:435-477,
    branchless SIMD twin at :787-867 / Sgp4Batch.zig:113-157).

    Returns the mean elements at time ``tsince`` (minutes from epoch).
    """
    t = tsince
    xmdf = els.mo + els.mdot * t
    argpdf = els.argpo + els.argpdot * t
    nodedf = els.nodeo + els.nodedot * t
    t2 = t * t
    nodem = nodedf + els.nodecf * t2
    tempa = 1.0 - els.cc1 * t
    tempe = els.bstar * els.cc4 * t
    templ = els.t2cof * t2

    # higher-order drag, masked by isimp (Sgp4Batch.zig:135-145)
    delomg = els.omgcof * t
    delmtemp = 1.0 + els.eta * jnp.cos(xmdf)
    delm = els.xmcof * (delmtemp ** 3 - els.delmo)
    tempd = delomg + delm
    not_simp = ~els.isimp
    mm = jnp.where(not_simp, xmdf + tempd, xmdf)
    argpm = jnp.where(not_simp, argpdf - tempd, argpdf)
    t3 = t2 * t
    t4 = t3 * t
    tempa = tempa - els.d2 * t2 - els.d3 * t3 - els.d4 * t4
    tempe = tempe + jnp.where(
        not_simp, els.bstar * els.cc5 * (jnp.sin(mm) - els.sinmao), 0.0)
    templ = templ + els.t3cof * t3 + els.t4cof * t4 + t4 * t * els.t5cof

    return mm, argpm, nodem, tempa, tempe, templ


def sgp4_propagate(els: Sgp4Elements, tsince, grav: GravityModel):
    """Propagate near-earth satellites to ``tsince`` minutes from epoch.

    ``tsince`` broadcasts against the element arrays: pass shape
    ``(n_sats,)`` elements and ``(n_times, 1)`` times to get a dense
    ``(n_times, n_sats)`` grid in one fused XLA program — the analogue of
    the reference's threaded time-major sweep (Constellation.zig:337-358).

    Returns ``(r, v, error)`` with ``r``/``v`` shaped ``(..., 3)`` in the
    TEME frame (km, km/s) and int32 python-sgp4 error codes.
    """
    t = jnp.asarray(tsince, els.no_kozai.dtype)
    mm, argpm, nodem, tempa, tempe, templ = update_secular(els, t)

    nm = els.no_unkozai
    em = els.ecco
    inclm = els.inclo
    error = jnp.broadcast_to(els.error,
                             jnp.broadcast_shapes(els.error.shape,
                                                  jnp.shape(t))).astype(jnp.int32)

    error = jnp.where((nm <= 0.0) & (error == 0), 2, error)
    nm_safe = jnp.where(nm > 0.0, nm, 1e-8)
    am = (grav.xke / nm_safe) ** X2O3 * tempa * tempa
    nm = grav.xke / jnp.where(am > 0.0, am, 1.0) ** 1.5
    em = em - tempe

    error = jnp.where(((em >= 1.0) | (em < -0.001)) & (error == 0), 1,
                      error)
    em = jnp.clip(em, 1.0e-6, 0.999999)
    mm = mm + els.no_unkozai * templ
    xlm = mm + argpm + nodem

    nodem = jnp.remainder(nodem, TWO_PI)
    argpm = jnp.remainder(argpm, TWO_PI)
    xlm = jnp.remainder(xlm, TWO_PI)
    mm = jnp.remainder(xlm - argpm - nodem, TWO_PI)

    return kepler_and_posvel(
        grav, am=am, nm=nm, ep=em, xincp=inclm, nodep=nodem, argpp=argpm,
        mp=mm, aycof=els.aycof, xlcof=els.xlcof, con41=els.con41,
        x1mth2=els.x1mth2, x7thm1=els.x7thm1, error=error)
