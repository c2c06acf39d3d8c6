"""Split-precision unified SGP4/SDP4 propagation — the TPU hot path.

TPU v5e has no native f64 ALU: XLA emulates f64 at ~5-10x the cost of
f32, and the all-f64 kernel in ``ops.sgp4``/``ops.sdp4`` measures ~10x
below the f32 ceiling. But all-f32 breaks the <100 m accuracy budget,
because the secular angles grow linearly with time (mo + mdot*t reaches
~1e2..1e5 rad, where f32 resolution is 1e-5..1e-2 rad = km-scale error).

This module keeps a thin **f64 spine** — the ~25 flops that accumulate
time-growing angles and the deep-space resonance integration — reduces
every angle mod 2pi, then runs the transcendental-heavy tail (drag
polynomials, lunisolar periodics, Kepler solve, short-period
corrections, orientation vectors) in f32 with :mod:`fastmath`'s
polynomial sincos. Two algebraic tricks buy extra accuracy and speed:

* ``u = mm + argpm (+ long-period term)`` is formed **in the f64 spine**
  before reduction — the f64 path's ``xl - nodep`` cancellation
  (Sgp4.zig:646-660) is done symbolically, so Kepler's argument never
  suffers the f32 quantization of a ~4pi sum, and the non-simp ``tempd``
  term cancels exactly (mm + tempd) + (argpm - tempd).
* ``su``'s atan2 and the sinsu/cossu, snod/cnod, sini/cosi sincos calls
  are replaced by the addition theorem on the already-known
  (sinu, cosu), (sin nodep, cos nodep), (sinip, cosip) with Taylor
  sincos of the tiny J2 corrections (:func:`fastmath.angle_add`) —
  the corrections are O(J2/p^2) <= ~2e-3 rad.

Accuracy: ~2-10 m vs the f64 path over 1440 min (test-gated), far inside
the reference's <100 m budget vs python-sgp4 (README.md:55-57).

Near-earth-only catalogs skip the deep-space stages at trace time;
mixed catalogs run them densely with zeroed coefficients on near-earth
lanes, exactly like :func:`ops.sdp4.sdp4_propagate`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import GravityModel, TWO_PI
from .fastmath import angle_add, div_pos, recip_pos, sincos
from .sgp4 import Sgp4Elements
from .sdp4 import (DeepElements, ResonanceCarry, FASX2, FASX4, FASX6, G22,
                   G32, G44, G52, G54, RPTIM, STEPP, STEP2, ZEL, ZES, ZNL,
                   ZNS)

F32 = jnp.float32
PI = 3.14159265358979323846


def _f32(x):
    return jnp.asarray(x, F32)


def _wrap_two_pi_f32(x):
    """Cheap wrap into [0, 2pi) for |x| < ~4pi (post-reduction sums)."""
    two_pi = _f32(TWO_PI)
    x = jnp.where(x >= two_pi, x - two_pi, x)
    x = jnp.where(x >= two_pi, x - two_pi, x)
    x = jnp.where(x < 0.0, x + two_pi, x)
    return x


def _resonance_derivs_fast(deep: DeepElements, els: Sgp4Elements, xli, xni,
                           atime):
    """Resonance acceleration series with f32 polynomial sincos.

    State (xli, xni, atime) stays f64 — only the bounded sine-series
    evaluation (reference: computeResonanceAccel, Sdp4.zig:824-866)
    drops to f32: the series terms are perturbation-scale (<=1e-7), so
    f32 relative error is ~1e-14 absolute, far below the integration
    tolerance. Arguments are mod-reduced in f64 before the cast.
    """
    xli32 = _f32(jnp.remainder(xli, TWO_PI))
    xomi32 = _f32(jnp.remainder(els.argpo + els.argpdot * atime, TWO_PI))
    s_li, c_li = sincos(xli32)
    # double angles exactly from single-angle sincos
    s_2li = 2.0 * s_li * c_li
    c_2li = 1.0 - 2.0 * s_li * s_li
    s_omi, c_omi = sincos(xomi32)
    s_2omi = 2.0 * s_omi * c_omi
    c_2omi = 1.0 - 2.0 * s_omi * s_omi

    import math

    def sc_sum(sa, ca, sb, cb):
        # sin/cos of (a + b)
        return sa * cb + ca * sb, ca * cb - sa * sb

    def sc_shift(s, c, const):
        # sin/cos of (x - const), const folded at trace time
        sk, ck = math.sin(const), math.cos(const)
        return s * ck - c * sk, c * ck + s * sk

    # geosynchronous 3-term series (irez == 1); sin/cos(3x) via addition
    s_3li, c_3li = sc_sum(s_2li, c_2li, s_li, c_li)
    s1, c1 = sc_shift(s_li, c_li, FASX2)
    s2, c2 = sc_shift(s_2li, c_2li, 2.0 * FASX4)
    s3, c3 = sc_shift(s_3li, c_3li, 3.0 * FASX6)
    del1, del2, del3 = _f32(deep.del1), _f32(deep.del2), _f32(deep.del3)
    xndt_1 = del1 * s1 + del2 * s2 + del3 * s3
    xnddt_1 = del1 * c1 + 2.0 * del2 * c2 + 3.0 * del3 * c3

    # half-day 10-term series (irez == 2)
    s_o_l, c_o_l = sc_sum(s_omi, c_omi, s_li, c_li)          # omi + li
    s_no_l, c_no_l = sc_sum(-s_omi, c_omi, s_li, c_li)       # -omi + li
    s_2o_l, c_2o_l = sc_sum(s_2omi, c_2omi, s_li, c_li)      # 2omi + li
    s_2o_2l, c_2o_2l = sc_sum(s_2omi, c_2omi, s_2li, c_2li)  # 2omi + 2li
    s_o_2l, c_o_2l = sc_sum(s_omi, c_omi, s_2li, c_2li)      # omi + 2li
    s_no_2l, c_no_2l = sc_sum(-s_omi, c_omi, s_2li, c_2li)   # -omi + 2li

    shifted = sc_shift
    terms = [
        (deep.d2201, shifted(s_2o_l, c_2o_l, G22)),
        (deep.d2211, shifted(s_li, c_li, G22)),
        (deep.d3210, shifted(s_o_l, c_o_l, G32)),
        (deep.d3222, shifted(s_no_l, c_no_l, G32)),
        (deep.d4410, shifted(s_2o_2l, c_2o_2l, G44)),
        (deep.d4422, shifted(s_2li, c_2li, G44)),
        (deep.d5220, shifted(s_o_l, c_o_l, G52)),
        (deep.d5232, shifted(s_no_l, c_no_l, G52)),
        (deep.d5421, shifted(s_o_2l, c_o_2l, G54)),
        (deep.d5433, shifted(s_no_2l, c_no_2l, G54)),
    ]
    xndt_2 = sum(_f32(d) * s for d, (s, _) in terms)
    xnddt_2 = sum(_f32(d) * c * (2.0 if i in (4, 5, 8, 9) else 1.0)
                  for i, (d, (_, c)) in enumerate(terms))

    half_day = deep.irez == 2
    xndt = jnp.where(half_day, xndt_2, xndt_1).astype(xli.dtype)
    xnddt = jnp.where(half_day, xnddt_2, xnddt_1).astype(xli.dtype)
    xldot = xni + deep.xfact
    return xndt, xldot, xnddt * xldot


def _resonance_tables(deep: DeepElements, els: Sgp4Elements, n_steps: int):
    """Per-SATELLITE resonance integration tables.

    Key structural fact (reference: dspace, Sdp4.zig:774-820): the
    Euler-Maclaurin integrator state only changes every 720 minutes, so
    a whole (n_times, n_sats) grid shares at most ``n_steps + 1``
    distinct states per satellite. Instead of stepping the recurrence
    per grid point (the unrolled/while_loop form — O(steps) expensive
    f64 work per point), integrate ONCE per satellite with a
    ``lax.scan`` over steps, record every state and its derivatives,
    and let each grid point gather its row. Per-point resonance cost
    collapses to five tiny gathers + a quadratic.

    Returns ``(xli, xni, xndt, xldot, xnddt)`` tables, each shaped
    ``(2 * (n_steps + 1), n_sats)`` — forward states first, backward
    (t < 0) states after (row ``k + n_steps + 1``).
    """
    f64 = els.no_kozai.dtype

    # forward and backward integrations fused into ONE scan over a
    # doubled lane axis (state (2, n_sats): row 0 steps +720, row 1
    # steps -720) — scan iteration count, the latency floor for long
    # horizons, stays n_steps+1 instead of 2*(n_steps+1)
    delt = jnp.stack([jnp.full_like(deep.xlamo, STEPP),
                      jnp.full_like(deep.xlamo, -STEPP)])

    def step(state, _):
        xli, xni, atime = state
        xndt, xldot, xnddt = _resonance_derivs_fast(
            deep, els, xli, xni, atime)
        row = (xli, xni, xndt, xldot, xnddt)
        xli_n = xli + xldot * delt + xndt * STEP2
        xni_n = xni + xndt * delt + xnddt * STEP2
        return (xli_n, xni_n, atime + delt), row

    zeros2 = jnp.zeros((2,) + deep.xlamo.shape, f64)
    init = (deep.xlamo + zeros2, els.no_unkozai + zeros2, zeros2)
    # NOTE: scan unroll measured 5-16x SLOWER on XLA:CPU (23 ms vs
    # 1.4 ms at 64 steps) — the unrolled body defeats op fusion; keep
    # unroll=1
    _, rows = jax.lax.scan(step, init, None, length=n_steps + 1)
    # rows: (n_steps+1, 2, S) -> (2*(n_steps+1), S), forward block
    # first, backward block after (the layout the gathers expect)
    return tuple(jnp.concatenate([rr[:, 0], rr[:, 1]], axis=0)
                 for rr in rows)


#: jitted table builder for catalog-level caching
#: (propagation.SatCatalog.resonance_tables)
build_resonance_tables = jax.jit(_resonance_tables,
                                 static_argnames=("n_steps",))


def _resonance_from_tables(deep: DeepElements, els: Sgp4Elements, t,
                           resonance_steps: Optional[int],
                           resonance_window: Optional[int] = None,
                           tables=None):
    """Table-form resonance integration: integrate the 720-min
    Euler-Maclaurin recurrence ONCE per satellite (see
    :func:`_resonance_tables`), then each grid point selects its step
    row. The step index reproduces the while-loop exit rule
    ``|t - atime| < STEPP`` from atime = 0: ``k = floor(|t| / STEPP)``.
    The default depth covers ~32 days either side of epoch; the catalog
    layer passes the exact host-known horizon (propagation.py). Each
    extra step costs O(n_sats), so generous depths are cheap.

    Returns ``(nm_res, xl)`` f64 grids broadcast over
    ``(t, n_sats)`` — meaningful on resonant lanes only.
    """
    f64 = els.no_kozai.dtype
    n_steps = resonance_steps if resonance_steps is not None else 64
    if tables is None:
        # built in-program; callers with repeated sweeps pass the
        # catalog-cached tables instead (SatCatalog.resonance_tables)
        # so the sequential O(horizon/720) scan runs once per catalog
        tables = _resonance_tables(deep, els, n_steps)
    shape = jnp.broadcast_shapes(jnp.shape(t), deep.xlamo.shape)
    tg = jnp.broadcast_to(t, shape)
    k = jnp.minimum((jnp.abs(tg) // STEPP).astype(jnp.int32),
                    jnp.int32(n_steps))
    idx = k + jnp.where(tg < 0.0, jnp.int32(n_steps + 1), jnp.int32(0))
    # Row selection is a statically-unrolled where-chain, NOT a
    # take_along_axis gather: per-element gathers lower to a serialized
    # TPU gather op that measured ~400x slower than the fused
    # elementwise selects (98.5 ms vs 0.25 ms for the 1440x667 grid) —
    # the table is tiny along the step axis, so selects fuse into one
    # elementwise pass. Past ~256 rows (horizons beyond ~90 days) the
    # flat unroll would bloat compile time AND per-point cost grows
    # O(n_rows) — there the WINDOWED signed-row gather below keeps
    # per-point cost O(window), horizon-independent.
    n_rows = 2 * (n_steps + 1)
    W = resonance_window
    if W is not None and n_rows > max(32, 2 * W):
        # Windowed two-level select (kills the >90-day cliff): within
        # one TIME row, the step index spans at most the catalog's
        # epoch spread in 720-min units — the host-known static window
        # W (the caller derives it from the deep subset's epoch
        # extremes; reference analogue: the sorted-carry sweep,
        # satrec.zig:650-686, which likewise exploits time coherence).
        # Level 1: rebuild the table in SIGNED row order (index
        # j = n_steps + sign(t)*k, so j is monotone in tsince and
        # adjacent lanes land in adjacent rows) and row-gather the W
        # candidate rows per time row — the gather index varies only
        # along the major axis, which lowers to efficient full-row
        # gathers, not per-lane gathers. Level 2: a W-deep select chain
        # picks each lane's row.
        sgn_idx = n_steps + jnp.where(tg < 0.0, -k, k)
        row_base = jnp.min(sgn_idx, axis=-1)            # per time row
        off = sgn_idx - row_base[..., None]
        top = jnp.int32(2 * n_steps)

        # translate signed row j (= n_steps + sign*k) back to the
        # tables' fwd-then-bwd storage order WITHOUT materializing a
        # reversed+concatenated copy per call (the copy scaled with
        # table depth and dominated long horizons):
        # j >= n_steps -> fwd row j - n_steps; else bwd row n_steps - j
        # at storage offset n_steps + 1
        def to_storage(j):
            return jnp.where(j >= n_steps, j - n_steps,
                             jnp.int32(2 * n_steps + 1) - j)

        def gather(tbl):
            out = None
            for w in range(W):
                j = jnp.minimum(row_base + w, top)
                rows = tbl[to_storage(j)]
                out = rows if out is None else jnp.where(off == w,
                                                         rows, out)
            return jnp.broadcast_to(out, shape)
    elif n_rows <= 256:
        def gather(tbl):
            out = jnp.broadcast_to(tbl[0], shape)
            for row in range(1, n_rows):
                out = jnp.where(idx == row, tbl[row], out)
            return out
    else:
        n_sats = deep.xlamo.shape[0]
        idx2 = idx.reshape(-1, n_sats)

        def gather(tbl):
            g = jnp.take_along_axis(tbl, idx2, axis=0)
            return g.reshape(shape)

    xli, xni, xndt, xldot, xnddt = (gather(tb) for tb in tables)
    atime = k.astype(f64) * jnp.where(tg > 0.0, STEPP, -STEPP)
    ft = tg - atime
    nm_res = xni + xndt * ft + xnddt * ft * ft * 0.5
    xl = xli + xldot * ft + xndt * ft * ft * 0.5
    return nm_res, xl


def solve_kepler_fast(u, axnl, aynl, iters: int = 8):
    """f32 equinoctial Kepler: fixed-trip Newton with polynomial sincos.

    Same scheme as ops.sgp4.solve_kepler (reference Sgp4.zig:687-694)
    but each iteration's sin+cos costs ~13 flops instead of two full
    XLA transcendental expansions, and the converged-lane freeze mask
    is dropped — a converged Newton step is already a numerical no-op,
    so the mask only cost ops without changing results. ``iters=8``
    converges below f32 resolution for e <= 0.9 (stress grid in
    tests/test_fast.py); 5 suffices for e <= 0.35 (the shallow-catalog
    case, chosen per-catalog by the caller).
    """
    # Newton denominators 1 - e*cos(E - w) are bounded below by
    # 1 - e > 0 (em is clamped to <= 0.999999 upstream), so each
    # trip's divide is spelled as an rsqrt square — Mosaic lowers a
    # true f32 divide as a longer VPU sequence than rsqrt + 2 muls,
    # and a ~1-ulp reciprocal error only perturbs a self-correcting
    # Newton step (rung gates in tests/test_fast.py re-validated).
    # recip_pos picks the engine flavor: rsqrt + 2 muls inside Pallas
    # kernels (Mosaic lowers a true divide as a longer VPU sequence), a
    # true divide in XLA programs — XLA:CPU's rsqrt codegen is
    # fusion-dependent, which made the velocities=True/False programs'
    # POSITIONS bit-diverge on deep lanes (gate:
    # tests/test_layouts.py::test_velocities_false_fast).
    eo1 = u
    sineo1, coseo1 = sincos(eo1)
    for _ in range(iters - 1):
        denom = 1.0 - coseo1 * axnl - sineo1 * aynl
        tem5 = div_pos(u - aynl * coseo1 + axnl * sineo1 - eo1, denom)
        # minimum/maximum instead of jnp.clip: clip lowers with f64
        # constants under x64, which Mosaic cannot compile
        eo1 = eo1 + jnp.minimum(jnp.maximum(tem5, -0.95), 0.95)
        sineo1, coseo1 = sincos(eo1)
    # final trip: the step d is tiny on a converged ladder (the rung
    # sizing guarantees the PREVIOUS trip already reached ~sqrt(floor)
    # ~ 5e-3 rad), so sin/cos update by an exact small-angle rotation —
    # sin d / cos d to 3rd/2nd order, error ~d^4/24 (< f32 floor for
    # d <= 0.06) — instead of a full polynomial sincos recompute.
    # Rung-gated in tests/test_fast.py at 1.2x each rung bound.
    denom = 1.0 - coseo1 * axnl - sineo1 * aynl
    tem5 = div_pos(u - aynl * coseo1 + axnl * sineo1 - eo1, denom)
    d = jnp.minimum(jnp.maximum(tem5, -0.95), 0.95)
    eo1 = eo1 + d
    d2h = 0.5 * d * d
    sind = d * (1.0 - _f32(1.0 / 3.0) * d2h)
    cosd = 1.0 - d2h
    sineo1, coseo1 = (sineo1 * cosd + coseo1 * sind,
                      coseo1 * cosd - sineo1 * sind)
    return eo1, sineo1, coseo1


#: per-satellite f32 coefficient names _dpper_core consumes (order is
#: the Pallas field-matrix row order)
DPPER_FIELD_NAMES = ("zmos", "se2", "se3", "si2", "si3", "sl2", "sl3",
                     "sl4", "sgh2", "sgh3", "sgh4", "sh2", "sh3",
                     "zmol", "ee2", "e3", "xi2", "xi3", "xl2", "xl3",
                     "xl4", "xgh2", "xgh3", "xgh4", "xh2", "xh3")


def _dpper_f32_fields(deep: DeepElements):
    return {name: _f32(getattr(deep, name)) for name in DPPER_FIELD_NAMES}


def _dpper_fast(deep: DeepElements, t32, ep, inclp, sin_node, cos_node,
                nodep, mp, argpp, u_sum, apply_mask):
    """f32 lunisolar periodics (reference: Sdp4.zig:681-759).

    Returns the perturbed (ep, inclp, nodep, sin/cos node, argpp) plus
    the corrected Kepler argument ``u_sum + d(mp + argpp)`` — the du is
    applied to the exactly-reduced f64 base so Kepler's argument never
    re-accumulates f32 rounding. Lyddane path handled via the same
    dense select as ops.sdp4.dpper.
    """
    return _dpper_core(t32, ep, inclp, sin_node, cos_node, nodep, mp,
                       argpp, u_sum, apply_mask, **_dpper_f32_fields(deep))


def _dpper_core(t32, ep, inclp, sin_node, cos_node, nodep, mp, argpp,
                u_sum, apply_mask, *, zmos, se2, se3, si2, si3, sl2, sl3,
                sl4, sgh2, sgh3, sgh4, sh2, sh3, zmol, ee2, e3, xi2, xi3,
                xl2, xl3, xl4, xgh2, xgh3, xgh4, xh2, xh3):
    """_dpper_fast with the coefficients already f32 — shared between
    the XLA path and the Pallas deep kernel (which streams them as rows
    of a field matrix)."""
    from .fastmath import fast_atan2

    # solar then lunar terms
    zm = zmos + _f32(ZNS) * t32
    szm, _ = sincos(zm)
    zf = zm + 2.0 * _f32(ZES) * szm
    sinzf, coszf = sincos(zf)
    f2 = 0.5 * sinzf * sinzf - 0.25
    f3 = -0.5 * sinzf * coszf
    ses = se2 * f2 + se3 * f3
    sis = si2 * f2 + si3 * f3
    sls = sl2 * f2 + sl3 * f3 + sl4 * sinzf
    sghs = sgh2 * f2 + sgh3 * f3 + sgh4 * sinzf
    shs = sh2 * f2 + sh3 * f3

    zm = zmol + _f32(ZNL) * t32
    szm, _ = sincos(zm)
    zf = zm + 2.0 * _f32(ZEL) * szm
    sinzf, coszf = sincos(zf)
    f2 = 0.5 * sinzf * sinzf - 0.25
    f3 = -0.5 * sinzf * coszf
    sel = ee2 * f2 + e3 * f3
    sil = xi2 * f2 + xi3 * f3
    sll = xl2 * f2 + xl3 * f3 + xl4 * sinzf
    sghl = xgh2 * f2 + xgh3 * f3 + xgh4 * sinzf
    shll = xh2 * f2 + xh3 * f3

    pe = ses + sel
    pinc = sis + sil
    pl = sls + sll
    pgh = sghs + sghl
    ph = shs + shll

    inclp_new = inclp + pinc
    ep_new = ep + pe
    sinip, cosip = sincos(inclp_new)

    # normal path (inclination >= 0.2)
    sin_safe = jnp.where(jnp.abs(sinip) > _f32(1e-12), sinip,
                         _f32(1e-12))
    ph_n = ph / sin_safe
    pgh_n = pgh - cosip * ph_n
    argpp_n = argpp + pgh_n
    du_n = pl + pgh_n                        # d(mp + argpp)
    nodep_n = nodep + ph_n
    sin_node_n, cos_node_n = angle_add(sin_node, cos_node, ph_n)

    # Lyddane path (inclination < 0.2)
    alfdp = sinip * sin_node + ph * cos_node + pinc * cosip * sin_node
    betdp = sinip * cos_node - ph * sin_node + pinc * cosip * cos_node
    nodep_l = fast_atan2(alfdp, betdp)
    far = jnp.abs(nodep - nodep_l) > _f32(PI)
    nodep_l = jnp.where(far & (nodep_l < nodep), nodep_l + _f32(TWO_PI),
                        jnp.where(far & (nodep_l >= nodep),
                                  nodep_l - _f32(TWO_PI), nodep_l))
    xls = (mp + argpp + cosip * nodep + pl + pgh
           - pinc * nodep * sinip)
    mp_l = mp + pl
    argpp_l = xls - mp_l - cosip * nodep_l
    # mp_l + argpp_l - (mp + argpp), algebraically:
    du_l = pl + pgh + cosip * (nodep - nodep_l) - pinc * nodep * sinip
    sin_node_l, cos_node_l = sincos(nodep_l)

    lyddane = inclp_new < 0.2
    du = jnp.where(lyddane, du_l, du_n)
    argpp_new = jnp.where(lyddane, argpp_l, argpp_n)
    nodep_new = jnp.where(lyddane, nodep_l, nodep_n)
    sn = jnp.where(lyddane, sin_node_l, sin_node_n)
    cn = jnp.where(lyddane, cos_node_l, cos_node_n)

    ok = apply_mask
    return (jnp.where(ok, ep_new, ep),
            jnp.where(ok, inclp_new, inclp),
            jnp.where(ok, nodep_new, nodep),
            jnp.where(ok, sn, sin_node),
            jnp.where(ok, cn, cos_node),
            jnp.where(ok, argpp_new, argpp),
            jnp.where(ok, u_sum + du, u_sum))


def shallow_tail_f32(grav: GravityModel, kepler_iters: int, t32, u_base,
                     mm, argp32, node32, xmdf32, *, omgcof, eta, xmcof,
                     delmo, not_simp, cc1, d2, d3, d4, bstar, cc4, cc5,
                     sinmao, ecco, sinip, cosip, a, aycof, xlcof, con41,
                     x1mth2, x7thm1, error0, want_vel: bool = True):
    """The f32 near-earth tail: drag -> Kepler -> short-period -> TEME.

    Shared between the XLA shallow path of :func:`propagate_fast` and
    the Pallas kernel (ops/pallas_sgp4.py) — same numerics, two
    execution engines. All grid inputs are f32 pre-reduced angles from
    the f64 spine; per-satellite fields broadcast. Returns the six
    position/velocity components + int32 error codes (components stay
    separate so the Pallas kernel can store lane-aligned planes); with
    ``want_vel=False`` only (rx, ry, rz, error) — the velocity terms
    (mvt/rvdot and the v-direction vectors) are never computed, the
    reference's ``velocities=False`` fast path (api.py:23).
    """
    error = error0 + jnp.zeros(jnp.shape(u_base), jnp.int32)

    # ---- drag (reference: updateSecular, Sgp4.zig:435-477) --------------
    cos_xmdf, _unused = sincos(xmdf32)
    delmtemp = 1.0 + eta * cos_xmdf
    tempd = omgcof * t32 + xmcof * (delmtemp * delmtemp * delmtemp
                                    - delmo)
    mm_drag = jnp.where(not_simp, mm + tempd, mm)

    t2_32 = t32 * t32
    tempa = (1.0 - cc1 * t32 - d2 * t2_32 - d3 * t2_32 * t32
             - d4 * t2_32 * t2_32)
    sin_mm, _unused = sincos(mm_drag)
    tempe = bstar * cc4 * t32 + jnp.where(
        not_simp, bstar * cc5 * (sin_mm - sinmao), _f32(0.0))

    # ---- semi-major axis / mean motion -----------------------------------
    am = a * tempa * tempa
    am_safe = jnp.where(am > 0.0, am, _f32(1.0))
    # every am-derived power downstream (sqrt(am), nm/xke = am^-1.5)
    # comes off this one rsqrt — no sqrt and no divide survive
    # (a VPU f32 divide is a multi-op reciprocal+Newton sequence)
    rsq_am = jax.lax.rsqrt(am_safe)

    em = ecco - tempe
    error = jnp.where(((em >= 1.0) | (em < -0.001)) & (error == 0), jnp.int32(1), error)
    em = jnp.minimum(jnp.maximum(em, 1.0e-6), 0.999999)

    sin_node, cos_node = sincos(node32 + jnp.zeros_like(u_base))
    argpp = jnp.where(not_simp, argp32 - tempd, argp32) \
        + jnp.zeros_like(u_base)
    # sinip/cosip arrive as per-satellite FIELDS (inclination is
    # constant on near-earth lanes, so its sincos is hoisted out of
    # the per-element kernel — same f32 sincos at staging, bit-equal)

    return _kepler_posvel_f32(grav, kepler_iters, u_base, am, am_safe,
                              rsq_am, em, argpp, sin_node, cos_node, sinip,
                              cosip, aycof, xlcof, con41, x1mth2, x7thm1,
                              error, want_vel=want_vel)


def _kepler_posvel_f32(grav: GravityModel, kepler_iters: int, u, am,
                       am_safe, rsq_am, ep, argpp, sin_node, cos_node,
                       sinip, cosip, aycof, xlcof, con41, x1mth2, x7thm1,
                       error, want_vel: bool = True):
    """Long-period terms -> Kepler -> short-period -> TEME components,
    all f32 (Sgp4.zig:646-750). The common back half of the near-earth
    and deep-space tails (the reference likewise routes SDP4 through
    ``Sgp4.keplerAndPosVel``, Sdp4.zig:1280-1411).

    ``rsq_am`` is the caller's rsqrt(am_safe): every am power here
    (sqrt(am), nm/xke = am^-1.5) is a product of it, and pl's powers
    come off one rsqrt(pl) likewise — Mosaic runs no algebraic
    simplifier, so spelling the divides/sqrts out as rsqrt products is
    what keeps them out of the lowered kernel."""
    # ---- long-period terms + Kepler (Sgp4.zig:646-750) -------------------
    sin_argpp, cos_argpp = sincos(argpp)
    axnl = ep * cos_argpp
    # am_safe > 0 and ep <= 0.999999, so the long-period denominator is
    # strictly positive: 1/x as an rsqrt square (see solve_kepler_fast)
    temp_lp = recip_pos(am_safe * (1.0 - ep * ep))
    aynl = ep * sin_argpp + temp_lp * aycof
    u_kep = _wrap_two_pi_f32(u + temp_lp * xlcof * axnl)
    eo1, sineo1, coseo1 = solve_kepler_fast(u_kep, axnl, aynl,
                                            iters=kepler_iters)

    # ---- short-period corrections + position/velocity --------------------
    ecose = axnl * coseo1 + aynl * sineo1
    esine = axnl * sineo1 - aynl * coseo1
    el2 = axnl * axnl + aynl * aynl
    pl = am * (1.0 - el2)
    error = jnp.where((pl < 0.0) & (error == 0), jnp.int32(4), error)
    pl_safe = jnp.where(pl > 0.0, pl, _f32(1.0))

    rl = am * (1.0 - ecose)
    rl_inv = 1.0 / rl  # shared: three downstream quotients by rl
    betal = jnp.sqrt(jnp.abs(1.0 - el2))
    # 1 + betal is in [1, 2]: another strictly-positive reciprocal.
    # rl_inv above KEEPS its true divide — rl can go non-positive on
    # pathological lanes and the sign must survive so the mrt < 1
    # error check still fires (rsqrt would turn it into a quiet NaN).
    temp_b = div_pos(esine, 1.0 + betal)
    am_rl = am * rl_inv
    sinu = am_rl * (sineo1 - aynl - axnl * temp_b)
    cosu = am_rl * (coseo1 - axnl + aynl * temp_b)
    sin2u = (cosu + cosu) * sinu
    cos2u = 1.0 - 2.0 * sinu * sinu
    rsq_pl = jax.lax.rsqrt(pl_safe)
    temp_p = rsq_pl * rsq_pl
    temp1 = 0.5 * _f32(grav.j2) * temp_p
    temp2 = temp1 * temp_p

    mrt = (rl * (1.0 - 1.5 * temp2 * betal * con41)
           + 0.5 * temp1 * x1mth2 * cos2u)
    sinsu, cossu = angle_add(sinu, cosu, -0.25 * temp2 * x7thm1 * sin2u)
    snod, cnod = angle_add(sin_node, cos_node,
                           1.5 * temp2 * cosip * sin2u)
    sini, cosi = angle_add(sinip, cosip,
                           1.5 * temp2 * cosip * sinip * cos2u)

    xmx = -snod * cosi
    xmy = cnod * cosi
    ux = xmx * sinsu + cnod * cossu
    uy = xmy * sinsu + snod * cossu
    uz = sini * sinsu

    re = _f32(grav.radius_earth_km)
    error = jnp.where((mrt < 1.0) & (error == 0), jnp.int32(6), error)
    ok = error == 0
    zero = _f32(0.0)
    mrt_re = jnp.where(ok, mrt * re, zero)
    if not want_vel:
        return mrt_re * ux, mrt_re * uy, mrt_re * uz, error

    # sqrt(am) = am * rsqrt(am); sqrt(pl)/rl = pl * rsqrt(pl) / rl;
    # nm/xke = rsqrt(am)^3 — the two /xke divides vanish entirely
    rdotl = am_safe * rsq_am * esine * rl_inv
    rvdotl = pl_safe * rsq_pl * rl_inv
    nm_oxke = rsq_am * rsq_am * rsq_am
    mvt = rdotl - nm_oxke * temp1 * x1mth2 * sin2u
    rvdot = rvdotl + nm_oxke * temp1 * (x1mth2 * cos2u + 1.5 * con41)
    vx_ = xmx * cossu - cnod * sinsu
    vy_ = xmy * cossu - snod * sinsu
    vz_ = sini * cossu
    vkmpersec = _f32(grav.radius_earth_km * grav.xke / 60.0)
    mvt_s = jnp.where(ok, vkmpersec * mvt, zero)
    rvdot_s = jnp.where(ok, vkmpersec * rvdot, zero)
    return (mrt_re * ux, mrt_re * uy, mrt_re * uz,
            mvt_s * ux + rvdot_s * vx_,
            mvt_s * uy + rvdot_s * vy_,
            mvt_s * uz + rvdot_s * vz_, error)


def _shallow_f32_fields(els: Sgp4Elements):
    """The per-satellite f32 field bundle shallow_tail_f32 consumes.

    Inclination enters as its f32 sincos pair — computed here with the
    SAME polynomial sincos the kernels use, so hoisting it out of the
    per-element tail is bit-neutral while saving a transcendental per
    grid point."""
    sinip, cosip = sincos(_f32(els.inclo))
    return dict(
        omgcof=_f32(els.omgcof), eta=_f32(els.eta), xmcof=_f32(els.xmcof),
        delmo=_f32(els.delmo), not_simp=~els.isimp, cc1=_f32(els.cc1),
        d2=_f32(els.d2), d3=_f32(els.d3), d4=_f32(els.d4),
        bstar=_f32(els.bstar), cc4=_f32(els.cc4), cc5=_f32(els.cc5),
        sinmao=_f32(els.sinmao), ecco=_f32(els.ecco),
        sinip=sinip, cosip=cosip, a=_f32(els.a), aycof=_f32(els.aycof),
        xlcof=_f32(els.xlcof), con41=_f32(els.con41),
        x1mth2=_f32(els.x1mth2), x7thm1=_f32(els.x7thm1),
        error0=els.error)


def spine_f64(els: Sgp4Elements, t):
    """The f64 angle spine for near-earth satellites: accumulate the
    time-growing angles in f64, reduce mod 2pi, cast to f32.

    Returns (t32, u_base, mm, argp32, node32, xmdf32)."""
    two_pi = TWO_PI
    xmdf = els.mo + els.mdot * t
    argpdf = els.argpo + els.argpdot * t
    t2 = t * t
    nodem64 = els.nodeo + els.nodedot * t + els.nodecf * t2
    templ_big = els.no_unkozai * t2 * (
        els.t2cof + t * (els.t3cof + t * (els.t4cof + t * els.t5cof)))
    mm_spine = xmdf + templ_big
    return (_f32(t),
            _f32(jnp.remainder(mm_spine + argpdf, two_pi)),
            _f32(jnp.remainder(mm_spine, two_pi)),
            _f32(jnp.remainder(argpdf, two_pi)),
            _f32(jnp.remainder(nodem64, two_pi)),
            _f32(jnp.remainder(xmdf, two_pi)))


def propagate_fast(els: Sgp4Elements, deep: Optional[DeepElements], tsince,
                   grav: GravityModel,
                   carry: Optional[ResonanceCarry] = None,
                   kepler_iters: int = 8,
                   resonance_steps: Optional[int] = None,
                   resonance_window: Optional[int] = None,
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Unified mixed-catalog propagate, split-precision.

    ``tsince`` (f64, minutes) broadcasts against the element arrays.
    Returns ``(r, v, error)`` in f32 TEME km / km/s with int32
    python-sgp4 error codes. Numerics match the f64 reference path to
    ~10 m over +-1440 min (test-gated).

    ``resonance_window``: static per-time-row step-index spread for the
    windowed resonance gather — ONLY valid when, within each row of
    ``tsince``, values span at most ``(window - 2) * 720`` minutes
    (true for catalog grids, where rows differ by per-satellite epoch
    offsets). The catalog layer derives it from the deep subset's epoch
    extremes; leave ``None`` for arbitrary grids.
    """
    f64 = els.no_kozai.dtype
    t = jnp.asarray(tsince, f64)
    two_pi = TWO_PI

    if deep is None:
        # near-earth-only: shared spine + tail (also used by the Pallas
        # engine, ops/pallas_sgp4.py)
        spine = spine_f64(els, t)
        rx, ry, rz, vx, vy, vz, error = shallow_tail_f32(
            grav, kepler_iters, *spine, **_shallow_f32_fields(els))
        r = jnp.stack([rx, ry, rz], axis=-1)
        v = jnp.stack([vx, vy, vz], axis=-1)
        return r, v, error

    # =====================================================================
    # f64 spine: time-growing angle accumulation (~25 flops)
    # =====================================================================
    xmdf = els.mo + els.mdot * t
    argpdf = els.argpo + els.argpdot * t
    t2 = t * t
    nodem64 = els.nodeo + els.nodedot * t + els.nodecf * t2
    # gravity-resonance / lunisolar secular contributions (deep lanes;
    # exact zeros on near-earth lanes by construction)
    xmdf = xmdf + deep.dmdt * t
    argpdf = argpdf + deep.domdt * t
    nodem64 = nodem64 + deep.dnodt * t
    templ_big = els.no_unkozai * t2 * (
        els.t2cof + t * (els.t3cof + t * (els.t4cof + t * els.t5cof)))

    is_deep = els.is_deep
    nm_res64 = els.no_unkozai + jnp.zeros_like(xmdf)
    resonant = deep.irez != 0
    if carry is None:
        nm_res, xl = _resonance_from_tables(deep, els, t,
                                            resonance_steps,
                                            resonance_window)
    else:
        # carry form: resume the integration point-wise from the
        # provided state (reference restart rule, Sdp4.zig:787-791)
        atime, xli, xni = carry
        restart = ((atime == 0.0) | (t * atime <= 0.0)
                   | (jnp.abs(t) < jnp.abs(atime)))
        atime = jnp.where(restart, 0.0, atime)
        xli = jnp.where(restart, deep.xlamo, xli)
        xni = jnp.where(restart, els.no_unkozai, xni)
        delt = jnp.where(t > 0.0, STEPP, -STEPP)

        def active_fn(atime_):
            return resonant & (jnp.abs(t - atime_) >= STEPP)

        def body(state):
            atime_, xli_, xni_ = state
            xndt, xldot, xnddt = _resonance_derivs_fast(
                deep, els, xli_, xni_, atime_)
            act = active_fn(atime_)
            xli_ = jnp.where(act, xli_ + xldot * delt + xndt * STEP2,
                             xli_)
            xni_ = jnp.where(act, xni_ + xndt * delt + xnddt * STEP2,
                             xni_)
            atime_ = jnp.where(act, atime_ + delt, atime_)
            return atime_, xli_, xni_

        atime, xli, xni = jax.lax.while_loop(
            lambda s: jnp.any(active_fn(s[0])), body,
            (atime, xli, xni))
        xndt, xldot, xnddt = _resonance_derivs_fast(deep, els, xli,
                                                    xni, atime)
        ft = t - atime
        nm_res = xni + xndt * ft + xnddt * ft * ft * 0.5
        xl = xli + xldot * ft + xndt * ft * ft * 0.5
    theta = jnp.fmod(els.gsto + t * RPTIM, two_pi)
    mm_geo = xl - nodem64 - argpdf + theta
    mm_half = xl - 2.0 * nodem64 + 2.0 * theta
    mm_res = jnp.where(deep.irez == 1, mm_geo, mm_half)
    mm_spine = jnp.where(resonant, mm_res, xmdf)
    nm_res64 = jnp.where(resonant, nm_res, nm_res64)

    mm_spine = mm_spine + templ_big
    # Kepler argument base: (mm + argpm) reduced in f64 — the xl - nodep
    # cancellation done symbolically (see module doc). The drag tempd
    # term cancels too: (mm + tempd) + (argpm - tempd) = mm + argpm.
    u_base = jnp.remainder(mm_spine + argpdf, two_pi)
    mm_red = jnp.remainder(mm_spine, two_pi)
    argp_red = jnp.remainder(argpdf, two_pi)
    node_red = jnp.remainder(nodem64, two_pi)

    # =====================================================================
    # f32 tail
    # =====================================================================
    t32 = _f32(t)
    u_base = _f32(u_base)
    mm = _f32(mm_red)
    argp32 = _f32(argp_red)
    nodem = _f32(node_red)
    xmdf32 = _f32(jnp.remainder(xmdf, two_pi))
    nm_deep = _f32(nm_res64)

    ecco = _f32(els.ecco)
    inclo = _f32(els.inclo)
    bstar = _f32(els.bstar)
    error = jnp.zeros(jnp.shape(u_base), jnp.int32) + els.error

    # ---- drag (reference: updateSecular, Sgp4.zig:435-477) --------------
    cos_xmdf, _unused = sincos(xmdf32)
    delomg = _f32(els.omgcof) * t32
    delmtemp = 1.0 + _f32(els.eta) * cos_xmdf
    delm = _f32(els.xmcof) * (delmtemp * delmtemp * delmtemp
                              - _f32(els.delmo))
    tempd = delomg + delm
    not_simp = ~els.isimp
    # tempd cancels in u = mm + argpm; it only shifts mm (used by cc5 sin)
    mm_drag = jnp.where(not_simp, mm + tempd, mm)

    t2_32 = t32 * t32
    tempa = (1.0 - _f32(els.cc1) * t32 - _f32(els.d2) * t2_32
             - _f32(els.d3) * t2_32 * t32 - _f32(els.d4) * t2_32 * t2_32)
    sin_mm, _unused = sincos(mm_drag)
    tempe = bstar * _f32(els.cc4) * t32
    tempe = tempe + jnp.where(
        not_simp, bstar * _f32(els.cc5) * (sin_mm - _f32(els.sinmao)), 0.0)

    # ---- semi-major axis / mean motion ----------------------------------
    xke32 = _f32(grav.xke)
    # deep lanes: nm from resonance; am = (xke/nm)^(2/3) * tempa^2
    from .fastmath import pow23
    bad_nm = nm_deep <= 0.0
    error = jnp.where(bad_nm & is_deep & (error == 0), jnp.int32(2), error)
    a_base = jnp.where(is_deep,
                       pow23(xke32 / jnp.where(bad_nm, 1e-8, nm_deep)),
                       _f32(els.a))
    am = a_base * tempa * tempa
    am_safe = jnp.where(am > 0.0, am, 1.0)
    rsq_am = jax.lax.rsqrt(am_safe)

    em = ecco - tempe + _f32(deep.dedt) * t32
    inclm = inclo + _f32(deep.didt) * t32
    error = jnp.where(((em >= 1.0) | (em < -0.001)) & (error == 0), jnp.int32(1), error)
    em = jnp.clip(em, 1.0e-6, 0.999999)

    # ---- lunisolar periodics + node (deep lanes) -------------------------
    nodem = jnp.broadcast_to(nodem, jnp.shape(u_base))
    sin_node, cos_node = sincos(nodem)
    u = u_base
    ep, xincp = em, inclm
    # true argument of perigee (for axnl/aynl); tempd shifts it on
    # non-simp near-earth lanes (argpm = argpdf - tempd)
    argpp = jnp.where(not_simp, argp32 - tempd, argp32) \
        + jnp.zeros_like(u_base)
    ep, xincp, nodem, sin_node, cos_node, argpp, u = _dpper_fast(
        deep, t32, em, inclm, sin_node, cos_node, nodem, mm, argpp,
        u_base, apply_mask=is_deep)
    neg_inc = xincp < 0.0
    xincp = jnp.abs(xincp)
    # inclination flip transformation: node += pi, argp -= pi —
    # and u = mp + argp shifts by -pi with it (the f64 path gets
    # this implicitly by recomputing u from the shifted argpp)
    sin_node = jnp.where(neg_inc, -sin_node, sin_node)
    cos_node = jnp.where(neg_inc, -cos_node, cos_node)
    argpp = jnp.where(neg_inc, argpp - _f32(PI), argpp)
    u = jnp.where(neg_inc, u - _f32(PI), u)
    error = jnp.where(((ep < 0.0) | (ep > 1.0)) & (error == 0), jnp.int32(3), error)
    ep = jnp.clip(ep, 1e-12, 0.999999)

    # ---- inclination-dependent coefficients ------------------------------
    sinip, cosip = sincos(xincp)
    j3oj2 = _f32(grav.j3oj2)
    aycof_d = -0.5 * j3oj2 * sinip
    near180 = jnp.abs(cosip + 1.0) > 1.5e-12
    denom = jnp.where(near180, 1.0 + cosip, 1.5e-12)
    xlcof_d = -0.25 * j3oj2 * sinip * (3.0 + 5.0 * cosip) / denom
    cosisq = cosip * cosip
    aycof = jnp.where(is_deep, aycof_d, _f32(els.aycof))
    xlcof = jnp.where(is_deep, xlcof_d, _f32(els.xlcof))
    con41 = jnp.where(is_deep, 3.0 * cosisq - 1.0, _f32(els.con41))
    x1mth2 = jnp.where(is_deep, 1.0 - cosisq, _f32(els.x1mth2))
    x7thm1 = jnp.where(is_deep, 7.0 * cosisq - 1.0, _f32(els.x7thm1))

    # ---- shared back half: long-period -> Kepler -> short-period ->
    # TEME (the same helper the shallow and deep Pallas tails use, so
    # the XLA mixed path is bit-identical to the deep kernel's tail)
    rx, ry, rz, vx, vy, vz, error = _kepler_posvel_f32(
        grav, kepler_iters, u, am, am_safe, rsq_am, ep, argpp, sin_node,
        cos_node, sinip, cosip, aycof, xlcof, con41, x1mth2, x7thm1,
        error)
    r = jnp.stack([rx, ry, rz], axis=-1)
    v = jnp.stack([vx, vy, vz], axis=-1)
    return r, v, error


# ---------------------------------------------------------------------------
# Double-f32 spine — the fully-fused (no-f64) variant for Pallas
# ---------------------------------------------------------------------------

from .fastmath import (df_add, df_mul, df_reduce_two_pi,  # noqa: E402
                       reduce_two_pi_f32, split_f64, two_prod)

#: per-satellite fields consumed by spine_df32, in kernel feed order
SPINE_FIELD_NAMES = ("u0h", "u0l", "udh", "udl", "c2h", "c2l", "c3",
                     "c4", "c5", "mo32", "mdot32", "ago32", "agdot32",
                     "no32", "ndot32", "ncf32")


def spine_df32_fields(els: Sgp4Elements):
    """Per-satellite split coefficients for the in-kernel spine,
    derived once (f64, O(n_sats)) from the element pytree."""
    two_pi = TWO_PI
    u0h, u0l = split_f64(jnp.remainder(els.mo + els.argpo, two_pi))
    udh, udl = split_f64(els.mdot + els.argpdot)
    c2h, c2l = split_f64(els.no_unkozai * els.t2cof)
    return dict(
        u0h=u0h, u0l=u0l, udh=udh, udl=udl, c2h=c2h, c2l=c2l,
        c3=_f32(els.no_unkozai * els.t3cof),
        c4=_f32(els.no_unkozai * els.t4cof),
        c5=_f32(els.no_unkozai * els.t5cof),
        mo32=_f32(jnp.remainder(els.mo, two_pi)), mdot32=_f32(els.mdot),
        ago32=_f32(jnp.remainder(els.argpo, two_pi)),
        agdot32=_f32(els.argpdot),
        no32=_f32(jnp.remainder(els.nodeo, two_pi)),
        ndot32=_f32(els.nodedot), ncf32=_f32(els.nodecf))


def spine_df32(t_hi, t_lo, u0h, u0l, udh, udl, c2h, c2l, c3, c4, c5,
               mo32, mdot32, ago32, agdot32, no32, ndot32, ncf32):
    """All-f32 angle spine: the Kepler argument runs in double-f32
    (Dekker arithmetic, ~48-bit), the drag/orientation-tolerant angles
    in plain f32 Cody-Waite. Numerically equivalent to the f64 spine to
    ~1e-7 rad (< 1 m) out to ~1e5 minutes — see tests/test_fast.py.

    Returns (t32, u_base, mm, argp32, node32, xmdf32), the same tuple
    contract as :func:`spine_f64`.
    """
    t32 = t_hi
    # t^2 in double-f32 (exact square + cross term)
    t2h, t2l = two_prod(t_hi, t_hi)
    t2l = t2l + 2.0 * t_hi * t_lo
    # templ = c2*t^2 (df32) + higher-order drag polynomial (f32)
    th_, tl_ = df_mul(c2h, c2l, t2h, t2l)
    tl_ = tl_ + t2h * t32 * (c3 + t32 * (c4 + t32 * c5))
    # u = u0 + (mdot + argpdot)*t + templ, reduced in double-f32
    ph, pl = df_mul(udh, udl, t_hi, t_lo)
    sh, sl = df_add(ph, pl, u0h, u0l)
    sh, sl = df_add(sh, sl, th_, tl_)
    u32 = df_reduce_two_pi(sh, sl)
    # tolerant angles: plain f32 with a two-part 2pi reduction
    xmdf32 = reduce_two_pi_f32(mo32 + mdot32 * t32)
    mm32 = reduce_two_pi_f32(xmdf32 + (th_ + tl_))
    argp32 = reduce_two_pi_f32(ago32 + agdot32 * t32)
    node32 = reduce_two_pi_f32(no32 + t32 * (ndot32 + ncf32 * t32))
    return t32, u32, mm32, argp32, node32, xmdf32


# ---------------------------------------------------------------------------
# Deep-subset spine + tail — the statically-partitioned fast path
# (propagation.py routes the deep lanes here; every lane is deep, so
# is_deep masks vanish and isimp is always set — deep space forces
# isimp=1 at init, Sgp4.zig:120-123 + sgp4.py:172)
# ---------------------------------------------------------------------------


#: per-satellite f32 field rows the deep tail consumes, in Pallas
#: field-matrix order
DEEP_FIELD_NAMES = ("cc1", "bstar", "cc4", "ecco", "inclo", "dedt",
                    "didt") + DPPER_FIELD_NAMES


def deep_f32_fields(els: Sgp4Elements, deep: DeepElements):
    """The per-satellite f32 field bundle deep_tail_f32 consumes."""
    d = dict(cc1=_f32(els.cc1), bstar=_f32(els.bstar), cc4=_f32(els.cc4),
             ecco=_f32(els.ecco), inclo=_f32(els.inclo),
             dedt=_f32(deep.dedt), didt=_f32(deep.didt),
             error0=els.error)
    d.update(_dpper_f32_fields(deep))
    return d


def deep_spine_f64(els: Sgp4Elements, deep: DeepElements, t,
                   resonance_steps: Optional[int] = None,
                   resonance_window: Optional[int] = None,
                   tables=None):
    """The f64 angle spine for an all-deep satellite subset: secular +
    lunisolar-secular angle accumulation and the table-form resonance
    integration, reduced mod 2pi and cast to f32 (the deep analogue of
    :func:`spine_f64`; reference: dspace secular update,
    Sdp4.zig:774-820 + 881-970).

    Returns ``(t32, u_base, mm, argp32, node32, nm_deep)``.
    """
    two_pi = TWO_PI
    xmdf = els.mo + (els.mdot + deep.dmdt) * t
    argpdf = els.argpo + (els.argpdot + deep.domdt) * t
    t2 = t * t
    nodem64 = els.nodeo + (els.nodedot + deep.dnodt) * t + els.nodecf * t2
    # deep lanes are always isimp: only the t2cof term survives
    templ_big = els.no_unkozai * t2 * els.t2cof

    resonant = deep.irez != 0
    nm_res, xl = _resonance_from_tables(deep, els, t, resonance_steps,
                                        resonance_window, tables)
    theta = jnp.fmod(els.gsto + t * RPTIM, two_pi)
    mm_geo = xl - nodem64 - argpdf + theta
    mm_half = xl - 2.0 * nodem64 + 2.0 * theta
    mm_res = jnp.where(deep.irez == 1, mm_geo, mm_half)
    mm_spine = jnp.where(resonant, mm_res, xmdf)
    nm_res64 = jnp.where(resonant, nm_res,
                         els.no_unkozai + jnp.zeros_like(xmdf))
    mm_spine = mm_spine + templ_big

    u_base = jnp.remainder(mm_spine + argpdf, two_pi)
    return (_f32(t) + jnp.zeros(jnp.shape(u_base), F32),
            _f32(u_base),
            _f32(jnp.remainder(mm_spine, two_pi)),
            _f32(jnp.remainder(argpdf, two_pi)),
            _f32(jnp.remainder(nodem64, two_pi)),
            _f32(nm_res64))


def deep_tail_f32(grav: GravityModel, kepler_iters: int, t32, u_base, mm,
                  argp32, node32, nm_deep, *, cc1, bstar, cc4, ecco,
                  inclo, dedt, didt, error0, want_vel: bool = True,
                  **dpper_coeffs):
    """The f32 deep-space tail: simplified drag -> lunisolar periodics
    (dpper) -> per-point inclination coefficients -> Kepler ->
    short-period -> TEME (reference: Sdp4.zig propagateElementsCarry
    :881-970 after dspace). Shared between the XLA partitioned path and
    the Pallas deep kernel (ops/pallas_sgp4.py), exactly like
    :func:`shallow_tail_f32`."""
    error = error0 + jnp.zeros(jnp.shape(u_base), jnp.int32)
    xke32 = _f32(grav.xke)

    # ---- simplified drag (isimp always set on deep lanes) ---------------
    tempa = 1.0 - cc1 * t32
    tempe = bstar * cc4 * t32

    # ---- semi-major axis / mean motion from the resonance nm ------------
    from .fastmath import pow23
    bad_nm = nm_deep <= 0.0
    error = jnp.where(bad_nm & (error == 0), jnp.int32(2), error)
    # jnp.float32 literal: a bare 1e-8 in the where materializes as f64
    # under x64, which Mosaic cannot lower (see CLAUDE.md)
    a_base = pow23(xke32 / jnp.where(bad_nm, jnp.float32(1e-8), nm_deep))
    am = a_base * tempa * tempa
    am_safe = jnp.where(am > 0.0, am, _f32(1.0))
    rsq_am = jax.lax.rsqrt(am_safe)

    em = ecco - tempe + dedt * t32
    inclm = inclo + didt * t32
    error = jnp.where(((em >= 1.0) | (em < -0.001)) & (error == 0),
                      jnp.int32(1), error)
    em = jnp.minimum(jnp.maximum(em, 1.0e-6), 0.999999)

    # ---- lunisolar periodics + node -------------------------------------
    nodem = node32 + jnp.zeros_like(u_base)
    sin_node, cos_node = sincos(nodem)
    argpp = argp32 + jnp.zeros_like(u_base)
    ep, xincp, nodem, sin_node, cos_node, argpp, u = _dpper_core(
        t32, em, inclm, sin_node, cos_node, nodem, mm, argpp, u_base,
        True, **dpper_coeffs)
    neg_inc = xincp < 0.0
    xincp = jnp.abs(xincp)
    # inclination flip: node += pi, argp -= pi — and u = mp + argp
    # shifts by -pi with it
    sin_node = jnp.where(neg_inc, -sin_node, sin_node)
    cos_node = jnp.where(neg_inc, -cos_node, cos_node)
    argpp = jnp.where(neg_inc, argpp - _f32(PI), argpp)
    u = jnp.where(neg_inc, u - _f32(PI), u)
    error = jnp.where(((ep < 0.0) | (ep > 1.0)) & (error == 0),
                      jnp.int32(3), error)
    ep = jnp.minimum(jnp.maximum(ep, 1e-12), 0.999999)

    # ---- per-point inclination-dependent coefficients -------------------
    sinip, cosip = sincos(xincp)
    j3oj2 = _f32(grav.j3oj2)
    aycof = -0.5 * j3oj2 * sinip
    near180 = jnp.abs(cosip + 1.0) > 1.5e-12
    denom = jnp.where(near180, 1.0 + cosip, _f32(1.5e-12))
    xlcof = -0.25 * j3oj2 * sinip * (3.0 + 5.0 * cosip) / denom
    cosisq = cosip * cosip
    con41 = 3.0 * cosisq - 1.0
    x1mth2 = 1.0 - cosisq
    x7thm1 = 7.0 * cosisq - 1.0

    return _kepler_posvel_f32(grav, kepler_iters, u, am, am_safe, rsq_am,
                              ep, argpp, sin_node, cos_node, sinip, cosip,
                              aycof, xlcof, con41, x1mth2, x7thm1, error,
                              want_vel=want_vel)


def sdp4_propagate_tables(els: Sgp4Elements, deep: DeepElements, tsince,
                          grav: GravityModel,
                          resonance_steps: Optional[int] = None,
                          resonance_window: Optional[int] = None,
                          tables=None):
    """Full-f64 SDP4 for an ALL-DEEP subset, reading the resonance
    integral from the precomputed step tables (the windowed gather of
    :func:`_resonance_from_tables`) instead of dspace's while_loop
    integrator — same 720-min Euler-Maclaurin step, evaluated
    table-form so the program stays loop-free and compiles in seconds
    through a remote compile service (the unified while_loop kernel
    takes minutes there).

    This is the accuracy ESCAPE for extreme-eccentricity half-day
    lanes in the fast method: the split-precision deep tail's f32
    Kepler/short-period stage loses ~tens of meters at e>0.7 perigees,
    so the catalog layer recomputes those few columns here at full f64
    and substitutes them into the deep planes before the merge
    (propagation.SatCatalog.heo_escape). Everything after the
    resonance evaluation is the exact f64 algorithm shared with
    :func:`astroz_tpu.ops.sdp4.sdp4_propagate` via ``_sdp4_finish``
    (reference: the post-dspace stage sequence, Sdp4.zig:881-970).

    Returns ``(r, v, error)`` — time-major stacked ``(..., 3)`` km and
    km/s, int32 error codes.
    """
    from .sdp4 import _sdp4_finish
    from .sgp4 import update_secular

    t = jnp.asarray(tsince, els.no_kozai.dtype)
    mm, argpm, nodem, tempa, tempe, templ = update_secular(els, t)
    theta = jnp.fmod(els.gsto + t * RPTIM, TWO_PI)
    em = els.ecco + deep.dedt * t
    inclm = els.inclo + deep.didt * t
    argpm = argpm + deep.domdt * t
    nodem = nodem + deep.dnodt * t
    mm = mm + deep.dmdt * t

    resonant = deep.irez != 0
    nm_res, xl = _resonance_from_tables(deep, els, t, resonance_steps,
                                        resonance_window, tables)
    mm_geo = xl - nodem - argpm + theta
    mm_half = xl - 2.0 * nodem + 2.0 * theta
    mm = jnp.where(resonant,
                   jnp.where(deep.irez == 1, mm_geo, mm_half), mm)
    nm = jnp.where(resonant, nm_res,
                   els.no_unkozai + jnp.zeros_like(mm))
    error = jnp.broadcast_to(
        els.error, jnp.broadcast_shapes(els.error.shape, jnp.shape(t))
    ).astype(jnp.int32)
    return _sdp4_finish(els, deep, grav, t, em, argpm, inclm, mm, nodem,
                        nm, tempa, tempe, templ, error, els.is_deep)
