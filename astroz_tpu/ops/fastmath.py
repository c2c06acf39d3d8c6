"""Fast f32 vector math for the hot propagation path.

The TPU-native counterpart of the reference's ``src/simdMath.zig``
(polynomial sincos with quadrant fixup at simdMath.zig:29-97, branchless
mod at :110-122, pow23 Newton-cbrt at :201-212): XLA's stock f32
transcendentals pay for Payne–Hanek range reduction that our kernels
never need — every hot angle is already reduced mod 2pi in f64 before it
reaches f32 — so a Cody–Waite quadrant split + short minimax polynomials
(Cephes f32 coefficients, public domain constants) is ~4x cheaper for a
sin+cos pair and fuses into the surrounding elementwise graph.

Accuracy: |err| < ~6e-8 for sincos on |x| < 1e4; cbrt/pow23 exact to
~1 ulp after two Newton steps. All functions are shape-polymorphic jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_OVER_PI = 0.6366197723675814
# pi/2 split for Cody-Waite reduction: the Cephes extended-precision
# pi/4 decomposition x2 (hi part has 8 mantissa bits, so k * PIO2_HI is
# exact in f32 for k < 2^16)
PIO2_HI = 2.0 * 0.78515625
PIO2_MED = 2.0 * 2.4187564849853515625e-4
PIO2_LO = 2.0 * 3.77489497744594108e-8

# Cephes f32 minimax coefficients on |y| <= pi/4
_S1 = -1.6666654611e-1
_S2 = 8.3321608736e-3
_S3 = -1.9515295891e-4
_C1 = 4.166664568298827e-2
_C2 = -1.388731625493765e-3
_C3 = 2.443315711809948e-5


def sincos(x):
    """Simultaneous sin and cos for f32 inputs with |x| < ~1e4.

    Quadrant decomposition k = round(x * 2/pi), 3-part Cody-Waite
    argument reduction, 3-term minimax polynomials, branchless quadrant
    swap/sign fixup (the reference's sign-bit trick, simdMath.zig:60-96,
    expressed as masks).
    """
    k = jnp.round(x * TWO_OVER_PI)
    y = ((x - k * PIO2_HI) - k * PIO2_MED) - k * PIO2_LO
    y2 = y * y
    # sin(y) ~ y + y^3 * poly(y^2); cos(y) ~ 1 - y^2/2 + y^4 * poly(y^2)
    sp = y + y * y2 * (_S1 + y2 * (_S2 + y2 * _S3))
    cp = 1.0 - 0.5 * y2 + y2 * y2 * (_C1 + y2 * (_C2 + y2 * _C3))
    q = k.astype(jnp.int32) & 3
    swap = (q & 1) == 1
    s = jnp.where(swap, cp, sp)
    c = jnp.where(swap, sp, cp)
    sign_s = (q & 2) == 2
    sign_c = ((q + 1) & 2) == 2
    s = jnp.where(sign_s, -s, s)
    c = jnp.where(sign_c, -c, c)
    return s, c


def fast_sin(x):
    return sincos(x)[0]


def fast_cos(x):
    return sincos(x)[1]


def angle_add(sin_a, cos_a, delta):
    """(sin, cos) of ``a + delta`` for small |delta| (< ~0.1 rad) via the
    addition theorem with a Taylor sincos of delta — replaces an
    atan2 + full sincos round-trip in the short-period correction stage
    (reference computes su = atan2(...) then sin/cos(su),
    Sgp4.zig:557-603; the identity is exact, the Taylor truncation is
    O(delta^6) ~ 1e-9 for delta <= 0.05).
    """
    d2 = delta * delta
    sd = delta * (1.0 - d2 * (1.0 / 6.0) * (1.0 - 0.05 * d2))
    cd = 1.0 - 0.5 * d2 * (1.0 - d2 * (1.0 / 12.0))
    return (sin_a * cd + cos_a * sd,
            cos_a * cd - sin_a * sd)


#: odd-polynomial atan on [-1, 1], degree 15 (least-squares fit computed
#: for this module; max err 1.2e-7 exact, ~2e-7 evaluated in f32 — the
#: f32 rounding floor). The analogue of the reference's polynomial
#: atan2N (simdMath.zig:124-177, ~1e-7 rad).
_AT = (0.9999994161665577, -0.33330223078054766, 0.1995111999819918,
       -0.1393327926026066, 0.09709489254190584, -0.05688293268565614,
       0.022568342982102904, -0.004257856903975933)
_HALF_PI = 1.5707963267948966
_PI = 3.141592653589793


def fast_atan2(y, x):
    """Branchless polynomial atan2 for f32 inputs (range (-pi, pi]).

    Octant folding (z = min/max ratio in [0, 1]) + the degree-15 odd
    minimax polynomial + quadrant fixup masks — Mosaic-lowerable (no
    transcendental intrinsics). atan2(0, 0) returns 0.
    """
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    swap = abs_y > abs_x
    num = jnp.where(swap, abs_x, abs_y)
    den = jnp.where(swap, abs_y, abs_x)
    den = jnp.where(den > 0.0, den, jnp.float32(1.0))
    z = num / den
    z2 = z * z
    a = _AT[7]
    for c in reversed(_AT[:7]):
        a = c + z2 * a
    a = z * a
    a = jnp.where(swap, _HALF_PI - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


def fast_cbrt(x):
    """cbrt(x) for x > 0 via exponent-third bit trick + 2 Newton steps.

    The analogue of the reference's Newton pow23 (simdMath.zig:201-212).
    ~1 ulp f32 after two iterations.
    """
    x = jnp.asarray(x, jnp.float32)
    i = x.view(jnp.int32)
    # explicit i32 constants: bare python ints promote through i64
    # under x64, which Mosaic cannot lower (recurses; see CLAUDE.md)
    y = (jnp.floor_divide(i, jnp.int32(3))
         + jnp.int32(0x2A511CD0)).view(jnp.float32)
    # Newton: y <- y - (y - x/y^2)/3 = (2y + x/y^2)/3
    y = (2.0 * y + x / (y * y)) * (1.0 / 3.0)
    y = (2.0 * y + x / (y * y)) * (1.0 / 3.0)
    y = (2.0 * y + x / (y * y)) * (1.0 / 3.0)
    return y


def pow23(x):
    """x^(2/3) for x > 0 (reference: simdMath.zig pow23N)."""
    c = fast_cbrt(x)
    return c * c


def pow15(x):
    """x^(3/2) = x * sqrt(x) (reference: simdMath.zig:180-182)."""
    return x * jnp.sqrt(x)


# ---------------------------------------------------------------------------
# Double-f32 (Dekker) arithmetic — for the angle spine inside Pallas
# kernels, where f64 is unavailable. A value is an unevaluated sum
# hi + lo of two f32s (~48 bits of precision).
# ---------------------------------------------------------------------------

TWO_PI_F64 = 6.283185307179586476925286766559
TWO_PI_HI = 6.2831854820251464843750  # f32(2pi)
TWO_PI_LO = TWO_PI_F64 - 6.2831854820251464843750
INV_TWO_PI = 0.15915494309189535


#: barrier switch — Pallas/Mosaic neither implements
#: optimization_barrier nor runs XLA's algebraic simplifier, so kernels
#: trace with barriers off (see no_barriers()); accuracy is test-gated
#: on both engines.
_BARRIERS_ON = True


class no_barriers:
    """Context manager: trace compensated arithmetic with the Pallas
    barrier flavor (bitcast round-trip) instead of
    lax.optimization_barrier, which Mosaic cannot lower. The bitcast is
    a semantic identity that float-algebra pattern matching cannot see
    through, so Mosaic's canonicalizer keeps the rounded intermediates
    Dekker arithmetic depends on."""

    def __enter__(self):
        global _BARRIERS_ON
        self._prev = _BARRIERS_ON
        _BARRIERS_ON = "pallas"

    def __exit__(self, *exc):
        global _BARRIERS_ON
        _BARRIERS_ON = self._prev


def _nofold(x):
    """Optimization barrier: XLA's algebraic simplifier (especially
    under --xla_allow_excess_precision, which the TPU compile service
    forces) folds compensated-arithmetic identities like (a+b)-a -> b,
    silently destroying the error terms Dekker arithmetic depends on.
    Barrier the cancellation-critical intermediates so the rounded
    values are kept as computed."""
    if _BARRIERS_ON == "pallas":
        import jax.numpy as _jnp
        x = _jnp.asarray(x)
        if x.dtype != _jnp.float32:
            # python-float constants fold at trace time; only traced
            # f32 values need the barrier
            return x
        return x.view(_jnp.int32).view(_jnp.float32)
    import jax as _jax
    return _jax.lax.optimization_barrier(x)


def recip_pos(x):
    """Reciprocal of a strictly positive f32 value, engine-flavored.

    Inside Pallas kernel traces (no_barriers active) this is
    rsqrt(x)^2: Mosaic lowers a true f32 divide as a longer VPU
    sequence than rsqrt + 2 muls and runs no algebraic simplifier that
    could undo the spelling. In XLA programs it stays a TRUE DIVIDE:
    XLA:CPU lowers rsqrt with fusion-dependent codegen, so the same
    logical tail came out bit-different between the velocities=True
    and velocities=False programs when both spelled it as an rsqrt
    square (even _nofold-barriered) — a divide is deterministic across
    programs. Either flavor is within ~1 ulp; the Kepler rung gates in
    tests/test_fast.py cover both."""
    if _BARRIERS_ON == "pallas":
        import jax as _jax
        r = _jax.lax.rsqrt(x)
        return r * r
    return 1.0 / x


def div_pos(num, den):
    """``num / den`` for strictly positive ``den``, engine-flavored
    like :func:`recip_pos` — but keeping a TRUE division node in XLA
    programs: even ``num * (1/den)`` gets canonicalized
    fusion-dependently there, which was enough to bit-diverge shared
    positions between programs."""
    if _BARRIERS_ON == "pallas":
        import jax as _jax
        r = _jax.lax.rsqrt(den)
        return num * (r * r)
    return num / den


def df_split(x):
    """Dekker split of an f32 into 12-bit-high + low halves (no FMA)."""
    c = x * 4097.0
    hi = _nofold(c - _nofold(c - x))
    return hi, x - hi


def two_sum(a, b):
    """Exact a + b = s + err (Knuth, 6 flops)."""
    s = _nofold(a + b)
    bb = _nofold(s - a)
    return s, (a - _nofold(s - bb)) + (b - bb)


def two_prod(a, b):
    """Exact a * b = p + err via Dekker splitting (no FMA assumed)."""
    p = _nofold(a * b)
    ah, al = df_split(a)
    bh, bl = df_split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(xh, xl, yh, yl):
    """Double-f32 addition (sloppy renormalized)."""
    sh, sl = two_sum(xh, yh)
    sl = sl + (xl + yl)
    s2h = _nofold(sh + sl)
    return s2h, sl - _nofold(s2h - sh)


def df_mul(xh, xl, yh, yl):
    """Double-f32 multiplication."""
    ph, pl = two_prod(xh, yh)
    pl = pl + (xh * yl + xl * yh)
    s = _nofold(ph + pl)
    return s, pl - _nofold(s - ph)


#: three-part 2pi for Cody-Waite reduction: 8x the Cephes pi/4 split.
#: the leading part has 8 mantissa bits, so k * TP_A is exact in f32
#: for k < 2^16.
TP_A = 8.0 * 0.78515625
TP_B = 8.0 * 2.4187564849853515625e-4
TP_C = 8.0 * 3.77489497744594108e-8


def df_reduce_two_pi(xh, xl):
    """(hi, lo) angle -> f32 in ~[-pi, pi] via three-part Cody-Waite.

    The constants are split at trace time (python floats), so unlike a
    runtime Dekker split of a constant this stays exact under both XLA
    and Mosaic. Error ~1e-7 rad for |x| up to ~1e5.
    """
    import jax.numpy as _jnp
    k = _jnp.round(xh * INV_TWO_PI)
    y = _nofold(xh - k * TP_A)
    y = _nofold(y - k * TP_B)
    y = y - k * TP_C
    return y + xl


def split_f64(x, dtype=None):
    """Host/XLA-side: split an f64 array into an (hi, lo) f32 pair."""
    import jax.numpy as _jnp
    hi = _jnp.asarray(x, _jnp.float32)
    lo = _jnp.asarray(x - hi.astype(x.dtype), _jnp.float32)
    return hi, lo


def reduce_two_pi_f32(x):
    """Plain-f32 Cody-Waite mod-2pi for low-precision angles
    (|budget| >= ~1e-5 rad): x - round(x/2pi) * (2pi_hi + 2pi_lo)."""
    import jax.numpy as _jnp
    k = _jnp.round(x * INV_TWO_PI)
    return (x - k * TWO_PI_HI) - k * TWO_PI_LO
