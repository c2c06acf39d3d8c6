"""Integrators: fixed-step RK4 and adaptive Dormand-Prince 8(7).

Rebuild of ``src/propagators/Integrator.zig`` (vtable at :8-19, Rk4 at
:21-58, DormandPrince87 13-stage tableau at :73-138 with adaptive
sub-stepping at :154-259, Sgp4Integrator adapter at :271-298).

The tableau is the published Prince & Dormand (1981) RK8(7)-13M pair.
State is a 6-vector (r km, v km/s) with arbitrary leading batch axes;
``deriv(state, t)`` builds the [v, a] derivative from a force model.
The adaptive driver is a ``lax.while_loop`` with the same control law
as the reference: mixed rtol/atol error norm, safety 0.9, step clamp
[1e-3 s, 3600 s], growth cap 5x, shrink floor 0.1x (Integrator.zig:
190-259). A fixed-step ``lax.scan`` fast path serves batched
Monte-Carlo runs where per-lane adaptive steps would diverge.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Deriv = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_deriv(accel) -> Deriv:
    """[r, v] -> [v, a] derivative from a force model ``accel(r,v,t)``."""

    def deriv(state, t):
        r, v = state[..., :3], state[..., 3:]
        return jnp.concatenate([v, accel(r, v, t)], axis=-1)

    return deriv


# ---------------------------------------------------------------------------
# RK4 (Integrator.zig:21-58)
# ---------------------------------------------------------------------------


def rk4_step(deriv: Deriv, state, t, h):
    k1 = deriv(state, t)
    k2 = deriv(state + 0.5 * h * k1, t + 0.5 * h)
    k3 = deriv(state + 0.5 * h * k2, t + 0.5 * h)
    k4 = deriv(state + h * k3, t + h)
    return state + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


# ---------------------------------------------------------------------------
# Dormand-Prince 8(7) — RK8(7)-13M tableau (Integrator.zig:73-138)
# ---------------------------------------------------------------------------

_C = (0.0, 1 / 18, 1 / 12, 1 / 8, 5 / 16, 3 / 8, 59 / 400, 93 / 200,
      5490023248 / 9719169821, 13 / 20, 1201146811 / 1299019798, 1.0, 1.0)

_A = (
    (),
    (1 / 18,),
    (1 / 48, 1 / 16),
    (1 / 32, 0, 3 / 32),
    (5 / 16, 0, -75 / 64, 75 / 64),
    (3 / 80, 0, 0, 3 / 16, 3 / 20),
    (29443841 / 614563906, 0, 0, 77736538 / 692538347,
     -28693883 / 1125000000, 23124283 / 1800000000),
    (16016141 / 946692911, 0, 0, 61564180 / 158732637,
     22789713 / 633445777, 545815736 / 2771057229,
     -180193667 / 1043307555),
    (39632708 / 573591083, 0, 0, -433636366 / 683701615,
     -421739975 / 2616292301, 100302831 / 723423059,
     790204164 / 839813087, 800635310 / 3783071287),
    (246121993 / 1340847787, 0, 0, -37695042795 / 15268766246,
     -309121744 / 1061227803, -12992083 / 490766935,
     6005943493 / 2108947869, 393006217 / 1396673457,
     123872331 / 1001029789),
    (-1028468189 / 846180014, 0, 0, 8478235783 / 508512852,
     1311729495 / 1432422823, -10304129995 / 1701304382,
     -48777925059 / 3047939560, 15336726248 / 1032824649,
     -45442868181 / 3398467696, 3065993473 / 597172653),
    (185892177 / 718116043, 0, 0, -3185094517 / 667107341,
     -477755414 / 1098053517, -703635378 / 230739211,
     5731566787 / 1027545527, 5232866602 / 850066563,
     -4093664535 / 808688257, 3962137247 / 1805957418,
     65686358 / 487910083),
    (403863854 / 491063109, 0, 0, -5068492393 / 434740067,
     -411421997 / 543043805, 652783627 / 914296604,
     11173962825 / 925320556, -13158990841 / 6184727034,
     3936647629 / 1978049680, -160528059 / 685178525,
     248638103 / 1413531060, 0),
)

#: 8th-order weights
_B8 = (14005451 / 335480064, 0, 0, 0, 0, -59238493 / 1068277825,
       181606767 / 758867731, 561292985 / 797845732,
       -1041891430 / 1371343529, 760417239 / 1151165299,
       118820643 / 751138087, -528747749 / 2220607170, 1 / 4)

#: 7th-order (embedded) weights
_B7 = (13451932 / 455176623, 0, 0, 0, 0, -808719846 / 976000145,
       1757004468 / 5645159321, 656045339 / 265891186,
       -3867574721 / 1518517206, 465885868 / 322736535,
       53011238 / 667516719, 2 / 45, 0)


def dp87_step(deriv: Deriv, state, t, h):
    """One 13-stage step. Returns (state8, error_estimate)."""
    ks = []
    for i in range(13):
        si = state
        for j, aij in enumerate(_A[i]):
            if aij != 0:
                si = si + (h * aij) * ks[j]
        ks.append(deriv(si, t + _C[i] * h))
    y8 = state
    y7 = state
    for bi, bhi, k in zip(_B8, _B7, ks):
        if bi != 0:
            y8 = y8 + (h * bi) * k
        if bhi != 0:
            y7 = y7 + (h * bhi) * k
    return y8, y8 - y7


class _AdaptState(NamedTuple):
    state: jnp.ndarray
    t: jnp.ndarray
    h: jnp.ndarray
    steps: jnp.ndarray


def dp87_adaptive(deriv: Deriv, state, t0, t1, *, rtol: float = 1e-10,
                  atol: float = 1e-12, h0: Optional[float] = None,
                  h_min: float = 1e-3, h_max: float = 3600.0,
                  max_substeps: int = 10000):
    """Integrate from t0 to t1 with PI-free step control matching the
    reference (Integrator.zig:190-259): err_norm = max(|err| /
    (atol + rtol*|y|)); accept if <= 1; h *= clamp(0.9 *
    err^(-1/8), 0.1, 5).

    Scalar trajectory only (no batch axes) — batched runs should use
    the fixed-step scan path. Returns (state, h_final, n_steps).
    """
    t0 = jnp.asarray(t0, jnp.result_type(1.0))
    t1 = jnp.asarray(t1, t0.dtype)
    direction = jnp.sign(t1 - t0)
    h_init = jnp.where(direction == 0, h_max,
                       jnp.minimum(jnp.abs(t1 - t0), h_max)) * \
        jnp.where(direction == 0, 1.0, direction)
    if h0 is not None:
        h_init = jnp.asarray(h0, t0.dtype) * jnp.where(
            direction == 0, 1.0, direction)

    def cond(s: _AdaptState):
        return ((s.t - t1) * direction < 0) & (s.steps < max_substeps)

    def body(s: _AdaptState):
        # clamp h to not overshoot t1
        h = jnp.where((s.t + s.h - t1) * direction > 0, t1 - s.t, s.h)
        y8, err = dp87_step(deriv, s.state, s.t, h)
        scale = atol + rtol * jnp.maximum(jnp.abs(s.state), jnp.abs(y8))
        err_norm = jnp.max(jnp.abs(err) / scale)
        accept = err_norm <= 1.0
        err_safe = jnp.maximum(err_norm, 1e-16)
        factor = jnp.clip(0.9 * err_safe ** (-1.0 / 8.0), 0.1, 5.0)
        h_new = jnp.clip(jnp.abs(h * factor), h_min, h_max) * direction
        return _AdaptState(
            state=jnp.where(accept, y8, s.state),
            t=jnp.where(accept, s.t + h, s.t),
            h=h_new,
            steps=s.steps + 1)

    init = _AdaptState(state=jnp.asarray(state, t0.dtype), t=t0,
                       h=h_init, steps=jnp.zeros((), jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    return out.state, out.h, out.steps


# ---------------------------------------------------------------------------
# Class-style wrappers (reference vtable parity, Integrator.zig:8-19)
# ---------------------------------------------------------------------------


class Rk4:
    """Fixed-step RK4 integrator."""

    def __init__(self, accel):
        self.deriv = make_deriv(accel)

    def step(self, state, t, h):
        return rk4_step(self.deriv, state, t, h)


class DormandPrince87:
    """Adaptive 8(7) integrator with persistent step size
    (Integrator.zig:65,180: hCurrent carries across calls)."""

    def __init__(self, accel, rtol: float = 1e-10, atol: float = 1e-12):
        self.deriv = make_deriv(accel)
        self.rtol = rtol
        self.atol = atol
        self.h_current: Optional[float] = None

    def step(self, state, t, h):
        """Advance exactly h seconds (internally sub-stepping)."""
        out, h_next, n_sub = dp87_adaptive(
            self.deriv, state, t, t + h, rtol=self.rtol, atol=self.atol,
            h0=self.h_current)
        if int(n_sub) >= 10000:
            # the while_loop exited on the substep cap, not on reaching
            # t+h: the returned state is NOT at the requested epoch.
            # Silent acceptance made impossible tolerance settings
            # (e.g. rtol=1e-16 pinning h at h_min with every step
            # rejected) return wrong trajectories with no signal.
            raise RuntimeError(
                "DormandPrince87: step did not converge within the "
                "substep cap (tolerances too tight for f64, or h_min "
                "too large) — state has not reached t + h")
        self.h_current = float(jnp.abs(h_next))
        return out


class Sgp4Integrator:
    """Expose SGP4 through the same step interface
    (Integrator.zig:271-298): 'integration' = analytic propagation to
    the requested epoch; state input is ignored beyond bookkeeping."""

    def __init__(self, satrec):
        self._sat = satrec

    def step(self, state, t, h):
        t_min = (t + h) / 60.0
        e, r, v = self._sat.sgp4_tsince(t_min)
        return jnp.asarray(list(r) + list(v))
