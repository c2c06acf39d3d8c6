"""Composable force models + the adaptive DP8(7) integrator
(reference: examples/maneuver_planning.zig — TwoBody / J2 / Composite
through ForceModel.wrap + DormandPrince87; here the models are pure
callables and the integrator is a jitted lax.while_loop, so the same
code also vmaps over a whole batch of initial states)."""

import jax
import jax.numpy as jnp
import numpy as np

from astroz_tpu.constants import EARTH, WGS84
from astroz_tpu.propagators import (Composite, DormandPrince87, J2,
                                    TwoBody, dp87_adaptive, make_deriv)

mu = EARTH.mu
r_eq = WGS84.radius_earth_km

# circular orbit at 400 km, 51.6 deg inclination
a = r_eq + 400.0
v_circ = np.sqrt(mu / a)
inc = np.radians(51.6)
state0 = jnp.array([a, 0.0, 0.0,
                    0.0, v_circ * np.cos(inc), v_circ * np.sin(inc)])
one_day = 86400.0

# two-body only
two_body = TwoBody(mu)
s_2b, _, n_2b = dp87_adaptive(make_deriv(two_body), state0, 0.0,
                              one_day, rtol=1e-10, atol=1e-12)

# composite: two-body + J2
composite = Composite([TwoBody(mu), J2(mu, WGS84.j2, r_eq)])
s_j2, _, n_j2 = dp87_adaptive(make_deriv(composite), state0, 0.0,
                              one_day, rtol=1e-10, atol=1e-12)

r_2b = float(jnp.linalg.norm(s_2b[:3]))
r_j2 = float(jnp.linalg.norm(s_j2[:3]))
drift = float(jnp.linalg.norm(s_2b[:3] - s_j2[:3]))
print(f"two-body after 1 day: |r| = {r_2b:.3f} km ({int(n_2b)} adaptive steps)")
print(f"with J2 after 1 day:  |r| = {r_j2:.3f} km ({int(n_j2)} adaptive steps)")
print(f"J2-induced position drift: {drift:.1f} km")

# the TPU-native angle: the same integrator vmaps over a batch of
# initial states (here a small altitude sweep) in one compiled program
alts = jnp.linspace(300.0, 800.0, 8)
r0s = r_eq + alts
v0s = jnp.sqrt(mu / r0s)
states = jnp.stack([r0s, jnp.zeros_like(r0s), jnp.zeros_like(r0s),
                    jnp.zeros_like(r0s), v0s * np.cos(inc),
                    v0s * np.sin(inc)], axis=-1)

batched = jax.jit(jax.vmap(
    lambda s: dp87_adaptive(make_deriv(composite), s, 0.0, one_day,
                            rtol=1e-9, atol=1e-11)[0]))
finals = batched(states)
radii = np.linalg.norm(np.asarray(finals[:, :3]), axis=-1)
for alt, r in zip(np.asarray(alts), radii):
    print(f"  h0 = {alt:5.0f} km -> |r|(1 d) = {r:8.1f} km")
