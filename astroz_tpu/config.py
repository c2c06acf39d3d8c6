"""Global configuration for astroz_tpu.

SGP4/SDP4 need double precision to hit the <100 m accuracy budget vs
python-sgp4 (reference: astroz README.md:55-57). We therefore enable JAX
x64 mode at import. TPUs execute f64 via software emulation; the
performance-critical kernels expose an explicit ``dtype`` knob so callers
can trade precision for speed (f32 path + compensated arithmetic lives in
``astroz_tpu.ops``).
"""

from __future__ import annotations

import jax

jax.config.update("jax_enable_x64", True)

#: Default floating dtype for all element pytrees and kernels.
import jax.numpy as jnp  # noqa: E402  (after x64 flag)

DEFAULT_DTYPE = jnp.float64


def default_dtype():
    return DEFAULT_DTYPE
