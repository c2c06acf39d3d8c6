"""Shim: the scalar oracle now lives in the package as
``astroz_tpu.ops.scalar`` (it doubles as the latency-optimized engine
behind ``api.Satrec.sgp4`` single-point calls). It remains independent
of the JAX kernels in ``astroz_tpu.ops`` — see its module docstring."""

from astroz_tpu.ops.scalar import *          # noqa: F401,F403
from astroz_tpu.ops.scalar import (          # noqa: F401
    GravConsts, Sat, gstime, sgp4, sgp4init, wgs72, wgs84)
