"""Split-precision fast path vs f64 reference path.

The TPU analogue of the reference's SIMD-vs-scalar equivalence tests
(Sgp4.zig:950-1020, tol 1e-4 km from polynomial atan2; Sdp4.zig:1561-1588
across all irez regimes). Our budget: fast-f32 vs f64 < 50 m over
+-1440 min, and the absolute golden-trajectory gate < 100 m.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astroz_tpu import build_catalog
from astroz_tpu.ops.fast import propagate_fast, solve_kepler_fast
from astroz_tpu.ops import fastmath as fm
from astroz_tpu.ops.sdp4 import sdp4_propagate
from astroz_tpu.ops.sgp4 import sgp4_propagate

from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2, TRAJ_REF
from test_propagation import MIXED_TEXT


@pytest.fixture(scope="module")
def mixed_cat():
    return build_catalog(MIXED_TEXT)


def test_sincos_accuracy():
    x = jnp.asarray(np.random.default_rng(0).uniform(-100, 100, 100000),
                    jnp.float32)
    s, c = jax.jit(fm.sincos)(x)
    x64 = np.asarray(x, np.float64)
    assert np.abs(np.asarray(s, np.float64) - np.sin(x64)).max() < 2e-7
    assert np.abs(np.asarray(c, np.float64) - np.cos(x64)).max() < 2e-7


def test_cbrt_accuracy():
    x = jnp.asarray(np.random.default_rng(1).uniform(1e-4, 1e4, 100000),
                    jnp.float32)
    y = jax.jit(fm.fast_cbrt)(x)
    rel = np.abs(np.asarray(y, np.float64)
                 / np.cbrt(np.asarray(x, np.float64)) - 1.0)
    assert rel.max() < 5e-6


def test_kepler_fast_convergence_stress():
    """Newton w/ polynomial sincos must converge below ~1e-6 rad across
    the (e, u) plane up to e=0.9 — covers the HEO regime (e=0.73)."""
    e = np.linspace(0.0, 0.9, 60)
    u = np.linspace(0.0, 2 * np.pi, 97)
    ee, uu = np.meshgrid(e, u)
    argp = 1.234
    axnl = jnp.asarray(ee * np.cos(argp), jnp.float32)
    aynl = jnp.asarray(ee * np.sin(argp), jnp.float32)
    uj = jnp.asarray(uu, jnp.float32)
    eo1, s, c = jax.jit(solve_kepler_fast)(uj, axnl, aynl)
    # residual of the equinoctial Kepler equation
    res = (np.asarray(uj, np.float64)
           - np.asarray(aynl, np.float64) * np.asarray(c, np.float64)
           + np.asarray(axnl, np.float64) * np.asarray(s, np.float64)
           - np.asarray(eo1, np.float64))
    res = (res + np.pi) % (2 * np.pi) - np.pi
    assert np.abs(res).max() < 2e-6


def _max_pos_err_km(cat, times_min):
    t = jnp.asarray(times_min)[:, None]
    if cat.deep is not None:
        r64, v64, e64, _ = sdp4_propagate(cat.els, cat.deep, t, cat.grav)
    else:
        r64, v64, e64 = sgp4_propagate(cat.els, t, cat.grav)
    r32, v32, e32 = propagate_fast(cat.els, cat.deep, t, cat.grav)
    np.testing.assert_array_equal(np.asarray(e64), np.asarray(e32))
    ok = (np.asarray(e64) == 0)[..., None]
    dr = np.where(ok, np.asarray(r64) - np.asarray(r32, np.float64), 0.0)
    dv = np.where(ok, np.asarray(v64) - np.asarray(v32, np.float64), 0.0)
    return (np.linalg.norm(dr, axis=-1).max(),
            np.linalg.norm(dv, axis=-1).max())


def test_fast_vs_f64_mixed_catalog(mixed_cat):
    times = np.linspace(-1440.0, 1440.0, 49)
    dr, dv = _max_pos_err_km(mixed_cat, times)
    assert dr < 0.05, f"position divergence {dr*1e3:.1f} m"
    assert dv < 5e-5, f"velocity divergence {dv*1e6:.1f} mm/s"


def test_fast_vs_f64_pure_leo():
    cat = build_catalog("\n".join([ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2]))
    assert cat.deep is None
    times = np.linspace(0.0, 1440.0, 97)
    dr, dv = _max_pos_err_km(cat, times)
    assert dr < 0.02, f"position divergence {dr*1e3:.1f} m"


def test_fast_golden_trajectory_within_100m():
    """Absolute accuracy gate: the python-sgp4 golden trajectory
    (validation_tests.zig:331-374) through the fast path."""
    cat = build_catalog("\n".join([TRAJ_L1, TRAJ_L2]))
    times = jnp.asarray([row[0] for row in TRAJ_REF])[:, None]
    r, v, err = propagate_fast(cat.els, cat.deep, times, cat.grav)
    assert np.all(np.asarray(err) == 0)
    for i, (_, r_ref, v_ref) in enumerate(TRAJ_REF):
        d = np.linalg.norm(np.asarray(r[i, 0], np.float64) - r_ref)
        assert d < 0.1, f"t={TRAJ_REF[i][0]}: {d*1e3:.1f} m"
        dv = np.linalg.norm(np.asarray(v[i, 0], np.float64) - v_ref)
        assert dv < 1e-4
