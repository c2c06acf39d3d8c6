"""Output layout + velocities=False contract tests.

Covers the planes layout (kernel-native (3, T, S) output — the analogue
of the reference's write-time layout choice, Constellation.zig:46-51,
and into-buffer stride control, satrec.zig:896-988), the direct-write
sat_major fast path, the 4-plane velocities=False kernels
(reference: api.py:23 / README.md:116), and the Pallas benign-pad
invariants (pad lanes must stay finite for every entry point).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from astroz_tpu import build_catalog, propagate

from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2
from test_sdp4 import GPS_L1, GPS_L2, GEO_L1, GEO_L2, HEO_L1, HEO_L2

MIXED_TEXT = "\n".join([
    TRAJ_L1, TRAJ_L2,
    GPS_L1, GPS_L2,
    GEO_L1, GEO_L2,
    HEO_L1, HEO_L2,
    ISS_L1, ISS_L2,
])


@pytest.fixture(scope="module")
def cat():
    return build_catalog(MIXED_TEXT)


@pytest.fixture(scope="module")
def jd(cat):
    return cat.epochs_jd[0] + np.array([0.0, 0.25, 0.5, 0.75])


@pytest.mark.parametrize("method", ["fast", "f64"])
@pytest.mark.parametrize("output", ["teme", "ecef", "geodetic"])
def test_planes_layout_equals_time_major(cat, jd, method, output):
    r, v, err = propagate(cat, jd, output=output, method=method)
    rp, vp, errp = propagate(cat, jd, output=output, method=method,
                             layout="planes")
    assert rp.shape == (3, len(jd), len(cat))
    np.testing.assert_array_equal(np.asarray(err), np.asarray(errp))
    np.testing.assert_allclose(np.asarray(rp),
                               np.moveaxis(np.asarray(r), -1, 0),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vp),
                               np.moveaxis(np.asarray(v), -1, 0),
                               rtol=0, atol=1e-9)


@pytest.mark.parametrize("method", ["fast", "f64"])
def test_sat_major_equals_time_major_swap(cat, jd, method):
    r, v, err = propagate(cat, jd, method=method)
    rs, vs, errs = propagate(cat, jd, method=method, layout="sat_major")
    assert rs.shape == (len(cat), len(jd), 3)
    np.testing.assert_array_equal(np.asarray(err).T, np.asarray(errs))
    np.testing.assert_allclose(np.asarray(rs),
                               np.swapaxes(np.asarray(r), 0, 1),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vs),
                               np.swapaxes(np.asarray(v), 0, 1),
                               rtol=0, atol=1e-9)


@pytest.mark.parametrize("layout", ["time_major", "sat_major", "planes"])
def test_velocities_false_fast(cat, jd, layout):
    """velocities=False must return v=None and bit-identical positions:
    the 4-plane kernel drops only the velocity terms, which feed nothing
    upstream of position."""
    r, v, err = propagate(cat, jd, method="fast", layout=layout)
    r0, v0, err0 = propagate(cat, jd, method="fast", layout=layout,
                             velocities=False)
    assert v0 is None
    np.testing.assert_array_equal(np.asarray(err), np.asarray(err0))
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r0))


@pytest.mark.parametrize("layout", ["time_major", "sat_major", "planes"])
def test_satellite_mask_layouts(cat, jd, layout):
    mask = np.array([True, False, True, True, False])
    r, v, err = propagate(cat, jd, method="fast", layout=layout,
                          satellite_mask=mask)
    err = np.asarray(err)
    r = np.asarray(r)
    if layout == "sat_major":
        masked_err = err[~mask]
        masked_r = r[~mask]
    elif layout == "planes":
        masked_err = err[:, ~mask]
        masked_r = r[:, :, ~mask]
    else:
        masked_err = err[:, ~mask]
        masked_r = r[:, ~mask]
    np.testing.assert_array_equal(masked_err, -1)
    np.testing.assert_array_equal(masked_r, 0.0)


def test_velocities_false_tail_equivalence():
    """ops-level: the want_vel=False tail returns exactly the position
    planes of the want_vel=True tail (both engines' shared body)."""
    from astroz_tpu.ops.fast import (_shallow_f32_fields, propagate_fast,
                                     shallow_tail_f32, spine_f64)

    cat = build_catalog("\n".join([ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2]))
    t = jnp.linspace(0.0, 1440.0, 9, dtype=jnp.float64)[:, None]
    r, v, err = propagate_fast(cat.els, None, t, cat.grav)
    spine = spine_f64(cat.els, jnp.broadcast_to(t, (9, 2)))
    outs = shallow_tail_f32(cat.grav, 8, *spine, want_vel=False,
                            **_shallow_f32_fields(cat.els))
    assert len(outs) == 4
    np.testing.assert_array_equal(np.asarray(err), np.asarray(outs[3]))
    np.testing.assert_array_equal(
        np.asarray(r), np.stack([np.asarray(o) for o in outs[:3]],
                                axis=-1))


def test_pallas_pad_lanes_finite_and_trimmed():
    """Benign-pad contract (VERDICT r2 #9): a 1-satellite catalog padded
    to full tiles must produce (a) correct trimmed outputs and (b)
    FINITE pad lanes for every Pallas entry point — the pad values
    (fields 0.5, simp 1, deep coeffs 0) must never NaN, or a future
    field addition could silently poison real lanes through fused ops.
    """
    from astroz_tpu.ops.fast import propagate_fast
    from astroz_tpu.ops.pallas_sgp4 import (propagate_deep_pallas,
                                            propagate_fast_pallas,
                                            propagate_fast_pallas_fused,
                                            propagate_fast_pallas_sep)

    cat = build_catalog("\n".join([ISS_L1, ISS_L2]))
    t = jnp.linspace(0.0, 720.0, 3, dtype=jnp.float64)[:, None]
    r_ref, _, e_ref = propagate_fast(cat.els, None, t, cat.grav,
                                     kepler_iters=5)

    for fn in (propagate_fast_pallas, propagate_fast_pallas_fused):
        for want_vel in (True, False):
            r, v, e = fn(cat.els, t, cat.grav, kepler_iters=5,
                         time_block=8, sat_block=128, interpret=True,
                         want_vel=want_vel)
            assert r.shape == (3, 1, 3)
            assert (v is None) == (not want_vel)
            np.testing.assert_allclose(np.asarray(r, np.float64),
                                       np.asarray(r_ref, np.float64),
                                       atol=0.05)
            np.testing.assert_array_equal(np.asarray(e), np.asarray(e_ref))

    # separable entry: raw grouped planes are EXACT-shape
    # (boundary-block stores masked); the benign input-pad values
    # (fields 0.5, simp 1) must keep the padded lanes' COMPUTATION
    # finite so no NaN can leak through fused ops into real lanes
    t_time = jnp.linspace(0.0, 720.0, 3, dtype=jnp.float64)
    t_sat = jnp.zeros(1, jnp.float64)
    r3, v3, errp = propagate_fast_pallas_sep(
        cat.els, t_time, t_sat, cat.grav, kepler_iters=5, time_block=8,
        sat_block=128, interpret=True, planes=True)
    assert r3.shape == (3, 3, 1)  # grouped (3, T, S), exact not padded
    for p in (r3, v3):
        assert np.isfinite(np.asarray(p)).all(), "planes went non-finite"
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(r3, np.float64), 0, -1),
        np.asarray(r_ref, np.float64), atol=0.05)

    # deep kernel planes (zero pad coeffs + nm=0 pad -> flagged, not NaN)
    deep_cat = build_catalog("\n".join([GEO_L1, GEO_L2]))
    dr3, dv3, derr = propagate_deep_pallas(
        deep_cat.els_deep, deep_cat.deep_sub, t, deep_cat.grav,
        resonance_steps=4, time_block=8, sat_block=128, interpret=True,
        planes=True)
    assert dr3.shape == (3, 3, 1)
    for p in (dr3, dv3):
        assert np.isfinite(np.asarray(p)).all(), "deep planes non-finite"
