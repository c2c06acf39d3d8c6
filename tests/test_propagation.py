"""High-level catalog propagation tests.

Mirrors the reference's constellation invariants: mixed-catalog
classification (Constellation.zig:766-781), layout equivalence
(:840-873), ECEF = manual GMST rotation (:930-964), and failure
zero-fill (:511-528).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from astroz_tpu import build_catalog, propagate
from astroz_tpu.frames import teme_to_ecef
from astroz_tpu.time import gstime_scalar

from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2, TRAJ_REF
from test_sdp4 import GPS_L1, GPS_L2, GEO_L1, GEO_L2, HEO_L1, HEO_L2

MIXED_TEXT = "\n".join([
    "ISS", TRAJ_L1, TRAJ_L2,
    "GPS", GPS_L1, GPS_L2,
    "GEO", GEO_L1, GEO_L2,
    "HEO", HEO_L1, HEO_L2,
    "ISS2", ISS_L1, ISS_L2,
])


@pytest.fixture(scope="module")
def mixed_cat():
    return build_catalog(MIXED_TEXT)


def test_classification(mixed_cat):
    assert len(mixed_cat) == 5
    assert mixed_cat.n_deep == 3
    assert list(mixed_cat.is_deep) == [False, True, True, True, False]
    assert mixed_cat.names == ("ISS", "GPS", "GEO", "HEO", "ISS2")
    assert mixed_cat.satnum[0] == 25544


def test_mixed_catalog_matches_golden_trajectory(mixed_cat):
    """The ISS column of a mixed catalog must equal the pure-SGP4 golden
    trajectory — the unified kernel's near-earth lanes are exact no-ops
    for the deep-space machinery (fixes the reference's unwired mixed
    path, __init__.py:513-531)."""
    epoch = mixed_cat.epochs_jd[0]
    times_min = np.array([row[0] for row in TRAJ_REF])
    jd = epoch + times_min / 1440.0
    r, v, err = propagate(mixed_cat, jd)
    assert r.shape == (len(times_min), 5, 3)
    np.testing.assert_array_equal(np.asarray(err[:, 0]), 0)
    for i, (_, r_ref, v_ref) in enumerate(TRAJ_REF):
        np.testing.assert_allclose(np.asarray(r[i, 0]), r_ref, atol=0.1)
        np.testing.assert_allclose(np.asarray(v[i, 0]), v_ref, atol=1e-4)


def test_layout_equivalence(mixed_cat):
    epoch = mixed_cat.epochs_jd[0]
    jd = epoch + np.array([0.0, 0.25, 0.5])
    r_tm, v_tm, e_tm = propagate(mixed_cat, jd, layout="time_major")
    r_sm, v_sm, e_sm = propagate(mixed_cat, jd, layout="sat_major")
    np.testing.assert_allclose(np.asarray(r_tm),
                               np.asarray(jnp.swapaxes(r_sm, 0, 1)),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_tm),
                               np.asarray(jnp.swapaxes(v_sm, 0, 1)),
                               atol=1e-10)


def test_ecef_equals_manual_gmst_rotation(mixed_cat):
    epoch = mixed_cat.epochs_jd[0]
    jd = np.array([epoch + 0.3])
    r_teme, _, _ = propagate(mixed_cat, jd, output="teme")
    r_ecef, _, _ = propagate(mixed_cat, jd, output="ecef")
    gmst = gstime_scalar(float(jd[0]))
    manual = teme_to_ecef(r_teme, jnp.asarray(gmst))
    np.testing.assert_allclose(np.asarray(r_ecef), np.asarray(manual),
                               atol=1e-9)


def test_geodetic_output_is_sane(mixed_cat):
    epoch = mixed_cat.epochs_jd[0]
    geo, _, err = propagate(mixed_cat, np.array([epoch]), output="geodetic")
    lat, lon, alt = (np.asarray(geo[0, :, i]) for i in range(3))
    assert np.all(np.abs(lat) <= np.pi / 2 + 1e-9)
    assert np.all(np.abs(lon) <= np.pi + 1e-9)
    # ISS ~ 400-430 km; GPS ~ 20200 km; GEO ~ 35786 km
    assert 350 < alt[0] < 500
    assert 19000 < alt[1] < 21000
    assert 35000 < alt[2] < 36500


def test_geodetic_velocities_are_ecef(mixed_cat):
    """Geodetic output returns positions as (lat, lon, alt) but
    velocities stay in the ECEF frame (documented contract, matching
    the reference's Constellation geodetic mode which rotates
    velocities by GMST only — Constellation.zig:489-507)."""
    epoch = mixed_cat.epochs_jd[0]
    jd = np.array([epoch, epoch + 0.01])
    _, v_geo, _ = propagate(mixed_cat, jd, output="geodetic")
    _, v_ecef, _ = propagate(mixed_cat, jd, output="ecef")
    np.testing.assert_allclose(np.asarray(v_geo), np.asarray(v_ecef),
                               atol=1e-12)


def test_scan_times_matches_dense(mixed_cat):
    """Carry-scan path vs dense restart path (the carry-vs-fresh
    convergence invariant, Sdp4Batch.zig:603-629)."""
    epoch = mixed_cat.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 1.0, 13)
    r_a, v_a, e_a = propagate(mixed_cat, jd, scan_times=False)
    r_b, v_b, e_b = propagate(mixed_cat, jd, scan_times=True)
    np.testing.assert_array_equal(np.asarray(e_a), np.asarray(e_b))
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_b), atol=1e-6)


def test_velocities_false(mixed_cat):
    epoch = mixed_cat.epochs_jd[0]
    r, v, err = propagate(mixed_cat, np.array([epoch]), velocities=False)
    assert v is None
    assert r.shape == (1, 5, 3)


def test_pure_sgp4_catalog_has_no_deep():
    cat = build_catalog("\n".join([ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2]))
    assert not cat.has_deep
    epoch = cat.epochs_jd[0]
    r, v, err = propagate(cat, np.array([epoch, epoch + 0.5]))
    assert r.shape == (2, 2, 3)
    assert np.all(np.asarray(err) == 0)


def test_decayed_lane_zero_filled():
    """A satellite driven below the surface reports error 6 and zeros
    (reference failure policy, Constellation.zig:511-528)."""
    # huge bstar drag -> decays fast
    l1 = "1 25544U 98067A   24001.50000000  .00016717  00000-0  99999+2 0  9999"
    cat = build_catalog("\n".join([l1, TRAJ_L2]))
    epoch = cat.epochs_jd[0]
    r, v, err = propagate(cat, np.array([epoch + 30.0]))
    e = int(np.asarray(err)[0, 0])
    assert e != 0
    np.testing.assert_array_equal(np.asarray(r[0, 0]), 0.0)


def test_fast_method_matches_f64(mixed_cat):
    """propagate(method='fast') partitioned path vs f64 unified path."""
    epoch = mixed_cat.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 1.0, 9)
    r64, v64, e64 = propagate(mixed_cat, jd)
    r32, v32, e32 = propagate(mixed_cat, jd, method="fast")
    assert r32.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(e64), np.asarray(e32))
    dr = np.linalg.norm(np.asarray(r64) - np.asarray(r32, np.float64),
                        axis=-1)
    assert dr.max() < 0.05, f"{dr.max()*1e3:.1f} m"


def test_fast_method_ecef_geodetic(mixed_cat):
    epoch = mixed_cat.epochs_jd[0]
    jd = np.array([epoch + 0.3])
    r64, _, _ = propagate(mixed_cat, jd, output="ecef")
    r32, _, _ = propagate(mixed_cat, jd, output="ecef", method="fast")
    dr = np.linalg.norm(np.asarray(r64) - np.asarray(r32, np.float64),
                        axis=-1)
    assert dr.max() < 0.05
    g64, _, _ = propagate(mixed_cat, jd, output="geodetic")
    g32, _, _ = propagate(mixed_cat, jd, output="geodetic", method="fast")
    # altitude column in km
    assert np.abs(np.asarray(g64[..., 2])
                  - np.asarray(g32[..., 2], np.float64)).max() < 0.06


def test_fast_method_pure_leo():
    cat = build_catalog("\n".join([ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2]))
    epoch = cat.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 1.0, 5)
    r64, _, e64 = propagate(cat, jd)
    r32, _, e32 = propagate(cat, jd, method="fast")
    dr = np.linalg.norm(np.asarray(r64) - np.asarray(r32, np.float64),
                        axis=-1)
    assert dr.max() < 0.02


def test_satellite_mask(mixed_cat):
    """Masked satellites zero-filled with error -1 (reference:
    satellite_mask in sgp4.zig propagate_into)."""
    epoch = mixed_cat.epochs_jd[0]
    mask = np.array([True, False, True, False, True])
    r, v, err = propagate(mixed_cat, np.array([epoch, epoch + 0.1]),
                          satellite_mask=mask)
    e = np.asarray(err)
    assert np.all(e[:, ~mask] == -1)
    assert np.all(np.asarray(r)[:, ~mask] == 0.0)
    assert np.all(e[:, mask] == 0)
    assert np.all(np.abs(np.asarray(r)[:, mask]).sum(axis=-1) > 0)


def test_geodetic_deg_output(mixed_cat):
    epoch = mixed_cat.epochs_jd[0]
    g_rad, _, _ = propagate(mixed_cat, np.array([epoch]),
                            output="geodetic")
    g_deg, _, _ = propagate(mixed_cat, np.array([epoch]),
                            output="geodetic_deg")
    np.testing.assert_allclose(np.asarray(g_deg[..., 0]),
                               np.degrees(np.asarray(g_rad[..., 0])),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_deg[..., 2]),
                               np.asarray(g_rad[..., 2]), atol=1e-9)


def test_all_deep_catalog():
    """Degenerate all-SDP4 constellation (Constellation.zig:875-928)."""
    cat = build_catalog("\n".join([GPS_L1, GPS_L2, GEO_L1, GEO_L2,
                                   HEO_L1, HEO_L2]))
    assert cat.n_deep == len(cat) == 3
    epoch = cat.epochs_jd[0]
    for method in ("f64", "fast"):
        r, v, err = propagate(cat, np.array([epoch, epoch + 0.25]),
                              method=method)
        assert np.all(np.asarray(err) == 0)
        rn = np.linalg.norm(np.asarray(r, np.float64), axis=-1)
        assert np.all((rn > 6500) & (rn < 50000))


def test_kepler_iters_ignores_deep_partition(mixed_cat):
    """The shallow kernel's Newton trip count must come from the
    near-earth lanes only — the deep partition's high-e HEOs run their
    own kernel at the full 8 (regression: catalog-wide max ecc forced
    8 iterations on every shallow lane of a mixed catalog)."""
    assert mixed_cat.has_deep
    shallow_max = float(np.asarray(mixed_cat.els.ecco)
                        [~mixed_cat.is_deep].max())
    catalog_max = float(np.asarray(mixed_cat.els.ecco).max())
    assert catalog_max >= 0.35 > shallow_max  # the HEO lives deep
    assert mixed_cat.kepler_iters < 8  # not forced up by the HEO

    def ladder(e):
        return 3 if e < 0.05 else 4 if e < 0.2 else 5 if e < 0.35 else 8

    assert mixed_cat.kepler_iters == ladder(shallow_max)
    # an all-LEO catalog with low ecc gets the cheapest rung
    from test_sgp4 import ISS_L1, ISS_L2
    leo = build_catalog("\n".join([ISS_L1, ISS_L2]))
    assert leo.kepler_iters == 3


def test_device_put_packed_roundtrip():
    """The packed host->device transfer (one 1-D buffer per dtype + one
    splitter program) must reproduce every leaf exactly. The packed
    path only executes on accelerator backends in production, so this
    forces it on CPU — covering mixed dtypes, shapes, 0-d and empty
    leaves, scalars, and None subtrees."""
    import jax

    from astroz_tpu.propagation import _device_put_packed

    rng = np.random.default_rng(7)
    tree = {
        "f64_a": rng.normal(size=37),
        "f64_b": rng.normal(size=(4, 5)),
        "f64_0d": np.float64(3.25),
        "f32": rng.normal(size=11).astype(np.float32),
        "i32": rng.integers(-5, 5, size=9).astype(np.int32),
        "i64": rng.integers(0, 99, size=3),
        "bool": rng.normal(size=13) > 0,
        "empty": np.zeros((0,), np.float64),
        "scalar": 2.5,
        "none": None,
        "nested": {"x": rng.normal(size=6), "y": np.arange(8, dtype=np.int32)},
    }
    out = _device_put_packed(tree, jax.devices("cpu")[0], force_pack=True)
    flat_in, td_in = jax.tree_util.tree_flatten(tree)
    flat_out, td_out = jax.tree_util.tree_flatten(out)
    assert td_in == td_out
    for a, b in zip(flat_in, flat_out):
        if hasattr(a, "ndim"):
            assert np.asarray(b).dtype == np.asarray(a).dtype
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        else:
            assert b == a


def test_small_grid_host_route(mixed_cat, monkeypatch):
    """Small grids on accelerator backends route to the native host
    SIMD engine (VERDICT r4 #5): the routed result must match the f64
    device path within the scalar-parity budget, carry the same error/
    mask/layout semantics, and the predicate must gate on grid size,
    backend, and native availability."""
    import astroz_tpu.propagation as P

    if mixed_cat.scalar_vecs is None:
        pytest.skip("native library unavailable")

    epoch = mixed_cat.epochs_jd[0]
    jd_h = epoch + np.array([0.0, 0.25, 0.5])
    fr_h = np.zeros_like(jd_h)

    r64, v64, e64 = propagate(mixed_cat, jd_h, method="f64")
    rh, vh, eh = P._propagate_host_small(mixed_cat, jd_h, fr_h, "teme",
                                         True, "time_major", None)
    assert isinstance(rh, np.ndarray) and rh.dtype == np.float32
    np.testing.assert_array_equal(eh, np.asarray(e64))
    # host engine is f64 scalar parity; f32 cast dominates the error
    np.testing.assert_allclose(rh, np.asarray(r64), atol=2e-3)
    np.testing.assert_allclose(vh, np.asarray(v64), atol=1e-5)

    # layouts + ecef + mask through the host route
    rp, vp, ep_ = P._propagate_host_small(mixed_cat, jd_h, fr_h, "ecef",
                                          True, "planes", None)
    assert rp.shape == (3, 3, 5) and ep_.shape == (3, 5)
    re64, _, _ = propagate(mixed_cat, jd_h, method="f64", output="ecef")
    np.testing.assert_allclose(np.moveaxis(rp, 0, -1),
                               np.asarray(re64), atol=2e-3)
    mask = np.array([True, False, True, True, False])
    rm, vm, em = P._propagate_host_small(mixed_cat, jd_h, fr_h, "teme",
                                         True, "time_major", mask)
    assert (em[:, 1] == -1).all() and (rm[:, 1] == 0).all()
    assert (em[:, 0] == 0).all()

    # velocities=False drops v
    rn, vn, en = P._propagate_host_small(mixed_cat, jd_h, fr_h, "teme",
                                         False, "time_major", None)
    assert vn is None
    np.testing.assert_array_equal(rn, rh)

    # routing predicate: accel backend + small grid + native only
    monkeypatch.setattr(P.jax, "default_backend", lambda: "tpu")
    assert P._host_route_ok(mixed_cat, 1000)
    assert not P._host_route_ok(mixed_cat, P.SMALL_GRID_PROPS + 1)
    monkeypatch.setattr(P.jax, "default_backend", lambda: "cpu")
    assert not P._host_route_ok(mixed_cat, 1000)

    # end-to-end: with an accel backend reported, propagate() returns
    # host-resident numpy without touching any device program
    monkeypatch.setattr(P.jax, "default_backend", lambda: "tpu")
    rr, vv, ee = propagate(mixed_cat, jd_h, method="fast")
    assert isinstance(rr, np.ndarray)
    np.testing.assert_allclose(rr, rh, atol=1e-6)
