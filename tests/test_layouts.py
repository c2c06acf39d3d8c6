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


def test_merge_staging_maps():
    """build_merge_staging invariants: every deep column gets exactly
    one one-hot row, keep is its complement, perm round-trips — for
    ungrouped (g=1) and grouped (g=2) compaction."""
    from astroz_tpu.ops.pallas_sgp4 import build_merge_staging

    n_sats, sat_block, kq = 300, 128, 8
    deep_idx = np.array([0, 5, 127, 128, 200, 299])
    n_blocks = 3
    for g_req in (1, 2):
        perm, onehot, keep, K, g = build_merge_staging(
            deep_idx, n_sats, sat_block, kq, group_blocks=g_req)
        assert g == g_req
        n_groups = -(-n_blocks // g)
        assert onehot.shape == (n_blocks, K, sat_block)
        assert perm.shape == (n_groups * K,)
        # each deep column: exactly one 1 across its block's K rows,
        # and that row's perm entry names the right deep-subset slot
        colsum = onehot.sum(axis=1)   # (n_blocks, sat_block)
        for slot, col in enumerate(deep_idx):
            j, l = col // sat_block, col % sat_block
            assert colsum[j, l] == 1.0
            assert keep[j, 0, l] == 0.0
            k = int(np.argmax(onehot[j, :, l]))
            assert perm[(j // g) * K + k] == slot
        # non-deep columns: all-zero one-hot, keep=1
        assert float(onehot.sum()) == len(deep_idx)
        assert float((1.0 - keep).sum()) == len(deep_idx)
    # auto selection picks the smallest total width
    _, _, _, K_auto, g_auto = build_merge_staging(deep_idx, n_sats,
                                                  sat_block, kq)
    assert g_auto >= 1 and K_auto >= kq


@pytest.mark.parametrize("group_blocks", [1, 2])
def test_fused_merge_matches_partitioned(group_blocks):
    """The fused Pallas merge (group-compacted deep kernel + in-kernel
    bf16-split one-hot substitution) matches the scatter-based
    partitioned path on a mixed catalog spanning several sat-blocks —
    positions to the documented split bound, error codes exactly —
    for both ungrouped and grouped (g=2) deep compaction."""
    import jax

    from astroz_tpu.ops.pallas_sgp4 import (
        _unpack_outs, build_merge_staging, propagate_deep_pallas,
        propagate_fast_pallas_sep_merge)
    from astroz_tpu.propagation import _propagate_fast_partitioned

    c = build_catalog("\n".join([MIXED_TEXT] * 30))  # 150 sats, 3 deep/5
    sat_block, kq = 128, 8
    perm, onehot, keep, K, g = build_merge_staging(
        c.deep_idx, len(c), sat_block, kq, group_blocks=group_blocks)
    assert g == group_blocks
    jd = c.epochs_jd[0] + np.linspace(0.0, 1.0, 7)
    ref = c.epoch_min_jd
    t_time = jnp.asarray((jd - ref) * 1440.0)
    jd_sum = jnp.asarray(jd)[:, None]
    t_sat, t_sat_deep, _, _ = c.fast_staging

    r_ref, v_ref, e_ref = _propagate_fast_partitioned(
        c.els, c.els_deep, c.deep_sub, c.deep_idx_dev, t_time, t_sat,
        t_sat_deep, jd_sum, c.grav, "teme", True, c.kepler_iters,
        "xla", 4, "planes")

    take = lambda x: x[perm] if getattr(x, "ndim", 0) else x  # noqa: E731
    els_p = jax.tree_util.tree_map(take, c.els_deep)
    deep_p = jax.tree_util.tree_map(take, c.deep_sub)
    tsd = t_time[:, None] - t_sat_deep[perm][None, :]
    dr, dv, de = _unpack_outs(propagate_deep_pallas(
        els_p, deep_p, tsd, c.grav, resonance_steps=4, sat_block=K,
        interpret=True, planes=True, want_vel=True), True)
    outs = propagate_fast_pallas_sep_merge(
        c.els, t_time, t_sat, c.grav, dr, dv, de,
        jnp.asarray(onehot, jnp.bfloat16), jnp.asarray(keep),
        kepler_iters=c.kepler_iters, sat_block=sat_block,
        interpret=True, planes=True, want_vel=True,
        group_blocks=group_blocks)
    r3, v3, err = _unpack_outs(outs, True)

    np.testing.assert_array_equal(np.asarray(err), np.asarray(e_ref))
    np.testing.assert_allclose(np.asarray(r3, np.float64),
                               np.asarray(r_ref, np.float64), atol=0.05)
    np.testing.assert_allclose(np.asarray(v3, np.float64),
                               np.asarray(v_ref, np.float64), atol=5e-4)
    # the deep columns specifically must carry the deep kernel's values
    # (not shallow garbage): GEO radius ~42164 km
    deep_cols = np.asarray(c.deep_idx)
    rad = np.linalg.norm(np.asarray(r3, np.float64)[:, 0, deep_cols],
                         axis=0)
    assert rad.max() > 20000.0


def test_fused_wrapper_full_dispatch_interpret():
    """_propagate_fast_fused — the EXACT jitted wrapper propagate()
    dispatches to on TPU, fed the EXACT catalog staging
    (SatCatalog.merge_staging + resonance_tables_packed) — matches the
    scatter path in interpret mode. Guards the fused dispatch wiring
    that otherwise only executes on real hardware."""
    from astroz_tpu.propagation import (_propagate_fast_fused,
                                        _propagate_fast_partitioned,
                                        _resonance_window)

    c = build_catalog("\n".join([MIXED_TEXT] * 52))  # 260 sats, 3 blocks
    staging = c.merge_staging
    assert staging is not None
    onehot, keep, k_width, g, els_p, deep_p, t_sat_p = staging
    jd = c.epochs_jd[0] + np.linspace(0.0, 2.0, 5)
    t_time = jnp.asarray((jd - c.epoch_min_jd) * 1440.0)
    jd_sum = jnp.asarray(jd)[:, None]
    t_sat, t_sat_deep, _, _ = c.fast_staging
    steps = 4
    window = _resonance_window(c.deep_epochs_jd)

    r_f, v_f, e_f = _propagate_fast_fused(
        c.els, els_p, deep_p, onehot, keep, t_time, t_sat, t_sat_p,
        jd_sum, c.grav, "teme", True, c.kepler_iters, steps, "planes",
        window, c.resonance_tables_packed(steps), g,
        interpret=True)
    r_s, v_s, e_s = _propagate_fast_partitioned(
        c.els, c.els_deep, c.deep_sub, c.deep_idx_dev, t_time, t_sat,
        t_sat_deep, jd_sum, c.grav, "teme", True, c.kepler_iters,
        "xla", steps, "planes", window, c.resonance_tables(steps))

    np.testing.assert_array_equal(np.asarray(e_f), np.asarray(e_s))
    np.testing.assert_allclose(np.asarray(r_f, np.float64),
                               np.asarray(r_s, np.float64), atol=0.05)
    np.testing.assert_allclose(np.asarray(v_f, np.float64),
                               np.asarray(v_s, np.float64), atol=5e-4)


def test_merge_vals_nonfinite_shallow_discarded():
    """The merge must REPLACE deep columns (select), never blend: a
    non-finite shallow value on a deep column would leak through a
    0-weight multiply-add (inf * 0 = nan) but not through a select."""
    import jax.numpy as jnp

    from astroz_tpu.ops.pallas_sgp4 import _merge_vals

    tb, K, sb = 2, 8, 16
    deep_cols = [3, 7]
    onehot = np.zeros((K, sb), np.float32)
    keep = np.ones(sb, np.float32)
    for k, c in enumerate(deep_cols):
        onehot[k, c] = 1.0
        keep[c] = 0.0
    # shallow vals: inf/nan exactly on the deep columns
    vals = []
    for p in range(6):
        v = np.full((tb, sb), float(p + 1), np.float32)
        v[:, deep_cols[0]] = np.inf
        v[:, deep_cols[1]] = np.nan
        vals.append(jnp.asarray(v))
    err_sh = np.zeros((tb, sb), np.int32)
    err_sh[:, deep_cols] = 99  # shallow error codes on deep cols: unread
    vals.append(jnp.asarray(err_sh))
    dr = jnp.asarray(np.full((3, tb, K), 7.25, np.float32))
    dv = jnp.asarray(np.full((3, tb, K), -2.5, np.float32))
    de = jnp.asarray(np.zeros((tb, K), np.float32))
    out = _merge_vals(tuple(vals), dr, dv, de,
                      jnp.asarray(onehot, jnp.bfloat16),
                      jnp.asarray(keep))
    for p in range(6):
        o = np.asarray(out[p])
        assert np.isfinite(o).all(), f"plane {p} non-finite"
        for c in deep_cols:
            np.testing.assert_array_equal(o[:, c], 7.25 if p < 3 else -2.5)
        keep_cols = [c for c in range(sb) if c not in deep_cols]
        np.testing.assert_array_equal(o[:, keep_cols], float(p + 1))
    e = np.asarray(out[-1])
    assert (e[:, deep_cols] == 0).all()
    keep_cols = [c for c in range(sb) if c not in deep_cols]
    assert (e[:, keep_cols] == 0).all()


def test_fused_merge_velocities_false():
    """want_vel=False through the fused merge: 4-plane outputs, same
    positions/errors as the want_vel=True run."""
    import jax

    from astroz_tpu.ops.pallas_sgp4 import (
        _unpack_outs, build_merge_staging, propagate_deep_pallas,
        propagate_fast_pallas_sep_merge)

    c = build_catalog("\n".join([MIXED_TEXT] * 10))
    sat_block, kq = 128, 8
    perm, onehot, keep, K, _g = build_merge_staging(
        c.deep_idx, len(c), sat_block, kq, group_blocks=1)
    jd = c.epochs_jd[0] + np.array([0.0, 0.5])
    t_time = jnp.asarray((jd - c.epoch_min_jd) * 1440.0)
    t_sat, t_sat_deep, _, _ = c.fast_staging
    take = lambda x: x[perm] if getattr(x, "ndim", 0) else x  # noqa: E731
    els_p = jax.tree_util.tree_map(take, c.els_deep)
    deep_p = jax.tree_util.tree_map(take, c.deep_sub)
    tsd = t_time[:, None] - t_sat_deep[perm][None, :]

    res = {}
    for wv in (True, False):
        dr, dv, de = _unpack_outs(propagate_deep_pallas(
            els_p, deep_p, tsd, c.grav, resonance_steps=4, sat_block=K,
            interpret=True, planes=True, want_vel=wv), wv)
        assert (dv is None) == (not wv)
        outs = propagate_fast_pallas_sep_merge(
            c.els, t_time, t_sat, c.grav, dr, dv, de,
            jnp.asarray(onehot, jnp.bfloat16), jnp.asarray(keep),
            kepler_iters=c.kepler_iters, sat_block=sat_block,
            interpret=True, planes=True, want_vel=wv)
        res[wv] = _unpack_outs(outs, wv)
    np.testing.assert_array_equal(np.asarray(res[False][0]),
                                  np.asarray(res[True][0]))
    np.testing.assert_array_equal(np.asarray(res[False][2]),
                                  np.asarray(res[True][2]))
    assert res[False][1] is None
