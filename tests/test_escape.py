"""f64 accuracy escape for extreme half-day HEO lanes (fast method).

The fast split-precision deep tail loses tens of meters at e>0.7
perigees (the differential sweep's 47 m worst case lived there);
``SatCatalog.heo_escape`` recomputes exactly those columns at full f64
via the loop-free table-resonance propagate
(``ops.fast.sdp4_propagate_tables``) and substitutes them into the
small deep planes before the merge. Reference accuracy budget:
README.md:55-57 (<100 m vs python-sgp4) — the escape keeps the fast
path an order of magnitude inside it on its worst regime.
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
    HEO_L1, HEO_L2,   # Molniya-class: e=0.7318, half-day (irez=2)
    ISS_L1, ISS_L2,
])


@pytest.fixture(scope="module")
def cat():
    # several sat-blocks so the fused merge staging exists too
    return build_catalog("\n".join([MIXED_TEXT] * 30))


def test_heo_escape_staging(cat):
    esc = cat.heo_escape
    assert esc is not None
    els_x, deep_x, t_sat_x, pos_dev, idx_dev = esc
    idx = np.asarray(idx_dev)
    # exactly the Molniya lanes escape: e > 0.7 AND half-day resonant
    ecc_d = np.asarray(cat.host["els_deep_np"].ecco)
    irez_d = np.asarray(cat.host["deep_sub_np"].irez)
    expect = np.nonzero((irez_d == 2) & (ecc_d > 0.7))[0]
    np.testing.assert_array_equal(np.sort(idx), expect)
    assert float(np.asarray(els_x.ecco).min()) > 0.7
    assert (np.asarray(deep_x.irez) == 2).all()
    # packed positions exist (merge staging exists for this catalog)
    # and address the same satellites in the compacted order
    assert pos_dev is not None
    _, _, _, _, els_p, _, _ = cat.merge_staging
    np.testing.assert_allclose(
        np.asarray(els_p.ecco)[np.asarray(pos_dev)],
        np.asarray(els_x.ecco), rtol=0, atol=0)


def test_escape_columns_match_f64(cat):
    """Escape columns of the fast method must agree with method='f64'
    to f32 output rounding (~3 m at Molniya apogee) — NOT the plain
    fast tail's tens of meters."""
    jd = cat.epochs_jd[0] + np.linspace(-0.5, 0.5, 9)
    r_fa, v_fa, e_fa = propagate(cat, jd, method="fast")
    r_64, v_64, e_64 = propagate(cat, jd, method="f64")
    cols = np.asarray(cat.deep_idx)[np.asarray(cat.heo_escape[4])]
    np.testing.assert_array_equal(np.asarray(e_fa)[:, cols],
                                  np.asarray(e_64)[:, cols])
    dr = np.linalg.norm(np.asarray(r_fa, np.float64)[:, cols]
                        - np.asarray(r_64)[:, cols], axis=-1)
    assert dr.max() < 5e-3, f"escape column off by {dr.max()*1e3:.1f} m"
    dv = np.linalg.norm(np.asarray(v_fa, np.float64)[:, cols]
                        - np.asarray(v_64)[:, cols], axis=-1)
    assert dv.max() < 5e-6


def test_escape_fused_matches_partitioned(cat):
    """The fused (Pallas interpret) path with packed escape positions
    must substitute the same columns as the partitioned path."""
    from astroz_tpu.propagation import (_propagate_fast_fused,
                                        _propagate_fast_partitioned,
                                        _resonance_window)

    staging = cat.merge_staging
    assert staging is not None
    onehot, keep, _k, g, els_p, deep_p, t_sat_p = staging
    jd = cat.epochs_jd[0] + np.linspace(0.0, 1.0, 5)
    t_time = jnp.asarray((jd - cat.epoch_min_jd) * 1440.0)
    jd_sum = jnp.asarray(jd)[:, None]
    t_sat, t_sat_deep, _, _ = cat.fast_staging
    steps = 4
    window = _resonance_window(cat.deep_epochs_jd)
    esc = cat.heo_escape
    tb_x = cat.escape_tables(steps)

    r_f, _, e_f = _propagate_fast_fused(
        cat.els, els_p, deep_p, onehot, keep, t_time, t_sat, t_sat_p,
        jd_sum, cat.grav, "teme", True, cat.kepler_iters, steps,
        "planes", window, cat.resonance_tables_packed(steps), g,
        interpret=True, escape=(esc[0], esc[1], esc[2], esc[3], tb_x))
    r_s, _, e_s = _propagate_fast_partitioned(
        cat.els, cat.els_deep, cat.deep_sub, cat.deep_idx_dev, t_time,
        t_sat, t_sat_deep, jd_sum, cat.grav, "teme", True,
        cat.kepler_iters, "xla", steps, "planes", window,
        cat.resonance_tables(steps),
        escape=(esc[0], esc[1], esc[2], esc[4], tb_x))

    cols = np.asarray(cat.deep_idx)[np.asarray(esc[4])]
    np.testing.assert_array_equal(np.asarray(e_f), np.asarray(e_s))
    # escape columns are written by the SAME f64 recompute on both
    # paths; only the bf16-split one-hot readback separates them
    np.testing.assert_allclose(
        np.asarray(r_f, np.float64)[:, :, cols],
        np.asarray(r_s, np.float64)[:, :, cols], atol=1e-3)


def test_no_escape_below_threshold():
    """Half-day lanes at e<=0.7 and high-e GEO lanes must NOT escape."""
    c = build_catalog("\n".join([ISS_L1, ISS_L2, GPS_L1, GPS_L2,
                                 GEO_L1, GEO_L2]))
    assert c.heo_escape is None


def test_sdp4_propagate_tables_matches_unified():
    """The loop-free table-resonance f64 propagate must match the
    unified while_loop engine on its target lanes (same 720-min
    stepper, table-form evaluation)."""
    from astroz_tpu.ops.fast import (build_resonance_tables,
                                     sdp4_propagate_tables)
    from astroz_tpu.ops.sdp4 import sdp4_propagate

    c = build_catalog("\n".join([HEO_L1, HEO_L2]))
    t = jnp.asarray(np.linspace(-720.0, 1440.0, 13))[:, None]
    els, deep = c.els_deep, c.deep_sub
    tb = build_resonance_tables(deep, els, n_steps=8)
    r_t, v_t, e_t = sdp4_propagate_tables(els, deep, t, c.grav,
                                          resonance_steps=8, tables=tb)
    r_u, v_u, e_u, _ = sdp4_propagate(els, deep, t, c.grav)
    np.testing.assert_array_equal(np.asarray(e_t), np.asarray(e_u))
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_u),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_u),
                               rtol=0, atol=1e-9)


def test_drag_inflated_kepler_rung():
    """A high-bstar LEO propagated backward inflates its runtime em far
    past the epoch eccentricity; the trip ladder must key on the
    drag-inflated bound (measured 341 m under the epoch-keyed 3-trip
    rung at t=-240 min; ~4 m with the inflated bound selecting 8)."""
    import numpy as np

    from astroz_tpu.constants import WGS72
    from astroz_tpu.ops.sgp4 import sgp4_init
    from astroz_tpu.propagation import catalog_from_elements, propagate

    two_pi = 2.0 * np.pi
    fields = dict(
        no_kozai=np.array([15.678 * two_pi / 1440.0]),
        ecco=np.array([0.0488]), inclo=np.array([0.549]),
        nodeo=np.array([1.0]), argpo=np.array([2.0]), mo=np.array([3.0]),
        bstar=np.array([4.15e-4]), epoch_jd=np.array([2460310.5]))
    cat = catalog_from_elements(sgp4_init(WGS72, **fields), WGS72)
    assert cat.kepler_iters == 8  # drag bound, not epoch ecc (rung 3)
    jd = 2460310.5 + np.linspace(-1.0, 1.0, 13)
    r_fa, _, e_fa = propagate(cat, jd, method="fast")
    r_64, _, e_64 = propagate(cat, jd, method="f64")
    ok = (np.asarray(e_fa) == 0) & (np.asarray(e_64) == 0)
    assert ok.any()
    dr = np.linalg.norm(np.asarray(r_fa, np.float64) - np.asarray(r_64),
                        axis=-1)[ok]
    assert dr.max() < 0.02, f"drag-inflated lane off {dr.max()*1e3:.0f} m"


def test_catalog_fast_sweep_worst_case():
    """End-to-end catalog fast path (rung ladder + heo escape + deep
    merge machinery) vs the oracle on the pinned-epoch regime sweep:
    worst case must stay under 40 m — the measured distributed-f32
    rounding floor is ~36 m (GEO-radius angle/radius ULPs), 2.5x inside
    the reference's 100 m budget (README.md:55-57)."""
    import numpy as np

    from astroz_tpu.constants import WGS72
    from astroz_tpu.ops.sgp4 import sgp4_init
    from astroz_tpu.propagation import catalog_from_elements, propagate
    from test_differential import (EPOCH_JD, SWEEP_TIMES, oracle_sweep,
                                   random_elements)

    n = 120
    fields = random_elements(n)
    fields["epoch_jd"] = np.full(n, EPOCH_JD)
    o_err, o_r, o_v = oracle_sweep(fields, SWEEP_TIMES)
    cat = catalog_from_elements(sgp4_init(WGS72, **fields), WGS72)
    jd = EPOCH_JD + SWEEP_TIMES / 1440.0
    r, v, e = propagate(cat, jd, method="fast")
    ok = (np.asarray(e) == 0) & (o_err == 0)
    assert ok.mean() > 0.8
    dr = np.linalg.norm(np.asarray(r, np.float64) - o_r, axis=-1)
    worst = dr[ok].max()
    assert worst < 0.04, f"catalog fast worst {worst*1e3:.1f} m"
