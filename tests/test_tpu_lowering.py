"""TPU cross-lowering regression tests.

Every other Pallas test runs in interpret mode on the CPU mesh, which
skips Mosaic lowering entirely — so a kernel that interprets fine can
still CRASH at compile time on real hardware (round 3's headline bench
was lost to exactly that: `j // g` in a BlockSpec index map produced an
i64 convert that infinitely recursed Mosaic's convert_element_type
rule). JAX can run the Mosaic lowering pipeline for a TPU target from
a CPU-only host via cross-platform lowering, so these tests lower (not
run) the real dispatch wrappers for platform "tpu" and assert the HLO
materializes. Known-unlowerable constructs (i64 converts, jnp.clip,
optimization_barrier — see CLAUDE.md "Mosaic pitfalls") all fail here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astroz_tpu import build_catalog
from astroz_tpu.propagation import (_propagate_fast_fused,
                                    _propagate_fast_partitioned,
                                    _propagate_fast_shallow,
                                    _resonance_window)

from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2
from test_sdp4 import GPS_L1, GPS_L2, GEO_L1, GEO_L2, HEO_L1, HEO_L2

MIXED_TEXT = "\n".join([
    TRAJ_L1, TRAJ_L2,
    GPS_L1, GPS_L2,
    GEO_L1, GEO_L2,
    HEO_L1, HEO_L2,
    ISS_L1, ISS_L2,
])


def _lower_tpu(jitted, *args, **kwargs):
    """Trace + lower for a TPU target on this (CPU) host; returns the
    StableHLO text so callers can assert on its contents."""
    lowered = jitted.trace(*args, **kwargs).lower(
        lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text, "pallas_call did not lower to TPU"
    return text


@pytest.fixture(scope="module")
def cat():
    # several sat-blocks so the grouped merge path (g>1 index maps)
    # is exercised, not just the single-block degenerate case
    return build_catalog("\n".join([MIXED_TEXT] * 52))  # 260 sats


@pytest.fixture(scope="module")
def times(cat):
    jd = cat.epochs_jd[0] + np.linspace(0.0, 1.0, 5)
    t_time = jnp.asarray((jd - cat.epoch_min_jd) * 1440.0)
    jd_sum = jnp.asarray(jd)[:, None]
    return t_time, jd_sum


@pytest.mark.parametrize("want_vel", [True, False])
def test_fused_merge_lowers_for_tpu(cat, times, want_vel):
    """The EXACT wrapper bench.py/propagate() dispatch on TPU for mixed
    catalogs, fed the exact catalog staging (grouped one-hot merge +
    packed resonance tables)."""
    t_time, jd_sum = times
    onehot, keep, _k, g, els_p, deep_p, t_sat_p = cat.merge_staging
    t_sat, _, _, _ = cat.fast_staging
    steps = 4
    window = _resonance_window(cat.deep_epochs_jd)
    _lower_tpu(_propagate_fast_fused, cat.els, els_p, deep_p, onehot,
               keep, t_time, t_sat, t_sat_p, jd_sum, cat.grav, "teme",
               want_vel, cat.kepler_iters, steps, "planes", window,
               cat.resonance_tables_packed(steps), g)


def test_fused_merge_grouped_g2_lowers_for_tpu(cat, times):
    """Force g=2 grouping explicitly (the index-map division that
    crashed round 3 only divides when g is in play)."""
    from astroz_tpu.ops.pallas_sgp4 import build_merge_staging

    t_time, jd_sum = times
    perm, onehot, keep, K, g = build_merge_staging(
        cat.deep_idx, len(cat), group_blocks=2)
    assert g == 2
    take = lambda x: x[perm] if getattr(x, "ndim", 0) else x  # noqa: E731
    els_p = jax.tree_util.tree_map(take, cat.els_deep)
    deep_p = jax.tree_util.tree_map(take, cat.deep_sub)
    t_sat, t_sat_deep, _, _ = cat.fast_staging
    t_sat_p = t_sat_deep[perm]
    _lower_tpu(_propagate_fast_fused, cat.els, els_p, deep_p,
               jnp.asarray(onehot, jnp.bfloat16), jnp.asarray(keep),
               t_time, t_sat, t_sat_p, jd_sum, cat.grav, "teme", True,
               cat.kepler_iters, 4, "planes",
               _resonance_window(cat.deep_epochs_jd), None, g)


@pytest.mark.parametrize("want_vel", [True, False])
def test_shallow_lowers_for_tpu(times, want_vel):
    shallow = build_catalog("\n".join([ISS_L1, ISS_L2, TRAJ_L1,
                                       TRAJ_L2]))
    t_time, jd_sum = times
    t_sat, _, _, _ = shallow.fast_staging
    _lower_tpu(_propagate_fast_shallow, shallow.els, t_time, t_sat,
               jd_sum, shallow.grav, "teme", want_vel,
               shallow.kepler_iters, "pallas", "planes")


def test_partitioned_scatter_path_lowers_for_tpu(cat, times):
    """The scatter fallback (used when merge staging is unavailable)."""
    t_time, jd_sum = times
    t_sat, t_sat_deep, _, _ = cat.fast_staging
    steps = 4
    window = _resonance_window(cat.deep_epochs_jd)
    _lower_tpu(_propagate_fast_partitioned, cat.els, cat.els_deep,
               cat.deep_sub, cat.deep_idx_dev, t_time, t_sat,
               t_sat_deep, jd_sum, cat.grav, "teme", True,
               cat.kepler_iters, "pallas", steps, "planes", window,
               cat.resonance_tables(steps))
