"""Sharded propagation: multi-device equivalence on the virtual CPU mesh.

The TPU analogue of the reference's threading-correctness-by-equivalence
tests (timeMajor == satelliteMajor, Constellation.zig:840-873): the
sharded result must equal the single-device result exactly.
"""

import jax
import numpy as np
import pytest

from astroz_tpu import build_catalog, propagate
from astroz_tpu.parallel import make_mesh, pad_catalog, propagate_sharded

from test_propagation import MIXED_TEXT


@pytest.fixture(scope="module")
def cat():
    return build_catalog(MIXED_TEXT)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_pad_catalog(cat):
    padded, n_real = pad_catalog(cat, 8)
    assert n_real == 5
    assert len(padded) == 8
    # padding repeats the last satellite
    assert padded.satnum[-1] == cat.satnum[-1]


@pytest.mark.parametrize("time_parallel", [1, 2])
def test_sharded_equals_single_device(cat, time_parallel):
    mesh = make_mesh(time_parallel=time_parallel)
    epoch = cat.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 1.0, 7)  # odd count forces time padding
    r_ref, v_ref, e_ref = propagate(cat, jd)
    r, v, e = propagate_sharded(cat, jd, mesh=mesh)
    assert r.shape == r_ref.shape
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e_ref))


def test_sharded_ecef(cat):
    mesh = make_mesh()
    epoch = cat.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 0.5, 8)
    r_ref, _, _ = propagate(cat, jd, output="ecef")
    r, _, _ = propagate_sharded(cat, jd, mesh=mesh, output="ecef")
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-9)


@pytest.mark.parametrize("time_parallel", [1, 2])
def test_shard_map_fast_matches_single_device(cat, time_parallel):
    from astroz_tpu.parallel import propagate_sharded_fast
    mesh = make_mesh(time_parallel=time_parallel)
    epoch = cat.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 1.0, 7)
    r_ref, v_ref, e_ref = propagate(cat, jd, method="fast")
    r, v, e = propagate_sharded_fast(cat, jd, mesh=mesh, engine="xla")
    assert r.shape == r_ref.shape
    dr = np.linalg.norm(np.asarray(r, np.float64)
                        - np.asarray(r_ref, np.float64), axis=-1)
    # both run the partitioned fast path (shallow kernel + deep-subset
    # kernel); differences are f32 op-order only
    assert dr.max() < 0.05
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e_ref))


def test_shard_map_fast_pure_leo(cat):
    from astroz_tpu import build_catalog
    from astroz_tpu.parallel import propagate_sharded_fast
    from test_sgp4 import ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2
    leo = build_catalog("\n".join([ISS_L1, ISS_L2, TRAJ_L1, TRAJ_L2]))
    mesh = make_mesh()
    epoch = leo.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 0.5, 8)
    r_ref, _, e_ref = propagate(leo, jd, method="fast")
    r, v, e = propagate_sharded_fast(leo, jd, mesh=mesh, engine="xla")
    dr = np.linalg.norm(np.asarray(r, np.float64)
                        - np.asarray(r_ref, np.float64), axis=-1)
    # same kernel; XLA fuses differently per shard shape, so
    # expect f32-rounding-order differences only
    assert dr.max() < 0.005


def test_sharded_layouts_and_novel(cat):
    """layout / velocities=False contracts through the sharded fast
    path (the multi-chip bench mode runs layout='planes')."""
    from astroz_tpu.parallel import propagate_sharded_fast
    mesh = make_mesh()
    epoch = cat.epochs_jd[0]
    jd = epoch + np.linspace(0.0, 1.0, 7)
    r, v, e = propagate_sharded_fast(cat, jd, mesh=mesh, engine="xla")
    rp, vp, ep = propagate_sharded_fast(cat, jd, mesh=mesh, engine="xla",
                                        layout="planes")
    assert rp.shape == (3, 7, len(cat))
    np.testing.assert_allclose(np.asarray(rp),
                               np.moveaxis(np.asarray(r), -1, 0),
                               rtol=0, atol=1e-9)
    rs, vs, es = propagate_sharded_fast(cat, jd, mesh=mesh, engine="xla",
                                        layout="sat_major")
    assert rs.shape == (len(cat), 7, 3)
    np.testing.assert_allclose(np.asarray(rs),
                               np.swapaxes(np.asarray(r), 0, 1),
                               rtol=0, atol=1e-9)
    r0, v0, e0 = propagate_sharded_fast(cat, jd, mesh=mesh, engine="xla",
                                        velocities=False)
    assert v0 is None
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r))


def test_bench_mesh_smoke(monkeypatch, capsys):
    """bench.py --mesh executes end-to-end on the 8-device virtual mesh
    (VERDICT r2 #3: the v5e-8 north-star harness must be one flag away)."""
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(bench, "N_SATS", 512)
    monkeypatch.setattr(bench, "N_TIMES", 32)
    bench.main_mesh()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "constellation_512x32_props_per_s_mesh8"
    assert rec["value"] > 0
