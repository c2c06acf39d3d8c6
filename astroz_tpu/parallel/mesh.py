"""Device mesh construction and sharded catalog propagation.

Replaces the reference's thread-pool work decomposition
(Constellation.zig:337-385: timeMajor = threads over time ranges,
satelliteMajor = threads over batch ranges) with the XLA/SPMD model:

* the satellite axis is sharded over the ``"sat"`` mesh axis (ICI);
* the time axis can optionally be sharded over a second ``"time"`` axis;
* every kernel is elementwise over the (n_times, n_sats) grid, so the
  compiled program contains **no collectives** — each chip propagates
  its satellite shard for its time shard, the direct analogue of each
  thread owning a disjoint output slice (Constellation.zig:337-384).

Padding: the reference pads 8-wide SIMD batches by repeating the last
satellite (Constellation.zig:146). Here we pad the catalog to a multiple
of the mesh's sat-axis size the same way and trim the outputs.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import MINUTES_PER_DAY
from ..propagation import (SatCatalog, _propagate_mixed, _propagate_shallow)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              sat_parallel: Optional[int] = None,
              time_parallel: int = 1) -> Mesh:
    """Build a ``(time, sat)`` mesh over the given (or all) devices.

    By default all devices go to the ``"sat"`` axis — propagation is
    embarrassingly parallel over satellites, so this is the layout that
    keeps every collective off the profile. Set ``time_parallel > 1`` to
    split long time grids too (useful when n_sats is small).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if sat_parallel is None:
        if n % time_parallel != 0:
            raise ValueError(
                f"time_parallel ({time_parallel}) must divide the device "
                f"count ({n}); got {n} devices — pass sat_parallel "
                f"explicitly or pick time_parallel from the divisors of "
                f"{n}")
        sat_parallel = n // time_parallel
    if sat_parallel < 1 or time_parallel < 1:
        raise ValueError(
            f"mesh axes must be >= 1 (got sat_parallel={sat_parallel}, "
            f"time_parallel={time_parallel} over {n} devices)")
    if sat_parallel * time_parallel != n:
        raise ValueError(
            f"sat_parallel ({sat_parallel}) x time_parallel "
            f"({time_parallel}) must equal device count ({n}); pick "
            f"factors of {n} or let sat_parallel default")
    dev_array = np.asarray(devices).reshape(time_parallel, sat_parallel)
    return Mesh(dev_array, axis_names=("time", "sat"))


def _pad_count(n: int, multiple: int) -> int:
    return (-n) % multiple


def pad_catalog(cat: SatCatalog, multiple: int
                ) -> Tuple[SatCatalog, int]:
    """Pad the catalog to a multiple of ``multiple`` satellites by
    repeating the last satellite (reference: Constellation.zig:146).

    Returns ``(padded_catalog, n_real)``.
    """
    n = len(cat)
    pad = _pad_count(n, multiple)
    if pad == 0:
        return cat, n

    def pad_leaf(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        reps = jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    els = jax.tree_util.tree_map(pad_leaf, cat.els)
    deep = (jax.tree_util.tree_map(pad_leaf, cat.deep)
            if cat.deep is not None else None)
    satnum = np.concatenate([cat.satnum,
                             np.repeat(cat.satnum[-1:], pad)])
    return SatCatalog(els=els, deep=deep, grav=cat.grav, satnum=satnum,
                      names=None), n


def shard_catalog(cat: SatCatalog, mesh: Mesh) -> Tuple[SatCatalog, int]:
    """Pad to the sat-axis size and place element pytrees with a
    ``P("sat")`` sharding so the propagate compiles fully SPMD."""
    sat_size = mesh.shape["sat"]
    padded, n_real = pad_catalog(cat, sat_size)
    sharding = NamedSharding(mesh, P("sat"))

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    els = jax.tree_util.tree_map(place, padded.els)
    deep = (jax.tree_util.tree_map(place, padded.deep)
            if padded.deep is not None else None)
    return SatCatalog(els=els, deep=deep, grav=padded.grav,
                      satnum=padded.satnum, names=None), n_real


def propagate_sharded(cat: SatCatalog, jd, fr=None, *, mesh: Mesh,
                      output: str = "teme", velocities: bool = True):
    """Dense-grid propagate with the satellite axis sharded over ICI.

    The time axis is sharded too when the mesh has ``time_parallel > 1``
    (times are padded by repeating the last epoch). Returns
    ``(r, v, error)`` shaped ``(n_times, n_sats, 3)`` — logically global
    arrays; each shard lives on its device until gathered.
    """
    dt = cat.els.epoch_jd.dtype
    jd = jnp.atleast_1d(jnp.asarray(jd, dt))
    if fr is None:
        fr = jnp.zeros_like(jd)
    fr = jnp.broadcast_to(jnp.asarray(fr, dt), jd.shape)

    time_size = mesh.shape["time"]
    n_times = jd.shape[0]
    tpad = _pad_count(n_times, time_size)
    if tpad:
        jd = jnp.concatenate([jd, jnp.broadcast_to(jd[-1:], (tpad,))])
        fr = jnp.concatenate([fr, jnp.broadcast_to(fr[-1:], (tpad,))])

    scat, n_real = shard_catalog(cat, mesh)

    grid_sh = NamedSharding(mesh, P("time", "sat"))
    time_sh = NamedSharding(mesh, P("time"))
    jd = jax.device_put(jd, time_sh)
    fr = jax.device_put(fr, time_sh)

    tsince = ((jd[:, None] - scat.els.epoch_jd[None, :])
              + fr[:, None]) * MINUTES_PER_DAY
    tsince = jax.lax.with_sharding_constraint(tsince, grid_sh)
    jd_sum = (jd + fr)[:, None]

    if scat.deep is None:
        r, v, err = _propagate_shallow(scat.els, tsince, jd_sum, scat.grav,
                                       output, velocities)
    else:
        r, v, err = _propagate_mixed(scat.els, scat.deep, tsince, jd_sum,
                                     scat.grav, output, velocities)

    r = r[:n_times, :n_real]
    err = err[:n_times, :n_real]
    if v is not None:
        v = v[:n_times, :n_real]
    return r, v, err


@functools.lru_cache(maxsize=32)
def _sharded_fast_fn(mesh: Mesh, grav, kepler_iters: int, engine: str,
                     output: str, want_vel: bool, layout: str,
                     res_steps: int, mixed: bool, res_window=None,
                     deep_kepler_iters: int = 8):
    """Build (once per static configuration) the jitted shard_map for
    :func:`propagate_sharded_fast`. Cached: a fresh closure per call
    would make ``jax.jit`` miss its trace cache and recompile the whole
    SPMD program on every invocation — fatal for benchmark loops and
    repeated screening passes."""
    from jax import shard_map

    from ..ops.sdp4 import DeepElements
    from ..ops.sgp4 import Sgp4Elements
    from ..propagation import (_deep_planes, _finalize_planes,
                               _shallow_planes)

    sat_spec = P("sat")
    time_spec = P("time")
    time2_spec = P("time", None)
    rep_spec = P()
    if layout == "sat_major":
        out_r = P("sat", "time", None)
        out_e = P("sat", "time")
    elif layout == "planes":
        out_r = P(None, "time", "sat")
        out_e = P("time", "sat")
    else:
        out_r = P("time", "sat", None)
        out_e = P("time", "sat")
    out_specs = (out_r, out_r, out_e) if want_vel else (out_r, out_e)
    els_specs = Sgp4Elements(*([sat_spec] * len(Sgp4Elements._fields)))

    if mixed:
        els_deep_specs = Sgp4Elements(
            *([rep_spec] * len(Sgp4Elements._fields)))
        deep_sub_specs = DeepElements(
            *([rep_spec] * len(DeepElements._fields)))

        def shard_fn(els_l, tt, ts, js, m_loc, i_loc, e_deep, d_sub, tsd):
            r3, v3, err = _shallow_planes(els_l, tt, ts, grav,
                                          kepler_iters, engine, want_vel)
            # deep tsince grid built in-shard: each device computes the
            # deep subset only for its own time rows
            ts_deep = tt[:, None] - tsd[None, :]
            d_r3, d_v3, d_err = _deep_planes(e_deep, d_sub, ts_deep,
                                             grav, engine, res_steps,
                                             want_vel, res_window,
                                             kepler_iters=
                                             deep_kepler_iters)
            m = m_loc[None, :]
            r3 = jnp.where(m[None], d_r3[:, :, i_loc], r3)
            if want_vel:
                v3 = jnp.where(m[None], d_v3[:, :, i_loc], v3)
            err = jnp.where(m, d_err[:, i_loc], err)
            r, v, err = _finalize_planes(r3, v3, err, js, output,
                                         want_vel, layout)
            return (r, v, err) if want_vel else (r, err)

        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=(els_specs, time_spec, sat_spec,
                                 time2_spec, sat_spec, sat_spec,
                                 els_deep_specs, deep_sub_specs,
                                 rep_spec),
                       out_specs=out_specs,
                       check_vma=False)
    else:
        def shard_fn(els_l, tt, ts, js):
            r3, v3, err = _shallow_planes(els_l, tt, ts, grav,
                                          kepler_iters, engine, want_vel)
            r, v, err = _finalize_planes(r3, v3, err, js, output,
                                         want_vel, layout)
            return (r, v, err) if want_vel else (r, err)

        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=(els_specs, time_spec, sat_spec,
                                 time2_spec),
                       out_specs=out_specs,
                       check_vma=False)
    return jax.jit(fn)



def _put_packed_sharded(tree, mesh, spec):
    """Pytree host->device with a NamedSharding, PACKED: same-shape/
    dtype leaves stack into one transfer each (CLAUDE.md: per-leaf
    device_put through a degraded tunnel measured up to ~4 s/leaf; the
    els pytree alone is ~30 leaves). The pack ships with the leaf spec
    prefixed by a replicated stack axis; the jitted unpack pins its
    outputs to the leaf sharding so no resharding follows. CPU targets
    keep plain per-leaf placement (local puts are ~free; the unpack
    would cost a pointless compile)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    leaf_sh = NamedSharding(mesh, spec)

    def placeable(x):
        return hasattr(x, "ndim") and x.ndim >= 1

    if mesh.devices.reshape(-1)[0].platform == "cpu"             and mesh.devices.size == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, leaf_sh) if placeable(x) else x,
            tree)

    pack_sh = NamedSharding(mesh, P(None, *spec))
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups = {}
    for i, leaf in enumerate(leaves):
        if not placeable(leaf):
            continue
        arr = np.asarray(leaf)
        groups.setdefault((arr.shape, arr.dtype.str), []).append((i, arr))
    out = list(leaves)
    for _, members in groups.items():
        if len(members) == 1:
            i, arr = members[0]
            out[i] = jax.device_put(arr, leaf_sh)
            continue
        pack = jax.device_put(np.stack([a for _, a in members]), pack_sh)
        parts = _unpack_to(pack, len(members), leaf_sh)
        for k, (i, _) in enumerate(members):
            out[i] = parts[k]
    return jax.tree_util.tree_unflatten(treedef, out)


@functools.partial(jax.jit, static_argnames=("n", "sh"))
def _unpack_to(pack, n: int, sh):
    """Split a pack into rows in ONE program, outputs pinned to ``sh``
    (an eager pack[k] per leaf would both compile per-k programs and
    let GSPMD pick arbitrary output shardings)."""
    return tuple(jax.lax.with_sharding_constraint(pack[i], sh)
                 for i in range(n))


def stage_sharded_fast(cat: SatCatalog, jd, fr=None, *, mesh: Mesh,
                       output: str = "teme", velocities: bool = True,
                       engine: Optional[str] = None,
                       layout: str = "time_major"):
    """Stage the sharded fast propagate: place every input with its
    mesh sharding and return ``(fn, args, (n_times, n_real))`` where
    ``fn(*args)`` executes one dense-grid sweep. Benchmark loops call
    the returned ``fn`` directly so the per-call cost is ONE dispatch —
    no re-staging, no host work (:func:`propagate_sharded_fast` is the
    one-shot convenience wrapper)."""
    from ..propagation import default_engine

    if engine is None:
        engine = default_engine()

    dt = cat.els.epoch_jd.dtype
    jd = jnp.atleast_1d(jnp.asarray(jd, dt))
    if fr is None:
        fr = jnp.zeros_like(jd)
    fr = jnp.broadcast_to(jnp.asarray(fr, dt), jd.shape)

    time_size = mesh.shape["time"]
    n_times = jd.shape[0]
    tpad = _pad_count(n_times, time_size)
    if tpad:
        jd = jnp.concatenate([jd, jnp.broadcast_to(jd[-1:], (tpad,))])
        fr = jnp.concatenate([fr, jnp.broadcast_to(fr[-1:], (tpad,))])

    scat, n_real = pad_catalog(cat, mesh.shape["sat"])
    grav = scat.grav
    kepler_iters = cat.kepler_iters  # cached on the caller's catalog
    want_vel = bool(velocities)

    # separable time factors: t_time over the time axis, per-satellite
    # epoch offsets over the sat axis — the (T, S) grid only ever
    # exists as f32 planes inside the kernels, never as f64 in HBM
    ref = cat.epoch_min_jd
    t_time = ((jd - ref) + fr) * MINUTES_PER_DAY
    t_sat = (scat.els.epoch_jd - ref) * MINUTES_PER_DAY
    jd_sum = (jd + fr)[:, None]
    # host-known horizon -> static resonance table depth (power of two
    # to bound recompilation; see ops/fast.py:_resonance_tables).
    jd_h = np.asarray(jd) + np.asarray(fr)
    ep = cat.epochs_jd
    tmax = float(max(abs(jd_h.max() - ep.min()),
                     abs(jd_h.min() - ep.max())) * MINUTES_PER_DAY)
    res_steps = max(2, int(2 ** np.ceil(np.log2(
        max(tmax / 720.0, 1.0) + 1.0))))

    sat_spec = P("sat")
    time_spec = P("time")
    time2_spec = P("time", None)

    # Place inputs explicitly: catalog arrays may arrive committed to a
    # single device (catalog_from_elements runs init on the host CPU and
    # pins the result), and committed single-device inputs conflict with
    # a multi-device shard_map jit.
    sat_sh = NamedSharding(mesh, sat_spec)

    els = _put_packed_sharded(scat.els, mesh, sat_spec)
    t_time = jax.device_put(t_time, NamedSharding(mesh, time_spec))
    t_sat = jax.device_put(t_sat, sat_sh)
    jd_sum = jax.device_put(jd_sum, NamedSharding(mesh, time2_spec))

    if scat.deep is not None:
        # Partitioned SPMD: every device runs the SHALLOW kernel on its
        # satellite shard, plus the full (tiny, ~5%) deep subset
        # REPLICATED — then substitutes its own deep columns via a
        # static per-shard expansion map. This keeps per-lane cost at
        # shallow rate (the old design ran the unified masked-dense
        # kernel per shard, making every lane pay the deep tail), with
        # zero collectives: replicated redundant deep work is far
        # cheaper than deep-rate shallow lanes.
        n0 = len(cat)
        is_deep_h = np.zeros(scat.els.is_deep.shape[0], bool)
        is_deep_h[:n0] = cat.is_deep
        rows_h = np.maximum(np.cumsum(is_deep_h) - 1, 0).astype(np.int32)
        if scat.els.is_deep.shape[0] > n0:  # pad lanes repeat the last sat
            is_deep_h[n0:] = is_deep_h[n0 - 1]
            rows_h[n0:] = rows_h[n0 - 1]
        rep_sh = NamedSharding(mesh, P())
        mask_loc = jax.device_put(jnp.asarray(is_deep_h), sat_sh)
        inv_loc = jax.device_put(jnp.asarray(rows_h), sat_sh)
        els_deep = _put_packed_sharded(cat.els_deep, mesh, P())
        deep_sub = _put_packed_sharded(cat.deep_sub, mesh, P())
        t_sat_deep = jax.device_put(
            (els_deep.epoch_jd - ref) * MINUTES_PER_DAY, rep_sh)
        from ..propagation import _resonance_window
        fn = _sharded_fast_fn(mesh, grav, kepler_iters, engine, output,
                              want_vel, layout, res_steps, True,
                              _resonance_window(cat.deep_epochs_jd),
                              deep_kepler_iters=cat.deep_kepler_iters)
        args = (els, t_time, t_sat, jd_sum, mask_loc,
                inv_loc, els_deep, deep_sub, t_sat_deep)
    else:
        fn = _sharded_fast_fn(mesh, grav, kepler_iters, engine, output,
                              want_vel, layout, res_steps, False)
        args = (els, t_time, t_sat, jd_sum)
    return fn, args, (n_times, n_real)


def propagate_sharded_fast(cat: SatCatalog, jd, fr=None, *, mesh: Mesh,
                           output: str = "teme", velocities: bool = True,
                           engine: Optional[str] = None,
                           layout: str = "time_major"):
    """Dense-grid propagate via ``shard_map``: each device runs the
    split-precision fast kernel on its satellite shard — the SAME
    separable planes program as the single-chip fast path
    (propagation._propagate_fast_shallow/_partitioned), so the
    multi-chip rate per chip matches the headline single-chip rate.

    Mixed catalogs run PARTITIONED per shard: the shallow kernel over
    the device's satellite shard at full shallow rate, plus the whole
    (tiny) deep subset replicated per device — time-sharded when the
    mesh has a time axis — substituted into the shard's deep columns by
    a static expansion map. Uniform SPMD, zero collectives: the
    multi-chip shape of the reference's batch-range threading
    (Constellation.zig:360-382) combined with its SGP4/SDP4 batch
    split. ``engine`` selects the per-shard kernel ('pallas' on TPU
    when available, 'xla' otherwise); ``layout``/``velocities`` follow
    :func:`astroz_tpu.propagation.propagate`.

    Accuracy note: the single-chip fast path recomputes extreme
    half-day lanes (irez=2, e>0.7) at full f64
    (SatCatalog.heo_escape); this sharded path keeps the plain f32
    deep tail on those few lanes (~tens of meters there, still an
    order of magnitude inside the 100 m budget). Use
    :func:`propagate_sharded` (f64) when extreme-HEO meters matter on
    multi-chip sweeps.
    """
    fn, args, (n_times, n_real) = stage_sharded_fast(
        cat, jd, fr, mesh=mesh, output=output, velocities=velocities,
        engine=engine, layout=layout)
    outs = fn(*args)
    want_vel = bool(velocities)

    if want_vel:
        r, v, err = outs
    else:
        (r, err), v = outs, None
    if layout == "sat_major":
        r = r[:n_real, :n_times]
        err = err[:n_real, :n_times]
        v = v[:n_real, :n_times] if v is not None else None
    elif layout == "planes":
        r = r[:, :n_times, :n_real]
        err = err[:n_times, :n_real]
        v = v[:, :n_times, :n_real] if v is not None else None
    else:
        r = r[:n_times, :n_real]
        err = err[:n_times, :n_real]
        v = v[:n_times, :n_real] if v is not None else None
    return r, v, err
