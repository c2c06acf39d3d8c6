"""Pallas TPU kernel for the near-earth fast tail.

The hot-op analogue of the reference's dispatched SIMD kernels
(simdKernels.zig:9-29 + Sgp4Batch.propagateBatchDirect): one fused
kernel per (time_block, sat_block) tile computing drag -> Kepler ->
short-period -> TEME entirely in VMEM, with per-satellite element
fields loaded once per tile column. The numerics are byte-identical to
the XLA shallow path — both engines call
:func:`astroz_tpu.ops.fast.shallow_tail_f32` — so this kernel is purely
an execution-engine swap, selectable with ``engine="pallas"``.

The f64 angle spine stays in XLA (Mosaic has no f64); the spine's five
reduced-angle grids are materialized to HBM and streamed through VMEM
by the Pallas pipeline.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GravityModel
from .sgp4 import Sgp4Elements
from .fast import _shallow_f32_fields, shallow_tail_f32, spine_f64

#: default tile: 8 sublanes x 1024 lanes of f32 (tuned on v5e: 1024
#: lanes measured ~10% faster than 512 on the 13478-sat catalog; 256
#: is ~30% slower)
TIME_BLOCK = 8
SAT_BLOCK = 1024

#: per-satellite field order fed to the kernel as one (n_fields, S) array
#: (inclination rides as its f32 sincos pair — hoisted per-satellite,
#: see fast._shallow_f32_fields)
_FIELD_NAMES = ("omgcof", "eta", "xmcof", "delmo", "cc1", "d2", "d3",
                "d4", "bstar", "cc4", "cc5", "sinmao", "ecco", "sinip",
                "cosip", "a", "aycof", "xlcof", "con41", "x1mth2",
                "x7thm1")


def _store(out_refs, vals):
    """Write a tail's output tuple into the GROUPED out refs.

    Outputs are stacked component buffers — r (3, T, S), v (3, T, S),
    err (T, S) — written component-by-component into the (3, tb, sb)
    blocks, so the kernel emits the final (3, T, N) layout directly and
    no post-kernel stack copy ever exists (the analogue of the
    reference writing into caller-provided pos/vel buffers,
    satrec.zig:896-988)."""
    if len(vals) == 7:
        r_ref, v_ref, e_ref = out_refs
        v_ref[0], v_ref[1], v_ref[2] = vals[3], vals[4], vals[5]
    else:
        r_ref, e_ref = out_refs
    r_ref[0], r_ref[1], r_ref[2] = vals[0], vals[1], vals[2]
    e_ref[:] = vals[-1]


def _kernel(grav, kepler_iters, want_vel, t_ref, ub_ref, mm_ref, ar_ref,
            no_ref, xm_ref, fields_ref, simp_ref, err0_ref, *out_refs):
    f = {name: fields_ref[i, :] for i, name in enumerate(_FIELD_NAMES)}
    f["not_simp"] = simp_ref[0, :] == 0
    f["error0"] = err0_ref[0, :]
    _store(out_refs, shallow_tail_f32(
        grav, kepler_iters, t_ref[:], ub_ref[:], mm_ref[:], ar_ref[:],
        no_ref[:], xm_ref[:], want_vel=want_vel, **f))


def _out_shapes(n_times: int, n_sats: int, want_vel: bool):
    """Grouped EXACT out shapes: r (3, T, S) f32 [, v (3, T, S) f32],
    err (T, S) i32. Mosaic masks boundary-block stores, so no output
    padding and no post-kernel trim copy."""
    shape_r = jax.ShapeDtypeStruct((3, n_times, n_sats), jnp.float32)
    shape_i = jax.ShapeDtypeStruct((n_times, n_sats), jnp.int32)
    return ([shape_r, shape_r, shape_i] if want_vel
            else [shape_r, shape_i])


def _out_specs(time_block: int, sat_block: int, want_vel: bool):
    def rv_map(i, j):
        return (i - i, i, j)

    rv = pl.BlockSpec((3, time_block, sat_block), rv_map,
                      memory_space=pltpu.VMEM)
    e = pl.BlockSpec((time_block, sat_block), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM)
    return [rv, rv, e] if want_vel else [rv, e]


def _unpack_outs(outs, want_vel: bool):
    """(r3, v3 | None, err) from the grouped kernel outputs."""
    if want_vel:
        r3, v3, err = outs
    else:
        (r3, err), v3 = outs, None
    return r3, v3, err


def _assemble(outs, n_times, n_sats, want_vel: bool):
    """Reshape the grouped (3, T, S) kernel outputs to the classic
    time-major (T, S, 3) contract — ONE relayout (the planes callers
    skip even that: the kernel buffers already are the planes layout)."""
    r3, v3, err = _unpack_outs(outs, want_vel)
    r = jnp.moveaxis(r3, 0, -1)
    v = jnp.moveaxis(v3, 0, -1) if want_vel else None
    return r, v, err


@functools.partial(jax.jit, static_argnames=("grav", "kepler_iters",
                                             "time_block", "sat_block",
                                             "interpret", "want_vel"))
def propagate_fast_pallas(els: Sgp4Elements, tsince, grav: GravityModel,
                          kepler_iters: int = 5,
                          time_block: int = TIME_BLOCK,
                          sat_block: int = SAT_BLOCK,
                          interpret: bool = False,
                          want_vel: bool = True
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Near-earth dense-grid propagate through the Pallas engine.

    ``tsince``: (n_times, 1) or (n_times, n_sats) f64 minutes. Returns
    (r, v, error) like :func:`ops.fast.propagate_fast` (shallow path);
    ``v`` is None with ``want_vel=False`` (4-plane kernel — velocity
    terms never computed). Inputs are padded to tile multiples
    internally; outputs are exact (boundary-block stores are masked).
    """
    t = jnp.asarray(tsince)
    n_sats = els.no_kozai.shape[0]
    n_times = t.shape[0]

    # f64 spine in XLA (fused), producing the f32 reduced-angle grids
    spine = spine_f64(els, t)
    grids = [jnp.broadcast_to(g, (n_times, n_sats)) for g in spine]

    # pack per-sat fields into one (n_fields, S) f32 array
    fdict = _shallow_f32_fields(els)
    fields = jnp.stack([fdict[n] for n in _FIELD_NAMES])
    simp = (~fdict["not_simp"]).astype(jnp.int32)[None, :]
    err0 = fdict["error0"].astype(jnp.int32)[None, :]

    # pad to tile multiples
    tp = (-n_times) % time_block
    sp = (-n_sats) % sat_block
    if tp or sp:
        grids = [jnp.pad(g, ((0, tp), (0, sp))) for g in grids]
        fields = jnp.pad(fields, ((0, 0), (0, sp)),
                         constant_values=0.5)  # benign pad values
        simp = jnp.pad(simp, ((0, 0), (0, sp)), constant_values=1)
        err0 = jnp.pad(err0, ((0, 0), (0, sp)))
    tt, ss = n_times + tp, n_sats + sp

    # NOTE: literal 0 in an index map becomes an i64 under x64 and
    # Mosaic refuses mixed (i64, i32) index returns — derive the zero
    # from the (i32) program id instead.
    def col_map(i, j):
        return (i - i, j)

    grid = (tt // time_block, ss // sat_block)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[pl.BlockSpec((time_block, sat_block),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((len(_FIELD_NAMES), sat_block), col_map,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, sat_block), col_map,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, sat_block), col_map,
                        memory_space=pltpu.VMEM)],
        out_specs=_out_specs(time_block, sat_block, want_vel),
    )
    # no_barriers: the shared tail carries _nofold barriers (XLA-side
    # determinism guards) that Mosaic cannot lower — inside the kernel
    # they become free bitcast round trips
    with no_barriers():
        outs = pl.pallas_call(
            functools.partial(_kernel, grav, kepler_iters, want_vel),
            out_shape=_out_shapes(n_times, n_sats, want_vel),
            grid_spec=grid_spec,
            interpret=interpret,
        )(*grids, fields, simp, err0)
    return _assemble(outs, n_times, n_sats, want_vel)


# ---------------------------------------------------------------------------
# Fully-fused variant: double-f32 spine inside the kernel (no f64 at all)
# ---------------------------------------------------------------------------

from .fast import SPINE_FIELD_NAMES, spine_df32, spine_df32_fields
from .fastmath import no_barriers, split_f64

_ALL_FIELDS = tuple(SPINE_FIELD_NAMES) + _FIELD_NAMES


def _kernel_fused(grav, kepler_iters, want_vel, th_ref, tl_ref,
                  fields_ref, simp_ref, err0_ref, *out_refs):
    sf = {name: fields_ref[i, :] for i, name in
          enumerate(SPINE_FIELD_NAMES)}
    off = len(SPINE_FIELD_NAMES)
    f = {name: fields_ref[off + i, :] for i, name in
         enumerate(_FIELD_NAMES)}
    f["not_simp"] = simp_ref[0, :] == 0
    f["error0"] = err0_ref[0, :]
    spine = spine_df32(th_ref[:], tl_ref[:], **sf)
    _store(out_refs, shallow_tail_f32(
        grav, kepler_iters, *spine, want_vel=want_vel, **f))


@functools.partial(jax.jit, static_argnames=("grav", "kepler_iters",
                                             "time_block", "sat_block",
                                             "interpret", "want_vel"))
def propagate_fast_pallas_fused(els: Sgp4Elements, tsince,
                                grav: GravityModel, kepler_iters: int = 5,
                                time_block: int = TIME_BLOCK,
                                sat_block: int = SAT_BLOCK,
                                interpret: bool = False,
                                want_vel: bool = True
                                ) -> Tuple[jax.Array, jax.Array,
                                           jax.Array]:
    """Near-earth propagate with the whole computation in one Pallas
    kernel: the time-growing angles run in double-f32 (Dekker)
    arithmetic inside the kernel, so nothing touches (emulated) f64 per
    grid point — only the O(n_times + n_sats) splits are f64."""
    t = jnp.asarray(tsince)
    n_sats = els.no_kozai.shape[0]
    n_times = t.shape[0]
    th, tl = split_f64(jnp.broadcast_to(t, (n_times, n_sats)))

    fdict = dict(spine_df32_fields(els))
    fdict.update(_shallow_f32_fields(els))
    fields = jnp.stack([fdict[n] for n in _ALL_FIELDS])
    simp = (~fdict["not_simp"]).astype(jnp.int32)[None, :]
    err0 = fdict["error0"].astype(jnp.int32)[None, :]

    tp = (-n_times) % time_block
    sp = (-n_sats) % sat_block
    if tp or sp:
        th = jnp.pad(th, ((0, tp), (0, sp)))
        tl = jnp.pad(tl, ((0, tp), (0, sp)))
        fields = jnp.pad(fields, ((0, 0), (0, sp)), constant_values=0.5)
        simp = jnp.pad(simp, ((0, 0), (0, sp)), constant_values=1)
        err0 = jnp.pad(err0, ((0, 0), (0, sp)))
    tt, ss = n_times + tp, n_sats + sp

    def col_map(i, j):
        return (i - i, j)

    grid_spec = pl.GridSpec(
        grid=(tt // time_block, ss // sat_block),
        in_specs=[pl.BlockSpec((time_block, sat_block),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((len(_ALL_FIELDS), sat_block), col_map,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, sat_block), col_map,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, sat_block), col_map,
                        memory_space=pltpu.VMEM)],
        out_specs=_out_specs(time_block, sat_block, want_vel),
    )
    with no_barriers():
        outs = pl.pallas_call(
            functools.partial(_kernel_fused, grav, kepler_iters,
                              want_vel),
            out_shape=_out_shapes(n_times, n_sats, want_vel),
            grid_spec=grid_spec,
            interpret=interpret,
        )(th, tl, fields, simp, err0)
    return _assemble(outs, n_times, n_sats, want_vel)


# ---------------------------------------------------------------------------
# Separable-time variant: tsince = t_time[t] - t_sat[s], split in-kernel
# ---------------------------------------------------------------------------

from .fastmath import df_add


def _kernel_fused_sep(grav, kepler_iters, want_vel, ah_ref, al_ref,
                      fields_ref, simp_ref, err0_ref, *out_refs):
    sf = {name: fields_ref[i, :] for i, name in
          enumerate(SPINE_FIELD_NAMES)}
    off = len(SPINE_FIELD_NAMES)
    f = {name: fields_ref[off + i, :] for i, name in
         enumerate(_FIELD_NAMES)}
    nf = off + len(_FIELD_NAMES)
    bh = fields_ref[nf, :]      # per-sat epoch minutes (hi, lo)
    bl = fields_ref[nf + 1, :]
    f["not_simp"] = simp_ref[0, :] == 0
    f["error0"] = err0_ref[0, :]
    # tsince = t_time - t_sat in double-f32, built in VMEM from the
    # (time_block, 1) and (sat_block,) factors — no (T, S) f64 grid
    # ever exists in HBM
    th, tl = df_add(ah_ref[:], al_ref[:], -bh, -bl)
    spine = spine_df32(th, tl, **sf)
    _store(out_refs, shallow_tail_f32(
        grav, kepler_iters, *spine, want_vel=want_vel, **f))


@functools.partial(jax.jit, static_argnames=("grav", "kepler_iters",
                                             "time_block", "sat_block",
                                             "interpret", "planes",
                                             "want_vel"))
def propagate_fast_pallas_sep(els: Sgp4Elements, t_time, t_sat,
                              grav: GravityModel, kepler_iters: int = 5,
                              time_block: int = TIME_BLOCK,
                              sat_block: int = SAT_BLOCK,
                              interpret: bool = False,
                              planes: bool = False,
                              want_vel: bool = True
                              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused Pallas propagate with a separable time grid:
    ``tsince[t, s] = t_time[t] - t_sat[s]`` (minutes). Used by the
    catalog layer where ``t_time = (jd + fr) * 1440`` and ``t_sat =
    epoch_jd * 1440`` — the per-lane epoch subtraction happens in
    double-f32 inside the kernel, so the XLA prologue is O(T + S).

    With ``planes=True``, returns the raw GROUPED kernel buffers
    ``[r3 (3, T, S) f32[, v3 (3, T, S) f32], err (T, S) i32]``, all
    EXACT shapes (boundary-block stores are masked, so no pad trim
    exists) — the kernel writes the stacked component layout directly,
    so a planes-layout consumer pays zero post-kernel copies. Callers
    that substitute deep-space results must do it on these grouped
    buffers: a minor-dim-3 ``(..., 3)`` intermediate would force XLA to
    materialize that layout and pay full relayout copies on every later
    op (measured ~6 ms per 233 MB plane set)."""
    t_time = jnp.asarray(t_time)
    t_sat = jnp.asarray(t_sat)
    n_times = t_time.shape[0]
    n_sats = els.no_kozai.shape[0]
    # rebase to the first epoch so the split pairs carry tsince-scale
    # magnitudes (~1e3 min), not JD-scale (~3.5e9 min where a double-f32
    # pair only resolves ~1e-5 min)
    ref = jnp.min(t_sat)
    ah, al = split_f64((t_time - ref).reshape(-1, 1))
    bh, bl = split_f64(t_sat - ref)

    fdict = dict(spine_df32_fields(els))
    fdict.update(_shallow_f32_fields(els))
    fields = jnp.stack([fdict[n] for n in _ALL_FIELDS] + [bh, bl])
    simp = (~fdict["not_simp"]).astype(jnp.int32)[None, :]
    err0 = fdict["error0"].astype(jnp.int32)[None, :]

    tp = (-n_times) % time_block
    sp = (-n_sats) % sat_block
    if tp:
        ah = jnp.pad(ah, ((0, tp), (0, 0)))
        al = jnp.pad(al, ((0, tp), (0, 0)))
    if sp:
        fields = jnp.pad(fields, ((0, 0), (0, sp)), constant_values=0.5)
        simp = jnp.pad(simp, ((0, 0), (0, sp)), constant_values=1)
        err0 = jnp.pad(err0, ((0, 0), (0, sp)))
    tt, ss = n_times + tp, n_sats + sp

    def col_map(i, j):
        return (i - i, j)

    def time_map(i, j):
        return (i, j - j)

    grid_spec = pl.GridSpec(
        grid=(tt // time_block, ss // sat_block),
        in_specs=[pl.BlockSpec((time_block, 1), time_map,
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((len(_ALL_FIELDS) + 2, sat_block), col_map,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, sat_block), col_map,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, sat_block), col_map,
                        memory_space=pltpu.VMEM)],
        out_specs=_out_specs(time_block, sat_block, want_vel),
    )
    with no_barriers():
        outs = pl.pallas_call(
            functools.partial(_kernel_fused_sep, grav, kepler_iters,
                              want_vel),
            out_shape=_out_shapes(n_times, n_sats, want_vel),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ah, al, fields, simp, err0)

    if planes:
        return outs
    return _assemble(outs, n_times, n_sats, want_vel)


# ---------------------------------------------------------------------------
# Deep-space kernel: the statically-partitioned deep subset's f32 tail
# (drag -> dpper -> per-point inclination coeffs -> Kepler -> TEME) as a
# fused VMEM-resident kernel. The f64 deep spine (secular angles + the
# table-form resonance integration) stays in XLA — it is O(grid) cheap
# f64 work + O(n_sats * steps) table building (fast.py:deep_spine_f64).
# ---------------------------------------------------------------------------

from .fast import DEEP_FIELD_NAMES, deep_f32_fields, deep_spine_f64, \
    deep_tail_f32

#: deep subsets are small (~5% of a real catalog), so tile narrower to
#: bound pad waste; lanes must stay a multiple of 128
DEEP_SAT_BLOCK = 256


def _kernel_deep(grav, kepler_iters, want_vel, t_ref, ub_ref, mm_ref,
                 ar_ref, no_ref, nm_ref, fields_ref, err0_ref, *out_refs):
    f = {name: fields_ref[i, :] for i, name in enumerate(DEEP_FIELD_NAMES)}
    f["error0"] = err0_ref[0, :]
    _store(out_refs, deep_tail_f32(
        grav, kepler_iters, t_ref[:], ub_ref[:], mm_ref[:], ar_ref[:],
        no_ref[:], nm_ref[:], want_vel=want_vel, **f))


@functools.partial(jax.jit, static_argnames=("grav", "kepler_iters",
                                             "resonance_steps",
                                             "time_block", "sat_block",
                                             "interpret", "planes",
                                             "want_vel",
                                             "resonance_window"))
def propagate_deep_pallas(els: Sgp4Elements, deep, tsince,
                          grav: GravityModel, kepler_iters: int = 8,
                          resonance_steps: Optional[int] = None,
                          time_block: int = TIME_BLOCK,
                          sat_block: int = DEEP_SAT_BLOCK,
                          interpret: bool = False, planes: bool = False,
                          want_vel: bool = True,
                          resonance_window: Optional[int] = None,
                          tables=None
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deep-subset dense-grid propagate through the Pallas engine.

    Every satellite must be deep-space (the catalog layer's static
    partition guarantees this). ``tsince``: (n_times, 1) or
    (n_times, n_sats) f64 minutes. Returns (r, v, error) like the XLA
    deep path (``propagate_fast`` with all-deep elements); with
    ``planes=True`` returns the raw exact-shape grouped buffers
    ``[r3, v3, err]`` for the plane-substitution merge (see
    propagate_fast_pallas_sep).
    """
    t = jnp.asarray(tsince)
    n_sats = els.no_kozai.shape[0]
    n_times = t.shape[0]

    # f64 deep spine in XLA (fused), producing six f32 (T, S) grids
    grids = [jnp.broadcast_to(g, (n_times, n_sats))
             for g in deep_spine_f64(els, deep, t, resonance_steps,
                                     resonance_window, tables)]

    fdict = deep_f32_fields(els, deep)
    fields = jnp.stack([fdict[n] for n in DEEP_FIELD_NAMES])
    err0 = fdict["error0"].astype(jnp.int32)[None, :]

    tp = (-n_times) % time_block
    sp = (-n_sats) % sat_block
    if tp or sp:
        grids = [jnp.pad(g, ((0, tp), (0, sp))) for g in grids]
        # benign pad: zero coeffs, nm pad lanes already 0 in the grid
        # would flag error 2 — error planes are trimmed anyway
        fields = jnp.pad(fields, ((0, 0), (0, sp)))
        err0 = jnp.pad(err0, ((0, 0), (0, sp)))
    tt, ss = n_times + tp, n_sats + sp

    def col_map(i, j):
        return (i - i, j)

    grid_spec = pl.GridSpec(
        grid=(tt // time_block, ss // sat_block),
        in_specs=[pl.BlockSpec((time_block, sat_block),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((len(DEEP_FIELD_NAMES), sat_block), col_map,
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, sat_block), col_map,
                        memory_space=pltpu.VMEM)],
        out_specs=_out_specs(time_block, sat_block, want_vel),
    )
    with no_barriers():  # _nofold in the shared Kepler tail (see above)
        outs = pl.pallas_call(
            functools.partial(_kernel_deep, grav, kepler_iters, want_vel),
            out_shape=_out_shapes(n_times, n_sats, want_vel),
            grid_spec=grid_spec,
            interpret=interpret,
        )(*grids, fields, err0)

    if planes:
        return outs
    return _assemble(outs, n_times, n_sats, want_vel)


# ---------------------------------------------------------------------------
# Fused deep merge: the mixed-catalog substitution WITHOUT an XLA scatter.
#
# The partitioned fast path (propagation._propagate_fast_partitioned)
# must replace the deep-space columns of the shallow kernel's output
# with the deep kernel's results. An XLA scatter over ~5% of 13k
# columns costs 3-5 ms per sweep on v5e regardless of formulation
# (static/dynamic indices, select-gather, donated split — all A/B'd
# in-program); scattered 4-byte column writes are simply hostile to the
# memory system, in any axis orientation.
#
# This path removes the scatter entirely (reference analogue: the
# origIndices scatter maps the reference bakes into its batch packing,
# Constellation.zig:129-184 — here the "scatter map" becomes a one-hot
# operand baked at catalog build time):
#
#   1. The deep subset is PERMUTED (at catalog staging, statically)
#      into block-compacted order: one K-wide group of lanes per
#      sat-block of the shallow kernel, K = max deep count per block
#      rounded up to the MXU contraction quantum (128). The deep kernel
#      writes its planes directly in this (n_blocks, C, T, K) layout —
#      no reshuffle ever happens on the big buffers.
#   2. The shallow kernel's epilogue substitutes the deep results
#      before its own store: dexp = (K, sat_block) one-hot matmul on
#      the MXU, merged = vals * keep + dexp. The one-hot has exactly
#      one 1 per deep column, so the matmul IS a scatter — running on
#      the matrix unit at ~0.1 ms instead of 3-5 ms.
#
# Exactness: f32 deep values are split into THREE bf16 terms
# (hi/mid/lo — 8+8+8 >= 24 significand bits) and pushed through three
# one-hot matmuls accumulated in f32; with a single nonzero per output
# column there is no summation, so the f32 value reconstructs exactly
# (at most 1 ulp from the two final adds — sub-mm at GEO radius).
# Error codes are small ints (exact in bf16's hi term alone).
# ---------------------------------------------------------------------------


def build_merge_staging(deep_idx, n_sats: int, sat_block: int = SAT_BLOCK,
                        k_quantum: int = 128, group_blocks=None):
    """Static compaction maps for the fused deep merge.

    Pure numpy (runs once per catalog). Deep satellites are compacted
    into one K-wide lane group per ``group_blocks`` consecutive
    sat-blocks: K must be a multiple of the 128-lane quantum, so
    grouping several sat-blocks per deep group amortizes that quantum —
    e.g. ~48 deep sats per 1024-block wastes 80/128 lanes ungrouped but
    only ~16/128 when g=2 groups hold ~96 (the deep kernel and its
    f64 spine pay per LANE, so the group width directly scales the
    deep-side cost). ``group_blocks=None`` picks the g in {1,2,4,8,16}
    minimizing total width (tie: smaller K).

    Returns ``(perm, onehot, keep, K, group_blocks)``:

    * ``perm (n_groups * K,) i32`` — deep-subset row index feeding lane
      ``(group, k)`` of the group-compacted deep kernel; pad lanes
      clamp to row 0 (their one-hot columns are all-zero, so their
      values never reach the output — clamping just keeps the pad math
      finite).
    * ``onehot (n_blocks, K, sat_block) f32`` — ``onehot[j, k, l] = 1``
      iff member ``k`` of block ``j``'s GROUP (group ``j // g``) sits
      at in-block column ``l`` of block ``j`` (members living in the
      group's other blocks have all-zero rows here; cast to bf16 at
      staging — 0/1 are exact).
    * ``keep (n_blocks, 1, sat_block) f32`` — 0 on deep columns, 1
      elsewhere (pad columns of the last partial block count as kept).
    * ``K`` — static group width, a multiple of ``k_quantum``.
    """
    import numpy as np

    n_blocks = -(-n_sats // sat_block)
    idx = np.asarray(deep_idx, np.int64)

    def plan(g):
        n_groups = -(-n_blocks // g)
        counts = np.bincount(idx // (sat_block * g), minlength=n_groups)
        kmax = int(counts.max()) if idx.size else 1
        K = k_quantum * max(1, -(-kmax // k_quantum))
        return n_groups * K, K, g

    if group_blocks is None:
        cands = [plan(g) for g in (1, 2, 4, 8, 16)
                 if g == 1 or g < 2 * n_blocks]
        # prefer K <= 256: the merge matmul cost scales with K, and the
        # catalog layer falls back to the scatter path past 256
        _, _, group_blocks = min([c for c in cands if c[1] <= 256]
                                 or cands)
    g = group_blocks
    n_groups = -(-n_blocks // g)
    _, K, _ = plan(g)
    perm = np.zeros((n_groups, K), np.int32)
    onehot = np.zeros((n_blocks, K, sat_block), np.float32)
    keep = np.ones((n_blocks, 1, sat_block), np.float32)
    fill = np.zeros(n_groups, np.int64)
    for slot, col in enumerate(idx):
        j = int(col) // sat_block
        grp = j // g
        k = int(fill[grp])
        fill[grp] += 1
        perm[grp, k] = slot
        onehot[j, k, int(col) % sat_block] = 1.0
        keep[j, 0, int(col) % sat_block] = 0.0
    return perm.reshape(-1), onehot, keep, K, g


def merge_packed_positions(deep_idx, sat_block: int, K: int,
                           group_blocks: int):
    """Packed-lane position of each deep-subset row under
    :func:`build_merge_staging`'s fill order — ``pos[slot]`` is the
    flat lane index (into the ``n_groups * K``-wide compacted order)
    where deep row ``slot`` lives. Replays the same group-major fill
    loop (pad lanes clamp to row 0, so inverting ``perm`` directly
    would mistake a pad lane in an earlier group for row 0's real
    position). Pure numpy, once per catalog."""
    import numpy as np

    idx = np.asarray(deep_idx, np.int64)
    pos = np.zeros(idx.size, np.int64)
    fill: dict = {}
    for slot, col in enumerate(idx):
        grp = int(col) // (sat_block * group_blocks)
        k = fill.get(grp, 0)
        fill[grp] = k + 1
        pos[slot] = grp * K + k
    return pos


def _merge_vals(vals, dr, dv, de, onehot, keep):
    """Substitute deep-column results into a shallow tail's outputs.

    ``dr``/``dv`` (3, tb, K) f32, ``de`` (tb, K) f32, ``onehot``
    (K, sb) bf16, ``keep`` (sb,) f32. The one-hot matmul IS the
    scatter: each deep column receives exactly one product per term
    (no summation), and the THREE-term bf16 split (hi + mid + lo
    captures 8+8+8 >= 24 significand bits) reconstructs the f32 value
    exactly (the final two f32 adds can round at most 1 ulp); error
    codes are small ints — bf16-exact in the hi term alone."""
    tb, K = de.shape
    planes = [dr.reshape(3 * tb, K)]
    if dv is not None:
        planes.append(dv.reshape(3 * tb, K))
    planes.append(de.reshape(tb, K))
    d = jnp.concatenate(planes, axis=0)
    hi = d.astype(jnp.bfloat16)
    r1 = d - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    dexp = (jnp.dot(hi, onehot, preferred_element_type=jnp.float32)
            + jnp.dot(mid, onehot, preferred_element_type=jnp.float32)
            + jnp.dot(lo, onehot, preferred_element_type=jnp.float32))
    nrv = dexp.shape[0] - tb
    rv = dexp[:nrv].reshape(nrv // tb, tb, onehot.shape[1])
    eexp = dexp[nrv:]
    # select, not multiply-add: the shallow tail's values on DEEP
    # columns are discarded unread (the scatter path likewise replaced
    # them), so a non-finite shallow value there can't leak through a
    # 0-weight product (inf * 0 = nan)
    deep_col = keep == 0.0
    out = [jnp.where(deep_col, rv[p], vals[p]) for p in range(nrv // tb)]
    err = jnp.where(deep_col, eexp.astype(jnp.int32), vals[-1])
    return tuple(out) + (err,)


def _kernel_fused_sep_merge(grav, kepler_iters, want_vel, ah_ref, al_ref,
                            fields_ref, simp_ref, err0_ref, *rest):
    if want_vel:
        dr_ref, dv_ref, de_ref, oh_ref, keep_ref, *out_refs = rest
    else:
        dr_ref, de_ref, oh_ref, keep_ref, *out_refs = rest
        dv_ref = None
    sf = {name: fields_ref[i, :] for i, name in
          enumerate(SPINE_FIELD_NAMES)}
    off = len(SPINE_FIELD_NAMES)
    f = {name: fields_ref[off + i, :] for i, name in
         enumerate(_FIELD_NAMES)}
    nf = off + len(_FIELD_NAMES)
    bh = fields_ref[nf, :]
    bl = fields_ref[nf + 1, :]
    f["not_simp"] = simp_ref[0, :] == 0
    f["error0"] = err0_ref[0, :]
    th, tl = df_add(ah_ref[:], al_ref[:], -bh, -bl)
    spine = spine_df32(th, tl, **sf)
    vals = shallow_tail_f32(grav, kepler_iters, *spine,
                            want_vel=want_vel, **f)
    merged = _merge_vals(vals, dr_ref[:],
                         dv_ref[:] if want_vel else None, de_ref[:],
                         oh_ref[0], keep_ref[0, 0])
    _store(out_refs, merged)


@functools.partial(jax.jit, static_argnames=("grav", "kepler_iters",
                                             "time_block", "sat_block",
                                             "interpret", "planes",
                                             "want_vel", "group_blocks"))
def propagate_fast_pallas_sep_merge(els: Sgp4Elements, t_time, t_sat,
                                    grav: GravityModel, dr, dv, de,
                                    onehot, keep, kepler_iters: int = 5,
                                    time_block: int = TIME_BLOCK,
                                    sat_block: int = SAT_BLOCK,
                                    interpret: bool = False,
                                    planes: bool = False,
                                    want_vel: bool = True,
                                    group_blocks: int = 1):
    """The separable-time shallow kernel with the deep-column merge
    fused into its epilogue (see the module-section comment above).

    ``dr``/``dv`` are the deep kernel's grouped planes ``(3, T,
    n_groups * K)`` over the group-compacted (``merge_perm``-ordered)
    deep subset — the group covering sat-blocks ``[G*g, (G+1)*g)``
    occupies the contiguous K-wide column range ``[G*K, (G+1)*K)``, so
    the per-block deep operand is a plain contiguous block read
    (index map ``j // g``), never a gather; ``de`` is the matching err
    plane (any numeric dtype; converted to f32 — codes are small ints,
    exact). ``onehot`` (n_blocks, K, sat_block) bf16 and ``keep``
    (n_blocks, 1, sat_block) f32 come from :func:`build_merge_staging`
    (whose ``group_blocks`` must match). The grid iterates sat-blocks
    in the OUTER dimension so the per-block one-hot operand loads once
    per block, not once per grid step."""
    t_time = jnp.asarray(t_time)
    t_sat = jnp.asarray(t_sat)
    n_times = t_time.shape[0]
    n_sats = els.no_kozai.shape[0]
    de = jnp.asarray(de).astype(jnp.float32)
    ref = jnp.min(t_sat)
    ah, al = split_f64((t_time - ref).reshape(-1, 1))
    bh, bl = split_f64(t_sat - ref)

    fdict = dict(spine_df32_fields(els))
    fdict.update(_shallow_f32_fields(els))
    fields = jnp.stack([fdict[n] for n in _ALL_FIELDS] + [bh, bl])
    simp = (~fdict["not_simp"]).astype(jnp.int32)[None, :]
    err0 = fdict["error0"].astype(jnp.int32)[None, :]

    tp = (-n_times) % time_block
    sp = (-n_sats) % sat_block
    if tp:
        ah = jnp.pad(ah, ((0, tp), (0, 0)))
        al = jnp.pad(al, ((0, tp), (0, 0)))
    if sp:
        fields = jnp.pad(fields, ((0, 0), (0, sp)), constant_values=0.5)
        simp = jnp.pad(simp, ((0, 0), (0, sp)), constant_values=1)
        err0 = jnp.pad(err0, ((0, 0), (0, sp)))
    tt, ss = n_times + tp, n_sats + sp
    n_blocks = ss // sat_block
    if onehot.shape[0] != n_blocks:
        raise ValueError("merge staging block count mismatch")
    g = group_blocks
    n_groups = -(-n_blocks // g)
    if dr.shape[-1] % n_groups:
        raise ValueError("deep planes width must be n_groups * K")
    k_width = dr.shape[-1] // n_groups
    if onehot.shape[1] != k_width:
        raise ValueError("one-hot K does not match deep planes width")
    onehot = onehot.astype(jnp.bfloat16)
    if tp:
        # the deep planes carry exact T; pad so boundary time blocks
        # read defined rows (their stores are masked anyway)
        dr = jnp.pad(dr, ((0, 0), (0, tp), (0, 0)))
        de = jnp.pad(de, ((0, tp), (0, 0)))
        if dv is not None:
            dv = jnp.pad(dv, ((0, 0), (0, tp), (0, 0)))

    def col_map(j, i):
        return (i - i, j)

    def time_map(j, i):
        return (i, j - j)

    def blk_map3(j, i):
        return (j, i - i, i - i)

    # deep operands index by GROUP: sat-block j reads group j // g.
    # NEVER use `j // g` here: under x64, jnp floor_divide promotes
    # through an i64 literal/convert that infinitely recurses the
    # Mosaic convert_element_type lowering (this crashed the round-3
    # headline bench). lax.div on i32 (both operands nonnegative, so
    # truncating == floor) bypasses the promotion machinery entirely;
    # the divisor must be a NUMPY scalar (a jnp scalar would be a
    # captured tracer, which index maps reject).
    gg = np.int32(g)

    def group_div(j):
        return lax.div(j, gg)

    deep_rv_spec = pl.BlockSpec((3, time_block, k_width),
                                lambda j, i: (i - i, i, group_div(j)),
                                memory_space=pltpu.VMEM)
    deep_e_spec = pl.BlockSpec((time_block, k_width),
                               lambda j, i: (i, group_div(j)),
                               memory_space=pltpu.VMEM)
    rv_out = pl.BlockSpec((3, time_block, sat_block),
                          lambda j, i: (i - i, i, j),
                          memory_space=pltpu.VMEM)
    e_out = pl.BlockSpec((time_block, sat_block), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec((time_block, 1), time_map,
                              memory_space=pltpu.VMEM)] * 2
                + [pl.BlockSpec((len(_ALL_FIELDS) + 2, sat_block),
                                col_map, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, sat_block), col_map,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, sat_block), col_map,
                                memory_space=pltpu.VMEM),
                   deep_rv_spec]
                + ([deep_rv_spec] if want_vel else [])
                + [deep_e_spec,
                   pl.BlockSpec((1, k_width, sat_block), blk_map3,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, sat_block), blk_map3,
                                memory_space=pltpu.VMEM)])
    grid_spec = pl.GridSpec(
        grid=(ss // sat_block, tt // time_block),
        in_specs=in_specs,
        out_specs=[rv_out, rv_out, e_out] if want_vel else [rv_out, e_out],
    )
    args = ([ah, al, fields, simp, err0, dr]
            + ([dv] if want_vel else []) + [de, onehot, keep])
    with no_barriers():
        outs = pl.pallas_call(
            functools.partial(_kernel_fused_sep_merge, grav,
                              kepler_iters, want_vel),
            out_shape=_out_shapes(n_times, n_sats, want_vel),
            grid_spec=grid_spec,
            interpret=interpret,
        )(*args)
    if planes:
        return outs
    return _assemble(outs, n_times, n_sats, want_vel)
