"""Conjunction screening: fused single-target and all-vs-all passes.

Rebuild of the reference's two screening paths:

* **single-target** ``screenConstellation`` (Constellation.zig:683-756):
  propagate everything + track min distance to one target, fused. Here
  it is a pure reduction over the dense (n_times, n_sats) grid.
* **all-vs-all** ``coarse_screen`` (conjunction.zig:11-138): the
  reference builds a spatial-hash cell list per time step on the CPU —
  a pointer-chasing structure that maps terribly to TPU. The TPU-native
  design instead runs **two dense stages**:

  1. *Coarse*: blocked pairwise min-distance over all times using the
     Gram expansion |ri-rj|^2 = |ri|^2 + |rj|^2 - 2 ri.rj — the cross
     term is an (N x 3) @ (3 x B) matmul per time step, which puts the
     O(N^2 T) work on the MXU instead of the VPU. f32 cancellation
     makes distances near threshold uncertain by a few km, so the
     threshold is widened by a guard band derived from the worst-case
     rounding of the Gram terms (~eps * max|r|^2).
  2. *Refine*: the surviving candidate pairs (a tiny set) get exact
     f32 direct-difference distances over all times.

  This mirrors the reference's coarse-hash + exact-check structure
  (conjunction.zig:100-122) with TPU-shaped dense math in both stages.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .constants import MINUTES_PER_DAY
from .propagation import SatCatalog, build_catalog, propagate
from .tle import Tle

#: coarse-stage padding coordinate — far from everything
_PAD_POS = 1.0e7


def _positions_planes_f32(cat: SatCatalog, jd, fr=None,
                          method: str = "fast",
                          park_offset: float = 0.0):
    """(3, n_times, n_sats) TEME position planes as f32 — the kernels'
    native layout, no minor-dim-3 relayout (for the Pallas screen)."""
    r, _, err = propagate(cat, jd, fr, velocities=False, method=method,
                          layout="planes")
    r = jnp.asarray(r, jnp.float32)
    bad = (err != 0)[None, ...]
    park = (_PAD_POS + park_offset
            + 1.0e6 * jnp.arange(r.shape[2],
                                 dtype=jnp.float32))[None, None, :]
    return jnp.where(bad, park, r)


def _positions_f32(cat: SatCatalog, jd, fr=None, method: str = "fast",
                   park_offset: float = 0.0):
    """(n_times, n_sats, 3) TEME positions as f32, plus error mask."""
    r, _, err = propagate(cat, jd, fr, velocities=False, method=method)
    r = jnp.asarray(r, jnp.float32)
    bad = (err != 0)[..., None]
    # failed lanes park far away at per-satellite DISTINCT points —
    # a shared pad position would make two failed satellites screen as
    # a zero-distance conjunction with each other.
    # 1e6 km spacing: farther apart than any plausible threshold.
    # park_offset keeps park points from DIFFERENT catalogs distinct
    # too (screen_target screens one catalog against another).
    park = (_PAD_POS + park_offset
            + 1.0e6 * jnp.arange(r.shape[1],
                                 dtype=jnp.float32)[None, :, None])
    r = jnp.where(bad, park, r)
    return r


# ---------------------------------------------------------------------------
# Single-target screening
# ---------------------------------------------------------------------------


def screen_target(cat: SatCatalog, target: Union[str, Tle, SatCatalog],
                  jd, fr=None, *, threshold_km: Optional[float] = None,
                  method: str = "fast"):
    """Minimum distance of every catalog satellite to one target.

    Reference: the fused propagate+min-distance screen
    (Constellation.zig:683-756, python surface sgp4.zig:352-440).

    Returns ``(min_dist_km, t_index)`` arrays of shape (n_sats,), plus
    a boolean mask when ``threshold_km`` is given.
    """
    if isinstance(target, SatCatalog):
        tcat = target
    elif isinstance(target, Tle):
        tcat = build_catalog([target], grav=cat.grav)
    else:
        tcat = build_catalog(target, grav=cat.grav)
    if len(tcat) != 1:
        # a multi-TLE target would either shape-error or, when its
        # size happens to match the catalog, broadcast ELEMENTWISE
        # (sat i vs target i) and return plausible-looking nonsense
        raise ValueError(
            f"screen_target expects exactly one target satellite, got "
            f"{len(tcat)}; use screen_all for set-vs-set screening")

    r_all = _positions_f32(cat, jd, fr, method)        # (T, N, 3)
    # offset the target's park points so a failed target and a failed
    # catalog satellite never coincide (both would otherwise park at
    # exactly _PAD_POS and screen as a 0-km conjunction)
    r_tgt = _positions_f32(tcat, jd, fr, method,
                           park_offset=-5.0e5)         # (T, 1, 3)
    d = jnp.linalg.norm(r_all - r_tgt, axis=-1)        # (T, N)
    min_d = d.min(axis=0)
    t_idx = d.argmin(axis=0)
    if threshold_km is not None:
        return min_d, t_idx, min_d < threshold_km
    return min_d, t_idx


# ---------------------------------------------------------------------------
# All-vs-all screening
# ---------------------------------------------------------------------------


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _sharded_coarse_fn(mesh1, block: int):
    """Cached jitted shard_map for the sharded coarse pass — a fresh
    closure per block would retrace/recompile every call."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(r_loc, rsq_loc, j0):
        dmin = _coarse_block_min(r_loc, rsq_loc, j0, block)
        return jax.lax.pmin(dmin, "scr")

    mapped = shard_map(fn, mesh=mesh1,
                       in_specs=(P("scr"), P("scr"), P()),
                       out_specs=P(None, None), check_vma=False)
    return jax.jit(mapped)


@_functools.lru_cache(maxsize=8)
def _park_and_pad_fn(mesh1):
    """Cached jitted park+pad+rsq for the ring screen — a fresh closure
    per call would recompile the SPMD program every invocation."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh1, P(None, "sats", None))

    @partial(jax.jit, static_argnames=("pad",),
             out_shardings=(sharding,
                            NamedSharding(mesh1, P(None, "sats"))))
    def park_and_pad(r, err, pad: int):
        r = jnp.asarray(r, jnp.float32)
        bad = (err != 0)[..., None]
        park = (_PAD_POS + 1.0e6 * jnp.arange(
            r.shape[1] + pad, dtype=jnp.float32))[None, :, None]
        r = jnp.where(bad, park[:, :r.shape[1]], r)
        if pad:
            r = jnp.concatenate(
                [r, jnp.broadcast_to(park[:, r.shape[1]:],
                                     (r.shape[0], pad, 3))], axis=1)
        return r, jnp.sum(r * r, axis=-1)

    return park_and_pad


def _stage_coarse_sharded(r, rsq, mesh):
    """Time-pad to a device multiple and place (r, rsq) with the
    screen's time sharding ONCE — the block loop reuses the placed
    tensors (re-padding + re-device_putting the full (T, N, 3)
    position tensor per block measured as the dominant cost of large
    sharded screens)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = mesh.devices.reshape(-1)
    mesh1 = Mesh(devs, ("scr",))
    n_dev = len(devs)
    tpad = (-r.shape[0]) % n_dev
    if tpad:
        # pad the TIME axis by repeating the last real step — a shared
        # far-away pad point would zero every pairwise distance there
        r = jnp.concatenate(
            [r, jnp.broadcast_to(r[-1:], (tpad,) + r.shape[1:])])
        rsq = jnp.concatenate(
            [rsq, jnp.broadcast_to(rsq[-1:], (tpad,) + rsq.shape[1:])])
    # place explicitly: inputs may arrive committed to one device (the
    # catalog init pins arrays to the host CPU), which conflicts with a
    # multi-device shard_map jit
    r = jax.device_put(r, NamedSharding(mesh1, P("scr")))
    rsq = jax.device_put(rsq, NamedSharding(mesh1, P("scr")))
    return r, rsq, mesh1


def _coarse_block_min_sharded(r, rsq, j0, block: int, mesh1):
    """Multi-chip coarse pass over PRE-STAGED (r, rsq) (see
    :func:`_stage_coarse_sharded`): each device reduces
    min-over-its-times, then one ``lax.pmin`` collective merges shards
    — the only communication in the whole screen (SURVEY §2.6)."""
    fn = _sharded_coarse_fn(mesh1, block)
    return fn(r, rsq, jnp.asarray(j0, jnp.int32))


@partial(jax.jit, static_argnames=("block",))
def _coarse_block_min(r, rsq, j0, block: int):
    """Min-over-time Gram-expansion distances of all sats vs one J block.

    r: (T, N, 3) f32; rsq: (T, N) precomputed squared norms.
    Returns (N, block) minimum squared distances (biased by f32
    cancellation — callers add a guard band).
    """
    rj = jax.lax.dynamic_slice_in_dim(r, j0, block, axis=1)      # (T,B,3)
    rjsq = jax.lax.dynamic_slice_in_dim(rsq, j0, block, axis=1)  # (T,B)

    def step(dmin, inputs):
        rt, rsqt, rjt, rjsqt = inputs
        # K=3 contraction as explicit component products: a (N,3)@(3,B)
        # matmul would waste the 128x128 MXU (3/128 utilization); three
        # broadcast multiply-adds keep it on the VPU at full rate
        cross = (rt[:, 0:1] * rjt[None, :, 0]
                 + rt[:, 1:2] * rjt[None, :, 1]
                 + rt[:, 2:3] * rjt[None, :, 2])
        d2 = rsqt[:, None] + rjsqt[None, :] - 2.0 * cross
        return jnp.minimum(dmin, d2), None

    init = jnp.full((r.shape[1], block), jnp.inf, jnp.float32)
    dmin, _ = jax.lax.scan(step, init, (r, rsq, rj, rjsq))
    return dmin


@partial(jax.jit, static_argnames=("pad",))
def _refine_pairs(r, ii, jj, pad: int):
    """Exact min-over-time distances for candidate pairs (direct
    difference — no cancellation)."""
    ri = r[:, ii, :]                   # (T, P, 3)
    rj = r[:, jj, :]
    d = jnp.linalg.norm(ri - rj, axis=-1)   # (T, P)
    return d.min(axis=0), d.argmin(axis=0)


@partial(jax.jit, static_argnames=("pad",))
def _refine_pairs_planes(r_planes, ii, jj, pad: int):
    """Exact min-over-time distances for candidate pairs on (3, T, N)
    component planes (direct difference — no cancellation)."""
    ri = r_planes[:, :, ii]            # (3, T, P)
    rj = r_planes[:, :, jj]
    d = jnp.sqrt(((ri - rj) ** 2).sum(axis=0))   # (T, P)
    return d.min(axis=0), d.argmin(axis=0)


@partial(jax.jit, static_argnames=("cap",))
def _compact_mask(mask, cap: int):
    """Fixed-cap on-device index compaction of a boolean matrix:
    returns the (row, col) indices of up to ``cap`` True entries
    (fill -1). The host then receives O(candidates) index bytes instead
    of the O(N*B) boolean matrix (VERDICT r2 #4; reference result cap:
    conjunction.zig:133)."""
    ii, jj = jnp.nonzero(mask, size=cap, fill_value=-1)
    return ii.astype(jnp.int32), jj.astype(jnp.int32)


def _cap_bucket(count: int, floor: int = 1 << 10) -> int:
    """Round a candidate count up to a power of two so the static-cap
    compaction program compiles O(log) distinct shapes."""
    c = max(int(count), 1)
    return max(floor, 1 << (c - 1).bit_length())


def _screen_all_pallas(cat: SatCatalog, jd, fr, *, threshold_km: float,
                       method: str, max_pairs: int,
                       interpret: bool = False):
    """Single-chip Pallas coarse pass: the whole (N, N) min-distance
    matrix in one (or a few) fused kernel programs — see
    :mod:`astroz_tpu.ops.pallas_screen`. The direct-difference coarse
    distances are exact to f32 rounding, so no guard band is added and
    the refine pass only recovers argmin-t for the survivors."""
    from .ops.pallas_screen import coarse_min_all

    n = len(cat)
    r_pl = _positions_planes_f32(cat, jd, fr, method)    # (3, T, N)
    # tiny ULP cushion so a boundary pair never flips between the
    # kernel's d^2 compare and the refine's sqrt-then-compare
    thr2 = np.float32((threshold_km * (1.0 + 1.0e-6)) ** 2)

    cand_i, cand_j = [], []
    for j0, dmin in coarse_min_all(r_pl, interpret=interpret):
        w = dmin.shape[1]
        # strict upper triangle on device: drops self-pairs and the
        # sub-diagonal halves of diagonal tiles before the count fetch
        upper = (jnp.arange(dmin.shape[0], dtype=jnp.int32)[:, None]
                 < jnp.int32(j0)
                 + jnp.arange(w, dtype=jnp.int32)[None, :])
        mask = (dmin <= thr2) & upper
        count = int(mask.sum())
        if count == 0:
            continue
        cap = _cap_bucket(min(count, mask.size))
        ii, jj = (np.asarray(x) for x in _compact_mask(mask, cap))
        ii = ii[:count].astype(np.int64)
        jj = jj[:count].astype(np.int64) + j0
        cand_i.append(ii)
        cand_j.append(jj)
    ci = np.concatenate(cand_i) if cand_i else np.empty(0, np.int64)
    cj = np.concatenate(cand_j) if cand_j else np.empty(0, np.int64)
    keep = (ci < n) & (cj < n)   # padding lanes park far away anyway
    ci, cj = ci[keep], cj[keep]
    if ci.size > max_pairs:
        import warnings
        warnings.warn(
            f"screen_all: coarse candidate set ({ci.size}) exceeds "
            f"max_pairs ({max_pairs}); candidates are truncated BEFORE "
            "the exact refine, so real conjunctions may be dropped — "
            "raise max_pairs or lower threshold_km", stacklevel=3)
        ci, cj = ci[:max_pairs], cj[:max_pairs]
    if ci.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), np.empty(0, np.int64))

    n_times = r_pl.shape[1]
    chunk_cap = max(1 << 12, (1 << 26) // max(n_times, 1))
    dmin = np.empty(ci.size, np.float32)
    tmin = np.empty(ci.size, np.int64)
    for c0 in range(0, ci.size, chunk_cap):
        c1 = min(c0 + chunk_cap, ci.size)
        pad = 1 << max(6, math.ceil(math.log2(c1 - c0)))
        ii = np.zeros(pad, np.int64)
        jj = np.zeros(pad, np.int64)
        ii[:c1 - c0], jj[:c1 - c0] = ci[c0:c1], cj[c0:c1]
        d, t = _refine_pairs_planes(r_pl, jnp.asarray(ii),
                                    jnp.asarray(jj), pad)
        dmin[c0:c1] = np.asarray(d)[:c1 - c0]
        tmin[c0:c1] = np.asarray(t)[:c1 - c0]
    hit = dmin < threshold_km
    ci, cj = ci[hit], cj[hit]
    d_out = dmin[hit].astype(np.float64)
    t_out = tmin[hit]
    order = np.lexsort((cj, ci))
    return ci[order], cj[order], d_out[order], t_out[order]


def screen_all(cat: SatCatalog, jd, fr=None, *, threshold_km: float = 5.0,
               block: int = 2048, method: str = "fast",
               max_pairs: int = 10_000_000, mesh=None,
               engine: Optional[str] = None, _interpret: bool = False):
    """All-vs-all conjunction screen over the given epochs.

    Returns ``(i, j, min_dist_km, t_index)`` numpy arrays for every
    pair with minimum separation below ``threshold_km`` (i < j), capped
    at ``max_pairs`` (reference cap: conjunction.zig:133). Pass a
    ``jax.sharding.Mesh`` to distribute the coarse pass over all its
    devices (time-sharded, merged with one pmin collective).

    ``engine``: ``"pallas"`` (default on single-chip TPU) runs the
    coarse pass as one fused VMEM-resident kernel; ``"xla"`` (default
    elsewhere and whenever a multi-device mesh is given) runs the
    blocked Gram-expansion pass.
    """
    n = len(cat)
    multi = mesh is not None and mesh.devices.size > 1
    if engine is None:
        from .propagation import default_engine
        engine = "xla" if multi else default_engine()
    if engine == "pallas" and not multi:
        return _screen_all_pallas(cat, jd, fr, threshold_km=threshold_km,
                                  method=method, max_pairs=max_pairs,
                                  interpret=_interpret)
    r = _positions_f32(cat, jd, fr, method)
    n_pad = (-n) % block
    if n_pad:
        park = (_PAD_POS + 1.0e6 * (n + jnp.arange(n_pad, dtype=jnp.float32))
                )[None, :, None] + jnp.zeros((r.shape[0], n_pad, 3),
                                             jnp.float32)
        r = jnp.concatenate([r, park], axis=1)
    rsq = jnp.sum(r * r, axis=-1)

    # guard band: worst-case f32 cancellation of the Gram terms —
    # over REAL, NON-PARKED satellites only. Pad rows AND failed
    # satellites park at >= ~1e7 km; one decayed satellite in the
    # catalog would otherwise inflate the guard to ~1e8 km^2
    # (effective threshold ~10,000 km -> nearly all N^2/2 pairs become
    # candidates and real hits get truncated away at max_pairs)
    live = rsq[:, :n] < (0.5 * _PAD_POS) ** 2
    max_rsq = float(jnp.max(jnp.where(live, rsq[:, :n], 0.0)))
    guard = 8.0 * np.finfo(np.float32).eps * max_rsq  # km^2
    thr2 = threshold_km * threshold_km + guard

    cand_i, cand_j = [], []
    n_total = r.shape[1]
    # single-shot coarse for small catalogs (<= 4096 sats): one program
    # + one count fetch + one compaction instead of N/block dispatches
    # with a ~25 ms count round trip each through a remote-TPU tunnel.
    # Larger catalogs keep the blocked pass — the single-shot scan
    # carries an (N, N) f32 min matrix through every time step, which
    # past ~4k sats costs more in carry traffic than the round trips.
    single_shot = (mesh is None or mesh.devices.size == 1) \
        and n_total <= 4096
    if single_shot:
        block_iter = [(0, n_total)]
    else:
        block_iter = [(j0, block) for j0 in range(0, n_total, block)]
    if mesh is not None and mesh.devices.size > 1:
        r_s, rsq_s, mesh1 = _stage_coarse_sharded(r, rsq, mesh)
    for j0, blk in block_iter:
        if mesh is not None and mesh.devices.size > 1:
            dmin = _coarse_block_min_sharded(r_s, rsq_s, j0, blk, mesh1)
        else:
            dmin = _coarse_block_min(r, rsq, j0, blk)
        # candidate compaction ON DEVICE: count (one scalar fetch),
        # then a fixed-cap nonzero — the host receives O(candidates)
        # index bytes, never the (N, block) boolean matrix (~27 MB per
        # block at 13.5k sats, ~2.5 GB total at 50k debris scale)
        mask = dmin <= thr2
        count = int(mask.sum())
        if count == 0:
            continue
        cap = _cap_bucket(min(count, mask.size))
        ii, jj = (np.asarray(x) for x in _compact_mask(mask, cap))
        ii, jj = ii[:count], jj[:count]
        jj = jj.astype(np.int64) + j0
        ii = ii.astype(np.int64)
        keep = ii < jj  # dedup + self
        cand_i.append(ii[keep])
        cand_j.append(jj[keep])
    ci = np.concatenate(cand_i) if cand_i else np.empty(0, np.int64)
    cj = np.concatenate(cand_j) if cand_j else np.empty(0, np.int64)
    # drop pairs involving padding lanes
    keep = (ci < n) & (cj < n)
    ci, cj = ci[keep], cj[keep]
    if ci.size > max_pairs:
        import warnings
        warnings.warn(
            f"screen_all: coarse candidate set ({ci.size}) exceeds "
            f"max_pairs ({max_pairs}); candidates are truncated BEFORE "
            "the exact refine, so real conjunctions may be dropped — "
            "raise max_pairs or lower threshold_km", stacklevel=2)
        ci, cj = ci[:max_pairs], cj[:max_pairs]
    if ci.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), np.empty(0, np.int64))

    # refine: exact distances on the candidate set, chunked so the
    # (n_times, P, 3) gather stays bounded no matter how dense the
    # coarse candidate set is
    chunk_cap = max(1 << 12, (1 << 26) // max(r.shape[0], 1))
    dmin = np.empty(ci.size, np.float32)
    tmin = np.empty(ci.size, np.int64)
    for c0 in range(0, ci.size, chunk_cap):
        c1 = min(c0 + chunk_cap, ci.size)
        pad = 1 << max(6, math.ceil(math.log2(c1 - c0)))
        ii = np.zeros(pad, np.int64)
        jj = np.zeros(pad, np.int64)
        ii[:c1 - c0], jj[:c1 - c0] = ci[c0:c1], cj[c0:c1]
        d, t = _refine_pairs(r, jnp.asarray(ii), jnp.asarray(jj), pad)
        dmin[c0:c1] = np.asarray(d)[:c1 - c0]
        tmin[c0:c1] = np.asarray(t)[:c1 - c0]
    hit = dmin < threshold_km
    ci, cj = ci[hit], cj[hit]
    d_out = dmin[hit].astype(np.float64)
    t_out = tmin[hit]
    order = np.lexsort((cj, ci))  # deterministic (i, j) order
    return ci[order], cj[order], d_out[order], t_out[order]


# ---------------------------------------------------------------------------
# Ring-pass multi-chip all-vs-all screening
# ---------------------------------------------------------------------------


@_functools.lru_cache(maxsize=8)
def _ring_screen_fn(mesh1, B: int):
    """Cached jitted shard_map for the ring coarse pass.

    Each device owns one satellite block (T, B, 3). ``lax.ppermute``
    rotates the blocks around the ring; at step k device ``me`` holds
    the block originally owned by ``(me - k) % D`` and reduces a
    (B, B) min-over-time Gram-expansion distance tile against its own
    rows, thresholding on device. Per-device memory is O(T*B) for the
    positions and O(D*B^2) booleans for the hit mask — never the full
    (T, N, 3) tensor (SURVEY §5: the ring all-gather of position
    shards is the one communication-heavy kernel of the rebuild)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh1.devices.size
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def fn(r_loc, rsq_loc, thr2):
        def tile_min(rj, rjsq):
            def step(dmin, inputs):
                rt, rsqt, rjt, rjsqt = inputs
                # K=3 contraction as component products (see
                # _coarse_block_min: a (B,3)@(3,B) matmul would waste
                # the MXU at 3/128 utilization)
                cross = (rt[:, 0:1] * rjt[None, :, 0]
                         + rt[:, 1:2] * rjt[None, :, 1]
                         + rt[:, 2:3] * rjt[None, :, 2])
                d2 = rsqt[:, None] + rjsqt[None, :] - 2.0 * cross
                return jnp.minimum(dmin, d2), None

            init = jnp.full((B, B), jnp.inf, jnp.float32)
            dmin, _ = jax.lax.scan(step, init,
                                   (r_loc, rsq_loc, rj, rjsq))
            return dmin

        def body(state, _):
            rj, rjsq = state
            hits = tile_min(rj, rjsq) <= thr2
            rj = jax.lax.ppermute(rj, "sats", perm)
            rjsq = jax.lax.ppermute(rjsq, "sats", perm)
            return (rj, rjsq), hits

        _, hits = jax.lax.scan(body, (r_loc, rsq_loc), None,
                               length=n_dev)
        return hits[None]  # (1, D, B, B) -> global (D, D, B, B)

    mapped = shard_map(fn, mesh=mesh1,
                       in_specs=(P(None, "sats"), P(None, "sats"), P()),
                       out_specs=P("sats"), check_vma=False)
    return jax.jit(mapped)


@_functools.lru_cache(maxsize=8)
def _ring_counts_fn(mesh1):
    """Shard-local hit counts: (D, D, B, B) sharded bool -> (D,) int32
    without gathering the tensor."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(h):
        return h.sum(dtype=jnp.int32).reshape(1)

    mapped = shard_map(fn, mesh=mesh1, in_specs=(P("sats"),),
                       out_specs=P("sats"), check_vma=False)
    return jax.jit(mapped)


@_functools.lru_cache(maxsize=8)
def _ring_compact_fn(mesh1, cap: int):
    """Shard-local fixed-cap index compaction: each device flattens its
    own (1, D, B, B) hit block and emits up to ``cap`` flat indices
    (fill -1) -> global (D, cap)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(h):
        flat = h.reshape(-1)
        dt = jnp.int64 if flat.size >= 2 ** 31 else jnp.int32
        (idx,) = jnp.nonzero(flat, size=cap, fill_value=-1)
        return idx.astype(dt)[None]

    mapped = shard_map(fn, mesh=mesh1, in_specs=(P("sats"),),
                       out_specs=P("sats"), check_vma=False)
    return jax.jit(mapped)


def screen_all_ring(cat: SatCatalog, jd, fr=None, *,
                    threshold_km: float = 5.0, mesh, method: str = "fast",
                    max_pairs: int = 10_000_000):
    """All-vs-all conjunction screen sharded over the satellite axis.

    The multi-chip form of :func:`screen_all`: positions are computed
    shard-resident (each device propagates its own satellite block),
    the coarse pass rotates position blocks around the device ring with
    ``lax.ppermute`` keeping per-device memory O(N/D), and the refine
    runs on the gathered candidate subset only (O(candidates), not
    O(N)). Functionality matches the reference's single-node
    coarse_screen (conjunction.zig:11-138); the distribution strategy
    is SURVEY §2.6's stated TPU design.

    Returns ``(i, j, min_dist_km, t_index)`` like :func:`screen_all`.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from .parallel.mesh import make_mesh, propagate_sharded_fast

    devs = mesh.devices.reshape(-1)
    n_dev = len(devs)
    mesh1 = Mesh(devs, ("sats",))
    n = len(cat)

    # positions, computed sharded over the sat axis (zero collectives)
    prop_mesh = make_mesh(devs, time_parallel=1)
    if method == "fast":
        r, _, err = propagate_sharded_fast(cat, jd, fr, mesh=prop_mesh,
                                           output="teme")
    else:
        from .parallel.mesh import propagate_sharded
        r, _, err = propagate_sharded(cat, jd, fr, mesh=prop_mesh,
                                      output="teme")

    n_times = r.shape[0]
    block = -(-n // n_dev)  # ceil: satellites per device
    n_pad = block * n_dev - n
    r, rsq = _park_and_pad_fn(mesh1)(r, err, n_pad)

    # guard band over real, non-parked satellites only (see screen_all:
    # failed satellites park at >= ~1e7 km inside the first n columns)
    live = rsq[:, :n] < (0.5 * _PAD_POS) ** 2
    max_rsq = float(jnp.max(jnp.where(live, rsq[:, :n], 0.0)))
    guard = 8.0 * np.finfo(np.float32).eps * max_rsq
    thr2 = jnp.float32(threshold_km * threshold_km + guard)

    fn = _ring_screen_fn(mesh1, block)
    hits = fn(r, rsq, thr2)  # (D, D, B, B) bool, SHARDED over axis 0

    # candidate compaction ON DEVICE, shard-local: fetch per-device
    # counts (D ints), then one fixed-cap nonzero per shard — the host
    # receives O(candidates) index bytes, never the (D, D, B, B)
    # boolean tensor (~181 MB at 13.5k sats, ~2.5 GB at 50k)
    counts = np.asarray(_ring_counts_fn(mesh1)(hits))
    if counts.max() == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), np.empty(0, np.int64))
    cap = _cap_bucket(int(counts.max()))
    flat_idx = np.asarray(_ring_compact_fn(mesh1, cap)(hits))  # (D, cap)

    me_l, k_l, row_l, col_l = [], [], [], []
    for me in range(n_dev):
        c = int(counts[me])
        if not c:
            continue
        k, row, col = np.unravel_index(
            flat_idx[me, :c].astype(np.int64), (n_dev, block, block))
        me_l.append(np.full(c, me))
        k_l.append(k)
        row_l.append(row)
        col_l.append(col)
    me = np.concatenate(me_l)
    k = np.concatenate(k_l)
    row = np.concatenate(row_l)
    col = np.concatenate(col_l)
    ci = me * block + row
    cj = ((me - k) % n_dev) * block + col
    keep = (ci < cj) & (cj < n)
    ci, cj = ci[keep], cj[keep]
    if ci.size > max_pairs:
        import warnings
        warnings.warn(
            f"screen_all_ring: coarse candidate set ({ci.size}) exceeds "
            f"max_pairs ({max_pairs}); truncating BEFORE the exact "
            "refine — raise max_pairs or lower threshold_km",
            stacklevel=2)
        ci, cj = ci[:max_pairs], cj[:max_pairs]
    if ci.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), np.empty(0, np.int64))

    # refine on the candidate subset only, SHARDED: each round-robin
    # chunk gathers just ITS OWN unique candidate columns from the
    # shard-resident position array (cross-shard gather handled by
    # GSPMD) and lands only that slice on its device — per-device
    # transfer and memory stay O(the chunk's candidate share), never
    # O(all candidates) x n_devices (replicating the full column set
    # to every device multiplied host->device traffic by the device
    # count at 50k-sat scale). Chunks still fan out round-robin so a
    # dense burst refines concurrently across the mesh.
    devs = list(mesh.devices.reshape(-1))

    chunk_cap = max(1 << 12, (1 << 26) // max(n_times, 1))
    pending = []
    for c_idx, c0 in enumerate(range(0, ci.size, chunk_cap)):
        c1 = min(c0 + chunk_cap, ci.size)
        us_c, inv_c = np.unique(
            np.concatenate([ci[c0:c1], cj[c0:c1]]), return_inverse=True)
        nc = c1 - c0
        pad = 1 << max(6, math.ceil(math.log2(nc)))
        ii = np.zeros(pad, np.int64)
        jj = np.zeros(pad, np.int64)
        ii[:nc], jj[:nc] = inv_c[:nc], inv_c[nc:]
        dev = devs[c_idx % len(devs)]
        r_sub_c = jax.device_put(r[:, jnp.asarray(us_c), :], dev)
        d, t = _refine_pairs(r_sub_c,
                             jax.device_put(jnp.asarray(ii), dev),
                             jax.device_put(jnp.asarray(jj), dev), pad)
        pending.append((c0, c1, d, t))
    dmin = np.empty(ci.size, np.float32)
    tmin = np.empty(ci.size, np.int64)
    for c0, c1, d, t in pending:
        dmin[c0:c1] = np.asarray(d)[:c1 - c0]
        tmin[c0:c1] = np.asarray(t)[:c1 - c0]
    hit = dmin < threshold_km
    ci, cj = ci[hit].astype(np.int64), cj[hit].astype(np.int64)
    d_out = dmin[hit].astype(np.float64)
    t_out = tmin[hit]
    order = np.lexsort((cj, ci))  # deterministic (i, j) order
    return ci[order], cj[order], d_out[order], t_out[order]
