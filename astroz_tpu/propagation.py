"""High-level catalog propagation: the TPU-native ``Constellation`` core.

Rebuild of the reference's orchestration layer (``src/Constellation.zig``:
mixed-catalog classification at Constellation.zig:115-125, batch packing at
:129-184, threaded propagate at :245-385, output modes at :478-509) —
redesigned for XLA:

* There is **no batch packing, padding, or SGP4/SDP4 split**. A catalog is
  one SoA pytree; near-earth and deep-space satellites run through one
  branchless kernel (``ops.sdp4.sdp4_propagate``) where near-earth lanes
  see exactly-zero deep-space coefficients. The reference splits into
  separate 8-wide batches and even leaves the mixed Python path unwired
  (``__init__.py:513-531``); here mixed catalogs are the default.
* The dense ``(n_times, n_sats)`` grid is one fused XLA program — the
  analogue of the reference's timeMajor threading (Constellation.zig:
  337-358) is XLA's own tiling of the elementwise graph onto the VPU,
  and multi-chip scaling shards the sats axis over the ICI mesh
  (see :mod:`astroz_tpu.parallel`).
* Output frames (TEME / ECEF / geodetic) are fused into the same program
  instead of a separate rotate-in-output-loop pass
  (Constellation.zig:478-509).
* Failure policy matches the reference: per-lane int32 python-sgp4 error
  codes, failed lanes zero-filled (Constellation.zig:511-528).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from functools import cached_property
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .constants import WGS72, GravityModel, MINUTES_PER_DAY
from .frames import ecef_to_geodetic, teme_to_ecef
from .time import gstime
from .tle import Tle, TleArrays, iter_tles, parse_omm
from .ops.sgp4 import Sgp4Elements, sgp4_propagate
from .ops.sdp4 import (DeepElements, ResonanceCarry, fresh_carry,
                       sdp4_propagate)

#: Output frame names (reference: Constellation.zig OutputMode)
OUTPUT_MODES = ("teme", "ecef", "geodetic", "geodetic_deg")
#: Output layout names. ``time_major``/``sat_major`` mirror the
#: reference's write-time layout choice (Constellation.zig:46-51);
#: ``planes`` returns component planes stacked on the MAJOR axis —
#: r shaped (3, n_times, n_sats) — the kernels' native output layout,
#: skipping the minor-dim-3 relayout entirely (the analogue of the
#: reference's into-buffer stride control, satrec.zig:896-988).
LAYOUTS = ("time_major", "sat_major", "planes")

#: eccentricity above which half-day-resonant (irez == 2) deep lanes
#: escape the fast method's f32 tail to a full-f64 recompute (see
#: SatCatalog.heo_escape). 0.7 keeps the escape set to Molniya-class
#: outliers; lower it to trade sweep time for accuracy on HEO-heavy
#: catalogs.
HEO_ESCAPE_ECC = float(os.environ.get("ASTROZ_HEO_ESCAPE_ECC", "0.7"))
#: more escape lanes than this and the f64 recompute would stop being
#: a rounding error of the sweep — such a catalog keeps the plain
#: fast-path accuracy instead
_HEO_ESCAPE_CAP = 512


@dataclass(frozen=True, init=False)
class SatCatalog:
    """An initialized satellite catalog: SGP4 elements + deep-space
    coefficients as full-catalog SoA pytrees.

    The analogue of the reference's ``Constellation`` (batch lists +
    origIndices scatter maps, Constellation.zig:101-200) collapsed into
    two pytrees — no packing, no padding, no index maps.

    The device pytrees (``els``/``deep``/``els_deep``/``deep_sub``) are
    LAZY: ``build_catalog`` starts the packed host->device transfer on
    a background thread and the first property access resolves it —
    so catalog construction never blocks on a (possibly degraded)
    remote-TPU tunnel, and the transfer + its one unpack-program
    compile ride under the caller's first-sweep trace/compile.
    """

    grav: GravityModel
    satnum: np.ndarray  # int64 host array
    names: Optional[Tuple[Optional[str], ...]] = None
    # static deep-lane partition for the fast path: the deep-space
    # machinery (resonance loop, lunisolar periodics) runs only on the
    # deep subset, then scatters back — the TPU-shaped version of the
    # reference's SGP4/SDP4 batch split (Constellation.zig:115-184),
    # except the subsets stay dense unpadded arrays.
    deep_idx: Optional[np.ndarray] = None
    #: host-side numpy copies of the columns the staging layer reads
    #: back (epoch_jd, ecco, is_deep, error, + deep twins, full init
    #: pytrees), stashed at build time BEFORE the device transfer — so
    #: no host-side property ever blocks on (or round-trips through) a
    #: remote-TPU tunnel. Optional: catalogs built by other paths
    #: (pad/shard) fall back to fetching from the device arrays.
    host: Optional[dict] = dataclasses.field(
        default=None, repr=False, compare=False)
    #: resolved 4-tuple ``(els, deep, els_deep, deep_sub)`` of device
    #: pytrees, or a zero-arg callable producing it (a background
    #: transfer's ``Future.result``)
    dev: object = dataclasses.field(default=None, repr=False,
                                    compare=False)

    def __init__(self, els: Sgp4Elements = None,
                 deep: Optional[DeepElements] = None,
                 grav: GravityModel = None, satnum: np.ndarray = None,
                 names=None, deep_idx=None, els_deep=None,
                 deep_sub=None, host=None, dev=None):
        object.__setattr__(self, "grav", grav)
        object.__setattr__(self, "satnum", satnum)
        object.__setattr__(self, "names", names)
        object.__setattr__(self, "deep_idx", deep_idx)
        object.__setattr__(self, "host", host)
        object.__setattr__(self, "dev",
                           dev if dev is not None
                           else (els, deep, els_deep, deep_sub))

    def _resolve(self):
        d = self.dev
        if callable(d):
            d = d()
            object.__setattr__(self, "dev", d)
        return d

    @property
    def els(self) -> Sgp4Elements:
        return self._resolve()[0]

    @property
    def deep(self) -> Optional[DeepElements]:
        return self._resolve()[1]

    @property
    def els_deep(self) -> Optional[Sgp4Elements]:
        return self._resolve()[2]

    @property
    def deep_sub(self) -> Optional[DeepElements]:
        return self._resolve()[3]

    def _host(self, key: str, fallback):
        if self.host is not None and key in self.host:
            return self.host[key]
        return np.asarray(fallback())

    def __len__(self) -> int:
        if self.host is not None and "n_sats" in self.host:
            return self.host["n_sats"]
        return int(self.els.no_kozai.shape[0])

    @property
    def n_sats(self) -> int:
        return len(self)

    @cached_property
    def is_deep(self) -> np.ndarray:
        return self._host("is_deep", lambda: self.els.is_deep)

    @property
    def n_deep(self) -> int:
        return int(self.is_deep.sum())

    @property
    def has_deep(self) -> bool:
        if self.host is not None and "has_deep" in self.host:
            return self.host["has_deep"]
        return self.deep is not None

    @cached_property
    def epochs_jd(self) -> np.ndarray:
        # cached: on a remote TPU backend every np.asarray of device
        # data is a blocking ~25 ms round trip — epochs are immutable,
        # fetch once (or never: build-time catalogs carry host copies)
        return self._host("epoch_jd", lambda: self.els.epoch_jd)

    @cached_property
    def epoch_min_jd(self) -> float:
        return float(self.epochs_jd.min()) if len(self) else 0.0

    @cached_property
    def deep_epochs_jd(self) -> Optional[np.ndarray]:
        if not self.has_deep:
            return None
        return self._host("deep_epoch_jd", lambda: self.els_deep.epoch_jd)

    @property
    def init_errors(self) -> np.ndarray:
        """Per-satellite python-sgp4 init error codes (0 = ok)."""
        return self._host("error", lambda: self.els.error)

    @cached_property
    def fast_staging(self):
        """Per-catalog device-resident arrays the fast path reuses on
        every call: ``(t_sat, t_sat_deep, deep_mask, deep_inv)`` —
        epoch offsets in minutes relative to the earliest epoch, plus
        the deep-substitution expansion map (per-satellite bool mask +
        index into the deep subset). Computed from the HOST epoch
        copies (never resolving the lazy device transfer) and staged
        with async device_puts — a propagate() call then enqueues zero
        eager per-op device work and zero compiles."""
        ref = self.epoch_min_jd
        t_sat = jax.device_put(
            jnp.asarray((self.epochs_jd - ref) * MINUTES_PER_DAY))
        if self.has_deep:
            t_sat_deep = jax.device_put(jnp.asarray(
                (self.deep_epochs_jd - ref) * MINUTES_PER_DAY))
            is_deep_h = self.is_deep
            rows = np.maximum(np.cumsum(is_deep_h) - 1, 0)
            deep_mask = jax.device_put(jnp.asarray(is_deep_h))
            deep_inv = jax.device_put(
                jnp.asarray(rows.astype(np.int32)))
        else:
            t_sat_deep = deep_mask = deep_inv = None
        return t_sat, t_sat_deep, deep_mask, deep_inv

    @cached_property
    def deep_idx_static(self):
        """Deep-column positions as a hashable tuple (host-side uses)."""
        if self.deep_idx is None:
            return None
        return tuple(int(i) for i in self.deep_idx)

    @cached_property
    def deep_idx_dev(self):
        """Deep-column positions as a device-resident i32 array — the
        TRACED scatter-index argument of _propagate_fast_partitioned
        (one tiny transfer per catalog, not per call; traced beats
        constant-baked indices by ~1.5 ms/sweep on v5e, see the
        partitioned docstring)."""
        if self.deep_idx is None:
            return None
        return jax.device_put(jnp.asarray(self.deep_idx, jnp.int32))

    @cached_property
    def merge_staging(self):
        """Static deep-merge staging for the fused Pallas merge
        (ops/pallas_sgp4.build_merge_staging): ``(onehot_dev, keep_dev,
        K, group_blocks, els_deep_p, deep_sub_p, t_sat_deep_p)`` — the
        one-hot/keep operands plus the deep subset PRE-PERMUTED into
        group-compacted order, all staged once per catalog (the ~100
        tiny per-leaf gathers measured ~3 ms/sweep when left inside the
        per-sweep program). ``None`` for pure near-earth catalogs or
        when the deep fraction is so large that group compaction
        degenerates (K > 256; the scatter path handles those)."""
        if self.deep_idx is None:
            return None
        from .ops.pallas_sgp4 import SAT_BLOCK, build_merge_staging
        perm, onehot, keep, k_width, g = build_merge_staging(
            self.deep_idx, len(self), SAT_BLOCK)
        if k_width > 256:
            return None
        perm = np.asarray(perm)
        ref = self.epoch_min_jd

        if self.host is not None and "els_deep_np" in self.host:
            # permute in numpy on the build-time host pytrees, then one
            # packed transfer — the jitted device permute this replaces
            # cost a ~5 s remote compile per catalog signature
            els_d = self.host["els_deep_np"]
            deep_d = self.host["deep_sub_np"]
            tsd_h = (self.host["deep_epoch_jd"] - ref) * MINUTES_PER_DAY

            def take(x):
                return np.asarray(x)[perm] if getattr(x, "ndim", 0) else x

            tree = (jax.tree_util.tree_map(take, els_d),
                    jax.tree_util.tree_map(take, deep_d), tsd_h[perm])
            els_p, deep_p, tsd_p = _device_put_packed(
                tree, jax.devices()[0])
        else:
            _, t_sat_deep, _, _ = self.fast_staging

            @jax.jit
            def permute(els_deep, deep_sub, tsd):
                def take(x):
                    return x[perm] if getattr(x, "ndim", 0) else x
                return (jax.tree_util.tree_map(take, els_deep),
                        jax.tree_util.tree_map(take, deep_sub),
                        tsd[perm])

            els_p, deep_p, tsd_p = permute(self.els_deep, self.deep_sub,
                                           t_sat_deep)
        return (jax.device_put(jnp.asarray(onehot, jnp.bfloat16)),
                jax.device_put(jnp.asarray(keep, jnp.float32)),
                k_width, g, els_p, deep_p, tsd_p)

    def resonance_tables_packed(self, steps: int):
        """Resonance tables built directly on the block-compacted
        (merge_staging-ordered) deep subset — cached like
        :meth:`resonance_tables`."""
        key = ("packed", steps)
        tb = self._resonance_tables_cache.get(key)
        if tb is None:
            from .ops.fast import build_resonance_tables
            _, _, _, _, els_p, deep_p, _ = self.merge_staging
            tb = build_resonance_tables(deep_p, els_p, n_steps=steps)
            self._resonance_tables_cache[key] = tb
        return tb

    @cached_property
    def _resonance_tables_cache(self) -> dict:
        return {}

    @cached_property
    def heo_escape(self):
        """f64 accuracy-escape staging for extreme half-day HEO lanes.

        The fast method's f32 deep tail loses tens of meters near
        e>0.7 perigees (the 47 m worst case of the differential sweep
        lived on ``irez == 2 & ecco > HEO_ESCAPE_ECC`` lanes); real
        catalogs hold only a handful of such satellites
        (Molniya-class), so the fast paths recompute exactly those
        columns at full f64 via the loop-free table-resonance
        propagate (:func:`astroz_tpu.ops.fast.sdp4_propagate_tables`)
        and substitute them into the small deep planes BEFORE the
        merge — never touching the big output buffers.

        ``None`` when no lane qualifies (or an unrealistic catalog
        exceeds the ``_HEO_ESCAPE_CAP`` — the f64 recompute must stay
        a rounding error of the sweep cost). Otherwise
        ``(els_x, deep_x, t_sat_x, pos_dev, idx_dev)``: the f64
        element subsets, epoch offsets (minutes), packed-lane positions
        for the fused merge path (``None`` without merge staging), and
        deep-subset column positions for the partitioned path.
        """
        if not self.has_deep:
            return None
        if self.host is not None and "els_deep_np" in self.host:
            els_d = self.host["els_deep_np"]
            deep_d = self.host["deep_sub_np"]
            ecc = np.asarray(els_d.ecco)
            irez = np.asarray(deep_d.irez)
        else:
            els_d = deep_d = None
            ecc = np.asarray(self.els_deep.ecco)
            irez = np.asarray(self.deep_sub.irez)
        mask = (irez == 2) & (ecc > HEO_ESCAPE_ECC)
        n_x = int(mask.sum())
        if n_x == 0 or n_x > _HEO_ESCAPE_CAP:
            return None
        idx = np.nonzero(mask)[0]

        if els_d is not None:
            def take_np(x):
                a = np.asarray(x)
                return a[idx] if a.ndim else a

            tree = (jax.tree_util.tree_map(take_np, els_d),
                    jax.tree_util.tree_map(take_np, deep_d))
            els_x, deep_x = _device_put_packed(tree, jax.devices()[0])
        else:
            idx_j = jnp.asarray(idx)

            def take(x):
                return x[idx_j] if getattr(x, "ndim", 0) else x

            els_x = jax.tree_util.tree_map(take, self.els_deep)
            deep_x = jax.tree_util.tree_map(take, self.deep_sub)
        t_sat_x = jax.device_put(jnp.asarray(
            (np.asarray(self.deep_epochs_jd)[idx] - self.epoch_min_jd)
            * MINUTES_PER_DAY))
        pos_dev = None
        staging = self.merge_staging
        if staging is not None:
            from .ops.pallas_sgp4 import SAT_BLOCK, merge_packed_positions
            _, _, k_width, g, _, _, _ = staging
            pos = merge_packed_positions(self.deep_idx, SAT_BLOCK,
                                         k_width, g)
            pos_dev = jax.device_put(jnp.asarray(pos[idx], jnp.int32))
        idx_dev = jax.device_put(jnp.asarray(idx, jnp.int32))
        return els_x, deep_x, t_sat_x, pos_dev, idx_dev

    def escape_tables(self, steps: int):
        """Resonance tables for the heo_escape subset — cached like
        :meth:`resonance_tables`."""
        key = ("escape", steps)
        tb = self._resonance_tables_cache.get(key)
        if tb is None:
            from .ops.fast import build_resonance_tables
            els_x, deep_x = self.heo_escape[0], self.heo_escape[1]
            tb = build_resonance_tables(deep_x, els_x, n_steps=steps)
            self._resonance_tables_cache[key] = tb
        return tb

    def resonance_tables(self, steps: int):
        """Catalog-cached deep-space resonance integration tables at the
        given static depth: the sequential O(steps) Euler-Maclaurin scan
        (ops/fast.py:_resonance_tables) runs ONCE per (catalog, depth)
        and every subsequent propagate() sweep reuses the device-resident
        tables — the batch analogue of the reference's carry resuming the
        integration across calls (Sdp4.zig:160-171)."""
        tb = self._resonance_tables_cache.get(steps)
        if tb is None:
            from .ops.fast import build_resonance_tables
            tb = build_resonance_tables(self.deep_sub, self.els_deep,
                                        n_steps=steps)
            self._resonance_tables_cache[steps] = tb
        return tb

    @cached_property
    def kepler_iters(self) -> int:
        """Static Newton trip count for the fast SHALLOW kernel,
        laddered on the partition's max eccentricity. Newton from
        E0=u is quadratic with contraction ~e/(2(1-e)): by e<=0.05
        THREE trips already sit on the f32 noise floor (~6e-7 rad
        residual, measured — the same floor 5 trips reach), and real
        LEO catalogs are e<0.02, so the headline path runs 3. Margins
        cover the J3 |aynl| inflation (~2e-3); stress-gated per rung
        in tests/test_fast.py. The rung keys on EPOCH ecco while the
        eccentricity Newton actually sees (em) drifts at runtime (drag
        with negative bstar grows em on shallow lanes): the per-rung
        stress tests run at 1.2x the rung bound, so that 20% overshoot
        IS the deliberate drift budget — shallow drag perturbs em by
        well under 20% over SGP4's validity horizon (if it didn't, the
        propagation has already flagged error 1/4 on that lane).
        That drift budget is made EXPLICIT for drag-extreme lanes: the
        rung keys on ``ecco + |bstar|(|cc4|*1440 + 2|cc5|)`` — the
        linear drag eccentricity growth over a +-1-day horizon plus the
        bounded periodic cc5 term — because a high-bstar LEO propagated
        backward a few hours can inflate em far past its epoch rung
        (measured: a bstar=4e-4 e=0.049 lane hit 341 m under the 3-trip
        rung at t=-240 min; 3.9 m once the inflated bound selects 8).
        Real catalogs inflate the bound by <0.003 so the headline rung
        stays 3; beyond +-1 day the SGP4 drag model itself is the
        dominant error on such lanes.
        Only the near-earth lanes count — the
        deep partition (where the high-e HEOs live) runs its own
        kernel at the full 8 — so a mixed catalog keeps the cheap
        trip count on ~95% of its lanes."""
        if not len(self):
            return 5
        ecc = self._host("ecco", lambda: self.els.ecco)
        if self.host is not None and "els_np" in self.host:
            els_h = self.host["els_np"]
            bstar = np.asarray(els_h.bstar)
            cc4 = np.asarray(els_h.cc4)
            cc5 = np.where(np.asarray(els_h.isimp), 0.0,
                           np.asarray(els_h.cc5))
        else:
            els_d = self.els
            bstar = np.asarray(els_d.bstar)
            cc4 = np.asarray(els_d.cc4)
            cc5 = np.where(np.asarray(els_d.isimp), 0.0,
                           np.asarray(els_d.cc5))
        ecc = ecc + np.abs(bstar) * (np.abs(cc4) * 1440.0
                                     + 2.0 * np.abs(cc5))
        if self.has_deep:
            ecc = ecc[~self.is_deep]
        max_ecc = min(float(ecc.max()), 0.999) if ecc.size else 0.0
        if max_ecc < 0.05:
            return 3
        if max_ecc < 0.2:
            return 4
        if max_ecc < 0.35:
            return 5
        return 8

    @cached_property
    def deep_kepler_iters(self) -> int:
        """Static Newton trip count for the DEEP kernel: 6 trips reach
        the same f32 residual floor as 8 up to e=0.8 (the +-0.95 step
        clip tames the high-e start; measured ~8e-7 rad either way,
        rung-gated in tests/test_fast.py) — and real deep catalogs top
        out at Molniya/HEO e~0.74."""
        if not self.has_deep:
            return 8
        max_ecc = float(self._host("deep_ecco",
                                   lambda: self.els_deep.ecco).max())
        return 6 if max_ecc < 0.8 else 8

    @cached_property
    def scalar_vecs(self) -> Optional[np.ndarray]:
        """Packed element matrix ``(n_sats, len(SCALAR_FIELDS))`` for
        the native host engine (native.sgp4_grid) — the small-grid
        routing target (see :func:`_propagate_host_small`). Built from
        the BUILD-TIME host pytrees, so no device fetch; ``None`` when
        the native library or the host pytrees are unavailable."""
        if self.host is None or "els_np" not in self.host:
            return None
        from . import native
        if native.get_lib() is None:
            return None
        els = self.host["els_np"]
        deep = self.host.get("deep_np")
        g = self.grav
        gmap = {"radiusearthkm": g.radius_earth_km, "xke": g.xke,
                "j2": g.j2, "j3oj2": g.j3oj2}
        vecs = np.zeros((len(self), len(native.SCALAR_FIELDS)),
                        np.float64)
        for i, name in enumerate(native.SCALAR_FIELDS):
            if name in gmap:
                vecs[:, i] = gmap[name]
            elif name == "deep":
                vecs[:, i] = self.is_deep.astype(np.float64)
            elif hasattr(els, name):
                vecs[:, i] = np.asarray(getattr(els, name), np.float64)
            elif deep is not None and hasattr(deep, name):
                # deep coefficients are only READ on deep lanes (the
                # engine branches on the deep flag), so shallow-lane
                # garbage here is never consumed
                vecs[:, i] = np.asarray(getattr(deep, name), np.float64)
            # else: peo/pinco/plo/pgho/pho — identically zero in the
            # published algorithm (sgp4init zeroes them); stay 0
        return vecs


import sys
import time as _time


def build_catalog(source: Union[str, Sequence[Tle], TleArrays],
                  grav: GravityModel = WGS72,
                  verbose: bool = False) -> SatCatalog:
    """Parse + initialize a catalog in one vectorized pass.

    ``source`` may be raw TLE/3LE text, a sequence of parsed
    :class:`~astroz_tpu.tle.Tle`, OMM JSON text, or a pre-transposed
    :class:`~astroz_tpu.tle.TleArrays`. Unlike the reference's
    per-satellite ``initElements`` loop + classify-and-split
    (Constellation.zig:115-184), init runs as one XLA program over the
    whole catalog and deep-space satellites stay in place.
    ``verbose`` prints a parse/init/partition/transfer phase breakdown
    to stderr.
    """
    names: Optional[Tuple[Optional[str], ...]] = None
    t_start = _time.perf_counter()
    if isinstance(source, TleArrays):
        arrays = source
    else:
        arrays = None
        if isinstance(source, str):
            stripped = source.lstrip()
            if stripped.startswith("[") or stripped.startswith("{"):
                tles = parse_omm(source)
            else:
                # pure 2-line catalogs (no names) take the native C++
                # bulk parser; named 3LE catalogs keep the Python path
                # so names survive
                has_names = any(
                    ln and not ln.lstrip().startswith(("1 ", "2 "))
                    for ln in source.splitlines())
                if not has_names:
                    arrays = TleArrays.from_text(source)
                    if len(arrays) == 0:
                        raise ValueError("no TLEs found in source")
                tles = None if arrays is not None \
                    else list(iter_tles(source))
        else:
            tles = list(source)
        if arrays is None:
            if not tles:
                raise ValueError("no TLEs found in source")
            names = tuple(t.name for t in tles)
            arrays = TleArrays.from_tles(tles)

    t_parse = _time.perf_counter()
    # Init runs in PURE NUMPY on the host: one-shot O(n_sats)
    # elementwise math (~30 ms for 13k sats) with zero XLA compilation —
    # the jitted form costs ~3.4 s of one-shot CPU compile per process,
    # and compiling it for a remote TPU costs minutes of compile-service
    # latency. The finished catalog is device_put to the default backend
    # once (catalog_from_elements).
    from .ops.sgp4 import sgp4_init_np
    els = sgp4_init_np(
        grav,
        no_kozai=np.asarray(arrays.no_kozai, np.float64),
        ecco=np.asarray(arrays.ecco, np.float64),
        inclo=np.asarray(arrays.inclo, np.float64),
        nodeo=np.asarray(arrays.nodeo, np.float64),
        argpo=np.asarray(arrays.argpo, np.float64),
        mo=np.asarray(arrays.mo, np.float64),
        bstar=np.asarray(arrays.bstar, np.float64),
        epoch_jd=np.asarray(arrays.epoch_jd, np.float64))
    cat = catalog_from_elements(els, grav, np.asarray(arrays.satnum),
                                names=names, verbose=verbose,
                                _t_parse=(t_parse - t_start))
    if verbose:
        print(f"# ingest total: {_time.perf_counter() - t_start:.2f}s",
              file=sys.stderr)
    return cat


def catalog_from_elements(els: Sgp4Elements, grav: GravityModel,
                          satnum: Optional[np.ndarray] = None,
                          names: Optional[Tuple[Optional[str], ...]] = None,
                          verbose: bool = False,
                          _t_parse: Optional[float] = None
                          ) -> SatCatalog:
    """Finish catalog construction from initialized SGP4 elements:
    deep-space init + static deep-lane partition for the fast path.

    All init math runs in pure numpy on the host (see
    ops.sgp4.sgp4_init_np — zero XLA compilation on the ingest path;
    jax-array inputs are pulled to host first), then the finished
    pytrees are device_put to the default backend in a few packed
    transfers so the hot propagate paths never pay host->device
    transfers per call."""
    t0 = _time.perf_counter()
    from .ops.sdp4 import sdp4_init_np

    els = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x, els)
    any_deep = bool(els.is_deep.any())
    deep = sdp4_init_np(grav, els) if any_deep else None
    if satnum is None:
        satnum = np.arange(len(els.no_kozai), dtype=np.int64)
    t1 = _time.perf_counter()

    # deep-lane partition in numpy: O(n) host gathers, no device round
    # trips, no per-leaf eager programs
    deep_idx = els_deep = deep_sub = None
    if any_deep:
        els_h = els
        deep_h = deep
        deep_idx = np.nonzero(els_h.is_deep)[0]

        def take(x):
            return x[deep_idx] if getattr(x, "ndim", 0) else x

        els_deep = jax.tree_util.tree_map(take, els_h)
        deep_sub = jax.tree_util.tree_map(take, deep_h)
    t2 = _time.perf_counter()

    # host-side copies of the columns the staging layer reads back —
    # stashed BEFORE the device transfer so catalog properties never
    # block on (or round-trip through) a remote-TPU tunnel
    host = {"epoch_jd": np.asarray(els.epoch_jd),
            "ecco": np.asarray(els.ecco),
            "is_deep": np.asarray(els.is_deep),
            "error": np.asarray(els.error),
            "n_sats": int(els.no_kozai.shape[0]),
            "has_deep": any_deep,
            # full numpy pytrees (~10 MB at 13k sats): the small-grid
            # host route packs its native element matrix from these,
            # merge_staging permutes its deep compaction on them
            "els_np": els, "deep_np": deep,
            "els_deep_np": els_deep, "deep_sub_np": deep_sub}
    if any_deep:
        host["deep_epoch_jd"] = np.asarray(els_deep.epoch_jd)
        host["deep_ecco"] = np.asarray(els_deep.ecco)

    # the packed transfer + its one unpack-program compile run on a
    # BACKGROUND thread and resolve at first property access: catalog
    # construction never blocks on the tunnel, and through a remote
    # compile service the 1-10 s unpack compile rides under the
    # caller's own first-sweep trace/compile. The reference's analogue
    # is ms-scale local packing (Constellation.zig:101-200), where
    # blocking was free; here overlap is the whole game.
    default = jax.devices()[0]
    fut = _transfer_pool().submit(
        _device_put_packed, (els, deep, els_deep, deep_sub), default)
    t3 = _time.perf_counter()
    if verbose:
        parse = f"parse {_t_parse:.2f}s  " if _t_parse is not None else ""
        print(f"# ingest: {parse}init {t1 - t0:.2f}s  "
              f"partition {t2 - t1:.2f}s  transfer backgrounded "
              f"({t3 - t2:.2f}s; resolves under first compile)",
              file=sys.stderr)
    return SatCatalog(grav=grav, satnum=satnum, names=names,
                      deep_idx=deep_idx, host=host, dev=fut.result)


_TRANSFER_POOL = None


def _transfer_pool():
    """Single background thread for catalog device transfers (lazy so
    import never spawns threads; one thread keeps transfers ordered)."""
    global _TRANSFER_POOL
    if _TRANSFER_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _TRANSFER_POOL = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="astroz-ingest")
    return _TRANSFER_POOL


@partial(jax.jit, static_argnames=("spec",))
def _unpack_flat(packs, spec):
    """Split per-dtype 1-D packs back into leaves in ONE program.

    ``spec[k] = ((offset, shape), ...)`` for dtype-buffer ``packs[k]``
    — static, so every slice is a static-bounds slice and the whole
    unpack is one compiled program per catalog signature. Eager
    ``pack[a:b]`` slices would compile one tiny program per leaf —
    ~180 remote compile-service round trips per catalog through the
    TPU tunnel (seconds)."""
    outs = []
    for pack, entries in zip(packs, spec):
        for off, shape in entries:
            size = 1
            for d in shape:
                size *= d
            outs.append(pack[off:off + size].reshape(shape))
    return tuple(outs)


def _device_put_packed(tree, device, force_pack: bool = False):
    """Transfer a pytree host->device as ONE packed array per dtype.

    A per-leaf ``jax.device_put`` pays one transfer round trip per leaf
    — measured up to ~4 s/leaf through a degraded remote-TPU tunnel
    (351 s for a catalog's 87 element arrays) — and every distinct
    unpack program shape pays a remote compile-service round trip.
    Concatenating ALL raveled leaves into one 1-D host buffer per dtype
    makes the whole catalog land in <=3 transfers + ONE compile + ONE
    execution, regardless of how many leaves or shape groups it has.

    Host-CPU targets skip the packing: local device_put is ~free there
    and the unpack program would cost a pointless jit compile.
    ``force_pack`` exercises the packed path on CPU for tests.
    """
    if device.platform == "cpu" and not force_pack:
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a), device)
            if hasattr(a, "ndim") else a, tree)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups = {}  # dtype str -> [(leaf_index, array), ...]
    out = [None] * len(leaves)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        groups.setdefault(arr.dtype.str, []).append((i, arr))
    packs = []
    spec = []
    order = []  # leaf indices in pack traversal order
    for dt in sorted(groups):
        members = groups[dt]
        entries = []
        off = 0
        for i, arr in members:
            entries.append((off, arr.shape))
            off += arr.size
            order.append(i)
        packs.append(jax.device_put(
            np.concatenate([a.ravel() for _, a in members]), device))
        spec.append(tuple(entries))
    parts = _unpack_flat(tuple(packs), tuple(spec))
    for k, i in enumerate(order):
        out[i] = parts[k]
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# Core jitted kernels
# ---------------------------------------------------------------------------


def _finalize(r, v, err, jd_sum, output: str, want_vel: bool):
    """Fused frame conversion + zero-fill of failed lanes.

    GMST is always computed in f64 (JD magnitude ~2.45e6 makes f32
    useless there), then reduced and cast to the kernel dtype.
    """
    if output != "teme":
        gmst = gstime(jd_sum).astype(r.dtype)
        while gmst.ndim < r.ndim - 1:
            gmst = gmst[..., None]
        r = teme_to_ecef(r, gmst)
        if want_vel:
            v = teme_to_ecef(v, gmst)
        if output == "geodetic":
            r = ecef_to_geodetic(r)
        elif output == "geodetic_deg":
            from .frames import ecef_to_geodetic_deg
            r = ecef_to_geodetic_deg(r)
    return (r, v, err) if want_vel else (r, None, err)


def _finalize_planes(r3, v3, err, jd_sum, output: str,
                     want_vel: bool, layout: str):
    """Frame conversion + layout assembly on grouped component planes.

    ``r3``/``v3`` are the kernels' native (3, n_times, n_sats) stacked
    component buffers (exact shapes — Pallas writes them directly; see
    ops/pallas_sgp4._store) and ``err`` is (n_times, n_sats). With
    ``layout="planes"`` and TEME output this function is the identity —
    zero post-kernel work, the analogue of the reference's into-buffer
    writes (satrec.zig:896-988). The frame rotation decomposes into
    per-component math and restacks (one write pass, fused with the
    rotation itself); ``sat_major``/``time_major`` pay exactly one
    relayout transpose.
    """
    if output != "teme":
        x, y, z = r3[0], r3[1], r3[2]
        gmst = gstime(jd_sum).astype(x.dtype)  # jd_sum is (T, 1)
        sg, cg = jnp.sin(gmst), jnp.cos(gmst)
        x, y = cg * x + sg * y, -sg * x + cg * y
        if want_vel:
            vx, vy, vz = v3[0], v3[1], v3[2]
            v3 = jnp.stack([cg * vx + sg * vy, -sg * vx + cg * vy, vz],
                           axis=0)
        if output in ("geodetic", "geodetic_deg"):
            from .frames import ecef_to_geodetic_xyz
            lat, lon, alt = ecef_to_geodetic_xyz(x, y, z)
            if output == "geodetic_deg":
                from .constants import RAD2DEG
                lat, lon = lat * RAD2DEG, lon * RAD2DEG
            x, y, z = lat, lon, alt
        r3 = jnp.stack([x, y, z], axis=0)
    if layout == "planes":
        return r3, v3 if want_vel else None, err
    if layout == "sat_major":
        r = jnp.transpose(r3, (2, 1, 0))
        v = jnp.transpose(v3, (2, 1, 0)) if want_vel else None
        return r, v, err.T
    r = jnp.moveaxis(r3, 0, -1)
    v = jnp.moveaxis(v3, 0, -1) if want_vel else None
    return r, v, err


@partial(jax.jit, static_argnames=("grav", "output", "want_vel"))
def _propagate_shallow(els: Sgp4Elements, tsince, jd_sum, grav: GravityModel,
                       output: str, want_vel: bool):
    r, v, err = sgp4_propagate(els, tsince, grav)
    return _finalize(r, v, err, jd_sum, output, want_vel)


@partial(jax.jit, static_argnames=("grav", "output", "want_vel"))
def _propagate_mixed(els: Sgp4Elements, deep: DeepElements, tsince, jd_sum,
                     grav: GravityModel, output: str, want_vel: bool):
    r, v, err, _ = sdp4_propagate(els, deep, tsince, grav)
    return _finalize(r, v, err, jd_sum, output, want_vel)


def _resonance_window(epochs_jd: np.ndarray) -> int:
    """Static per-time-row step-index spread for the windowed resonance
    gather (ops/fast.py:_resonance_from_tables): within one row of the
    separable grid ``tsince = t_time - t_sat``, values span exactly the
    deep subset's epoch spread, so the 720-min step index spans at most
    ``ceil(spread/720) + 2`` rows (+1 floor boundary, +1 sign
    transition). Rounded up to a multiple of 4 to bound recompilation.
    """
    spread_min = float(epochs_jd.max() - epochs_jd.min()) * 1440.0
    w = int(np.ceil(spread_min / 720.0)) + 3
    return int(-4 * (-w // 4))


def _group_planes(vals, want_vel: bool):
    """(x, y, z[, vx, vy, vz], err) components -> (r3, v3 | None, err)."""
    r3 = jnp.stack(vals[0:3], axis=0)
    v3 = jnp.stack(vals[3:6], axis=0) if want_vel else None
    return r3, v3, vals[-1]


def _shallow_planes(els, t_time, t_sat, grav, kepler_iters, engine,
                    want_vel: bool):
    """Run the shallow fast kernel on the chosen engine, returning the
    grouped component planes ``(r3, v3 | None, err)`` with r3/v3 shaped
    (3, n_times, n_sats): the fused Pallas kernel on TPU ('pallas' —
    writes the grouped buffers directly) or the XLA elementwise graph.
    The time grid is separable: tsince = t_time[:, None] - t_sat."""
    if engine == "pallas":
        from .ops.pallas_sgp4 import (_unpack_outs,
                                      propagate_fast_pallas_sep)
        outs = propagate_fast_pallas_sep(els, t_time, t_sat, grav,
                                         kepler_iters=kepler_iters,
                                         planes=True, want_vel=want_vel)
        return _unpack_outs(outs, want_vel)
    from .ops.fast import _shallow_f32_fields, shallow_tail_f32, spine_f64
    tsince = t_time[:, None] - t_sat[None, :]
    spine = spine_f64(els, tsince)
    return _group_planes(shallow_tail_f32(grav, kepler_iters, *spine,
                                          want_vel=want_vel,
                                          **_shallow_f32_fields(els)),
                         want_vel)


def _deep_planes(els_deep, deep_sub, tsince_deep, grav, engine,
                 resonance_steps, want_vel: bool,
                 resonance_window=None, tables=None,
                 kepler_iters: int = 8):
    """Deep-subset kernel on the chosen engine, grouped planes form
    (r3, v3 | None, err) like :func:`_shallow_planes`."""
    if engine == "pallas":
        from .ops.pallas_sgp4 import _unpack_outs, propagate_deep_pallas
        outs = propagate_deep_pallas(
            els_deep, deep_sub, tsince_deep, grav,
            kepler_iters=kepler_iters,
            resonance_steps=resonance_steps, planes=True,
            want_vel=want_vel, resonance_window=resonance_window,
            tables=tables)
        return _unpack_outs(outs, want_vel)
    from .ops.fast import deep_f32_fields, deep_spine_f64, deep_tail_f32
    spine = deep_spine_f64(els_deep, deep_sub, tsince_deep,
                           resonance_steps, resonance_window, tables)
    return _group_planes(deep_tail_f32(grav, kepler_iters, *spine,
                                       want_vel=want_vel,
                                       **deep_f32_fields(els_deep,
                                                         deep_sub)),
                         want_vel)


def default_engine() -> str:
    """'pallas' on TPU backends, 'xla' elsewhere (Pallas TPU kernels
    cannot run on CPU outside interpret mode)."""
    try:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


@partial(jax.jit,
         static_argnames=("grav", "output", "want_vel", "kepler_iters",
                          "engine", "layout"))
def _propagate_fast_shallow(els: Sgp4Elements, t_time, t_sat, jd_sum,
                            grav: GravityModel, output: str, want_vel: bool,
                            kepler_iters: int = 8, engine: str = "xla",
                            layout: str = "time_major"):
    r3, v3, err = _shallow_planes(els, t_time, t_sat, grav, kepler_iters,
                                  engine, want_vel)
    return _finalize_planes(r3, v3, err, jd_sum, output, want_vel, layout)


def _apply_escape(escape, t_time, grav, resonance_steps,
                  resonance_window, want_vel, d_r3, d_v3, d_err):
    """Substitute full-f64 recomputes of the extreme-eccentricity
    escape lanes (SatCatalog.heo_escape) into the deep component
    planes — a tiny scatter on the (3, T, n_deep-ish) buffers, traced
    inside the caller's program so it costs no extra dispatch."""
    if escape is None:
        return d_r3, d_v3, d_err
    from .ops.fast import sdp4_propagate_tables
    els_x, deep_x, t_sat_x, pos_x, tables_x = escape
    ts_x = t_time[:, None] - t_sat_x[None, :]
    xr, xv, xe = sdp4_propagate_tables(els_x, deep_x, ts_x, grav,
                                       resonance_steps, resonance_window,
                                       tables_x)
    d_r3 = d_r3.at[:, :, pos_x].set(
        jnp.moveaxis(xr, -1, 0).astype(d_r3.dtype))
    if want_vel:
        d_v3 = d_v3.at[:, :, pos_x].set(
            jnp.moveaxis(xv, -1, 0).astype(d_v3.dtype))
    d_err = d_err.at[:, pos_x].set(xe.astype(d_err.dtype))
    return d_r3, d_v3, d_err


@partial(jax.jit,
         static_argnames=("grav", "output", "want_vel", "kepler_iters",
                          "engine", "resonance_steps", "layout",
                          "resonance_window", "deep_kepler_iters"))
def _propagate_fast_partitioned(els: Sgp4Elements, els_deep: Sgp4Elements,
                                deep_sub: DeepElements, deep_idx, t_time,
                                t_sat, t_sat_deep, jd_sum,
                                grav: GravityModel,
                                output: str, want_vel: bool,
                                kepler_iters: int = 8, engine: str = "xla",
                                resonance_steps=None,
                                layout: str = "time_major",
                                resonance_window=None, tables=None,
                                deep_kepler_iters: int = 8,
                                escape=None):
    """Fast path for mixed catalogs: shallow kernel over all satellites,
    the deep-space kernel only over the deep subset, substituted into
    the deep columns by a scatter.

    ``escape`` (optional): ``(els_x, deep_x, t_sat_x, pos_x, tables_x)``
    from :meth:`SatCatalog.heo_escape` — extreme-eccentricity lanes
    recomputed at full f64 and substituted into the deep planes (at
    deep-subset positions ``pos_x``) before the big scatter.

    ``deep_idx`` is a TRACED i32 array of deep-column positions
    (``SatCatalog.deep_idx_dev`` keeps it device-resident). Traced
    indices make XLA emit one real scatter op; baking them in as
    constants lowered to an unrolled update chain measured ~1.5 ms
    SLOWER per sweep on v5e (in-program A/B across static/dynamic/
    select-gather/split-donated formulations — dynamic scatter won).
    The merge runs on the kernels' grouped (3, time, sat) component
    buffers — never on a minor-dim-3 array, which would force XLA to
    materialize that layout and pay relayout copies per plane (measured
    +17.6 ms); with ``layout="planes"`` the minor-dim-3 array never
    exists at all."""
    tsince_deep = t_time[:, None] - t_sat_deep[None, :]
    # deep subset through its own kernel (f64 spine + resonance tables
    # in XLA, f32 tail fused), then substituted into the deep columns
    d_r3, d_v3, d_err = _deep_planes(els_deep, deep_sub, tsince_deep,
                                     grav, engine, resonance_steps,
                                     want_vel, resonance_window, tables,
                                     deep_kepler_iters)
    d_r3, d_v3, d_err = _apply_escape(escape, t_time, grav,
                                      resonance_steps, resonance_window,
                                      want_vel, d_r3, d_v3, d_err)
    r3, v3, err = _shallow_planes(els, t_time, t_sat, grav, kepler_iters,
                                  engine, want_vel)
    idx = deep_idx.astype(jnp.int32)
    r3 = r3.at[:, :, idx].set(d_r3)
    if want_vel:
        v3 = v3.at[:, :, idx].set(d_v3)
    err = err.at[:, idx].set(d_err)
    return _finalize_planes(r3, v3, err, jd_sum, output, want_vel, layout)


@partial(jax.jit,
         static_argnames=("grav", "output", "want_vel", "kepler_iters",
                          "resonance_steps", "layout",
                          "resonance_window", "group_blocks",
                          "interpret", "deep_kepler_iters"))
def _propagate_fast_fused(els: Sgp4Elements, els_p: Sgp4Elements,
                          deep_p: DeepElements,
                          merge_onehot, merge_keep, t_time, t_sat,
                          t_sat_p, jd_sum, grav: GravityModel,
                          output: str, want_vel: bool,
                          kepler_iters: int = 8,
                          resonance_steps=None,
                          layout: str = "time_major",
                          resonance_window=None, tables_p=None,
                          group_blocks: int = 1,
                          interpret: bool = False,
                          deep_kepler_iters: int = 8,
                          escape=None):
    """Pallas-engine fast path for mixed catalogs with the deep merge
    FUSED into the kernels — no XLA scatter on the big buffers (the
    scatter measured 3-5 ms per sweep in every formulation; see the
    fused-merge section of ops/pallas_sgp4.py). ``els_p``/``deep_p``/
    ``t_sat_p``/``tables_p`` are the deep subset in block-compacted
    order — PRE-permuted at catalog staging (SatCatalog.merge_staging;
    leaving the ~100 tiny permutation gathers inside this program
    measured ~3 ms/sweep of pure op-dispatch overhead) — and the
    shallow kernel's epilogue substitutes the deep planes via an exact
    bf16-split one-hot matmul on the MXU (~0.1 ms). Reference
    analogue: the write-time origIndices scatter maps baked at batch
    packing, Constellation.zig:129-184."""
    from .ops.pallas_sgp4 import (_unpack_outs, propagate_deep_pallas,
                                  propagate_fast_pallas_sep_merge)

    tsince_deep = t_time[:, None] - t_sat_p[None, :]
    # the compact deep kernel over the group-compacted order — its flat
    # grouped planes (3, T, n_groups * K) are exactly the contiguous
    # per-group operands the merge kernel block-reads. Tile the deep
    # kernel with a divisor of the compact width so the grouping win
    # isn't padded away (896 lanes under the default 256-tile would pad
    # back to 1024).
    width = els_p.no_kozai.shape[0]
    deep_sb = 256 if width % 256 == 0 else 128
    d_outs = propagate_deep_pallas(
        els_p, deep_p, tsince_deep, grav,
        kepler_iters=deep_kepler_iters,
        resonance_steps=resonance_steps, planes=True,
        want_vel=want_vel, resonance_window=resonance_window,
        tables=tables_p, sat_block=deep_sb, interpret=interpret)
    dr, dv, de = _unpack_outs(d_outs, want_vel)
    # extreme-eccentricity lanes at their PACKED positions (escape[3]
    # is pos_dev here), before the merge reads the deep planes
    dr, dv, de = _apply_escape(escape, t_time, grav, resonance_steps,
                               resonance_window, want_vel, dr, dv, de)
    outs = propagate_fast_pallas_sep_merge(
        els, t_time, t_sat, grav, dr, dv, de, merge_onehot, merge_keep,
        kepler_iters=kepler_iters, planes=True, want_vel=want_vel,
        group_blocks=group_blocks, interpret=interpret)
    r3, v3, err = _unpack_outs(outs, want_vel)
    return _finalize_planes(r3, v3, err, jd_sum, output, want_vel, layout)


@partial(jax.jit, static_argnames=("grav", "output", "want_vel"))
def _propagate_mixed_scan(els: Sgp4Elements, deep: DeepElements, tsince,
                          jd_sum, grav: GravityModel, output: str,
                          want_vel: bool):
    """Scan over the (sorted) time axis threading the resonance carry —
    O(n_times) resonance work total instead of O(n_times * t/720)
    (reference: the sorted-carry path, satrec.zig:650-686)."""
    carry = fresh_carry(deep, els.no_unkozai)

    def step(c, t):
        r, v, err, c = sdp4_propagate(els, deep, t, grav, carry=c)
        return c, (r, v, err)

    _, (r, v, err) = jax.lax.scan(step, carry, tsince)
    return _finalize(r, v, err, jd_sum, output, want_vel)


# ---------------------------------------------------------------------------
# User-facing propagate
# ---------------------------------------------------------------------------

#: grids below this many propagations route to the native host engine
#: when the default backend is an accelerator: a device sweep costs a
#: ~1 ms dispatch + ~25 ms fetch through a remote-TPU tunnel (plus a
#: one-time compile per grid signature), while the host SIMD engine
#: answers 2^18 points in ~16 ms with zero compiles — the reference's
#: single-node small-grid rate (README.md:25-33) at every scale.
SMALL_GRID_PROPS = int(os.environ.get("ASTROZ_SMALL_GRID_PROPS",
                                      str(1 << 18)))


def _propagate_host_small(cat: SatCatalog, jd_h, fr_h, output: str,
                          want_vel: bool, layout: str, satellite_mask):
    """Small-grid propagate through the native host SIMD engine.

    Numerics are the f64 scalar algorithm (python-sgp4 parity fuzzed to
    1e-9 km), cast to f32 on return to keep the fast-method dtype
    contract. Outputs are numpy arrays (host-resident by design — the
    whole point is never touching the accelerator for tiny grids; the
    reference's analogue is its always-on-host scalar loop,
    README.md:25-33)."""
    from . import native
    from .constants import RAD2DEG

    vecs = cat.scalar_vecs
    ep = cat.epochs_jd
    tsince = ((jd_h[None, :] - ep[:, None])
              + fr_h[None, :]) * MINUTES_PER_DAY
    err, r, v = native.sgp4_grid(vecs, tsince)  # sat-major (S, T, ...)
    err = err.astype(np.int32)
    ie = cat.init_errors.astype(np.int32)
    if (ie != 0).any():
        err = np.where(ie[:, None] != 0, ie[:, None], err)
    bad = err != 0
    if bad.any():  # zero-fill failed lanes like the device kernels
        r = np.where(bad[..., None], 0.0, r)
        v = np.where(bad[..., None], 0.0, v)
    if output != "teme":
        gmst = gstime(jd_h + fr_h, xp=np)[None, :]
        r = teme_to_ecef(r, gmst, xp=np)
        if want_vel:
            v = teme_to_ecef(v, gmst, xp=np)
        if output in ("geodetic", "geodetic_deg"):
            lat, lon, alt = ecef_to_geodetic_xyz(
                r[..., 0], r[..., 1], r[..., 2], xp=np)
            if output == "geodetic_deg":
                lat, lon = lat * RAD2DEG, lon * RAD2DEG
            r = np.stack([lat, lon, alt], axis=-1)
    if satellite_mask is not None:
        m = np.asarray(satellite_mask, bool)
        r = np.where(m[:, None, None], r, 0.0)
        if want_vel:
            v = np.where(m[:, None, None], v, 0.0)
        err = np.where(m[:, None], err, np.int32(-1))
    r = r.astype(np.float32)
    v = v.astype(np.float32) if want_vel else None
    if layout == "sat_major":
        return r, v, err
    if layout == "planes":
        return (np.transpose(r, (2, 1, 0)),
                np.transpose(v, (2, 1, 0)) if want_vel else None, err.T)
    return (np.transpose(r, (1, 0, 2)),
            np.transpose(v, (1, 0, 2)) if want_vel else None, err.T)


def _host_route_ok(cat: SatCatalog, n_props: int) -> bool:
    """True when a fast-method grid should run on the native host
    engine instead of the accelerator (see SMALL_GRID_PROPS)."""
    if n_props > SMALL_GRID_PROPS or SMALL_GRID_PROPS <= 0:
        return False
    try:
        if jax.default_backend() == "cpu":
            return False  # local XLA:CPU pays no tunnel tax
    except Exception:
        return False
    return cat.scalar_vecs is not None


def propagate(cat: SatCatalog, jd, fr=None, *, output: str = "teme",
              velocities: bool = True, layout: str = "time_major",
              scan_times: bool = False, method: str = "f64",
              satellite_mask=None):
    """Propagate every satellite to every epoch.

    Args:
      cat: initialized catalog from :func:`build_catalog`.
      jd, fr: Julian date split (python-sgp4 convention). ``fr`` defaults
        to zeros. Scalars or 1-D arrays of equal length.
      output: ``"teme"`` (km/km/s), ``"ecef"`` (GMST-rotated), or
        ``"geodetic"`` (lat rad, lon rad, alt km; velocities stay ECEF).
      velocities: skip velocity output when False — with the fast
        method the Pallas kernels drop to 4 output planes and never
        compute the velocity terms (the reference's ``velocities=False``
        fast path, api.py:23 / README.md:116).
      layout: ``"time_major"`` -> (n_times, n_sats, 3), ``"sat_major"``
        -> (n_sats, n_times, 3) (reference: Constellation.zig Layout),
        or ``"planes"`` -> (3, n_times, n_sats) — the kernels' native
        component-plane layout, zero minor-dim-3 relayout (fastest;
        the analogue of the reference's into-buffer stride control,
        satrec.zig:896-988). With the fast method, ``sat_major`` and
        ``planes`` are written directly by the fused program, not
        transposed after the fact.
      scan_times: thread the SDP4 resonance carry along a sorted time
        axis via ``lax.scan`` (use for long monotone grids with many
        deep-space satellites; ``method="f64"`` only).
      method: ``"f64"`` for full double precision (bit-parity with the
        published algorithm; slow on TPU where f64 is emulated) or
        ``"fast"`` for the split-precision kernel (f64 angle spine +
        f32 tail, ~25 m worst case vs f64 over +-1440 min, ~15x faster
        on TPU; outputs are f32). See :mod:`astroz_tpu.ops.fast`.
      satellite_mask: optional boolean array (n_sats,) — masked-out
        satellites come back zero-filled with error code -1 (the
        reference's per-satellite visibility mask,
        sgp4.zig propagate_into satellite_mask).

    Returns:
      ``(r, v, error)``; ``v`` is None when ``velocities=False``;
      ``error`` is int32 with python-sgp4 error codes, 0 = ok.
    """
    if output not in OUTPUT_MODES:
        raise ValueError(f"output must be one of {OUTPUT_MODES}")
    if layout not in LAYOUTS:
        raise ValueError(f"layout must be one of {LAYOUTS}")
    if method not in ("fast", "f64"):
        raise ValueError("method must be 'fast' or 'f64'")

    # dtype probe must not resolve the lazy device transfer
    dt = (cat.host["els_np"].epoch_jd.dtype
          if cat.host is not None and "els_np" in cat.host
          else cat.els.epoch_jd.dtype)
    # host copies first: the prologue math below runs in numpy so a
    # propagate() call enqueues only the jitted program (plus two tiny
    # transfers), never eager per-op device dispatches — on a remote
    # TPU backend each eager op costs a dispatch and every device
    # fetch a ~25 ms round trip. (fr=None in particular must stay
    # numpy: a jnp.zeros_like default paid an eager dispatch AND a
    # blocking fetch before any real work.)
    jd_h = np.atleast_1d(np.asarray(jd, np.float64))
    fr_h = (np.zeros_like(jd_h) if fr is None
            else np.atleast_1d(np.asarray(fr, np.float64)))
    jd_h, fr_h = np.broadcast_arrays(jd_h, fr_h)
    if method == "fast":
        # tiny grids skip the accelerator entirely: the native host
        # SIMD engine beats a tunnel dispatch+fetch below ~2^18 points
        # (reference: the always-on-host scalar loop, README.md:25-33).
        # NOTE: checked before ANY jnp array is built — even a lone
        # jnp.asarray of the epoch column costs a ~0.35 ms device
        # transfer through a remote tunnel, 3x the whole native sweep.
        if _host_route_ok(cat, jd_h.size * len(cat)):
            return _propagate_host_small(cat, jd_h, fr_h, output,
                                         velocities, layout,
                                         satellite_mask)
    jd_sum = jnp.asarray((jd_h + fr_h)[:, None], dt)

    if method == "fast":
        engine = default_engine()
        ref = cat.epoch_min_jd
        t_time = jnp.asarray(((jd_h - ref) + fr_h) * MINUTES_PER_DAY, dt)
        t_sat, t_sat_deep, _, _ = cat.fast_staging
        if not cat.has_deep:
            r, v, err = _propagate_fast_shallow(
                cat.els, t_time, t_sat, jd_sum, cat.grav, output,
                velocities, cat.kepler_iters, engine, layout)
        else:
            # static resonance TABLE depth from the host-known horizon
            # (vs the DEEP satellites' own epochs — resonance integrates
            # from each epoch), rounded up to a power of two to bound
            # recompilation. The table is built per-satellite by a
            # lax.scan (ops/fast.py:_resonance_tables), so depth is
            # cheap — O(n_sats) work per step, not O(grid).
            jd_sum_h = jd_h + fr_h
            ep_deep = cat.deep_epochs_jd  # cached host copy (no fetch)
            tmax = float(max(abs(jd_sum_h.max() - ep_deep.min()),
                             abs(jd_sum_h.min() - ep_deep.max()))
                         * MINUTES_PER_DAY)
            steps = max(2, int(2 ** np.ceil(np.log2(
                max(tmax / 720.0, 1.0) + 1.0))))
            window = _resonance_window(ep_deep)
            staging = cat.merge_staging if engine == "pallas" else None
            esc = cat.heo_escape
            if staging is not None:
                onehot, keep, _k, g, els_p, deep_p, t_sat_p = staging
                esc_arg = (None if esc is None else
                           (esc[0], esc[1], esc[2], esc[3],
                            cat.escape_tables(steps)))
                r, v, err = _propagate_fast_fused(
                    cat.els, els_p, deep_p, onehot, keep, t_time, t_sat,
                    t_sat_p, jd_sum, cat.grav, output, velocities,
                    cat.kepler_iters, steps, layout, window,
                    cat.resonance_tables_packed(steps), g,
                    deep_kepler_iters=cat.deep_kepler_iters,
                    escape=esc_arg)
            else:
                esc_arg = (None if esc is None else
                           (esc[0], esc[1], esc[2], esc[4],
                            cat.escape_tables(steps)))
                r, v, err = _propagate_fast_partitioned(
                    cat.els, cat.els_deep, cat.deep_sub,
                    cat.deep_idx_dev, t_time, t_sat, t_sat_deep,
                    jd_sum, cat.grav, output, velocities,
                    cat.kepler_iters, engine, steps, layout, window,
                    cat.resonance_tables(steps),
                    deep_kepler_iters=cat.deep_kepler_iters,
                    escape=esc_arg)
    else:
        # minutes since each satellite's epoch — computed with the
        # jd/fr split so the subtraction happens at epoch-difference
        # magnitude (~days), not at JD magnitude (~2.45e6), preserving
        # sub-microsecond resolution (f64 paths only; the fast path
        # passes the separable (t_time, t_sat) factors instead)
        jd = jnp.asarray(jd_h, dt)
        fr = jnp.asarray(fr_h, dt)
        tsince = ((jd[:, None] - cat.els.epoch_jd[None, :])
                  + fr[:, None]) * MINUTES_PER_DAY
        if not cat.has_deep:
            r, v, err = _propagate_shallow(cat.els, tsince, jd_sum,
                                           cat.grav, output, velocities)
        elif scan_times:
            r, v, err = _propagate_mixed_scan(cat.els, cat.deep, tsince,
                                              jd_sum, cat.grav, output,
                                              velocities)
        else:
            r, v, err = _propagate_mixed(cat.els, cat.deep, tsince,
                                         jd_sum, cat.grav, output,
                                         velocities)
        # f64 paths produce time-major stacked output; derive the other
        # layouts post-hoc (the fast path writes them directly)
        if layout == "sat_major":
            r = jnp.swapaxes(r, 0, 1)
            if v is not None:
                v = jnp.swapaxes(v, 0, 1)
            err = jnp.swapaxes(err, 0, 1)
        elif layout == "planes":
            r = jnp.moveaxis(r, -1, 0)
            if v is not None:
                v = jnp.moveaxis(v, -1, 0)

    if satellite_mask is not None:
        m = jnp.asarray(satellite_mask, bool)
        # broadcast shapes per layout: the sat axis is axis 1 of err for
        # time_major/planes, axis 0 for sat_major
        me = m[:, None] if layout == "sat_major" else m[None, :]
        mr = m[None, None, :] if layout == "planes" else me[..., None]
        r = jnp.where(mr, r, 0.0)
        if v is not None:
            v = jnp.where(mr, v, 0.0)
        err = jnp.where(me, err, -1)
    return r, v, err


def propagate_tsince(cat: SatCatalog, tsince_min, *, velocities: bool = True):
    """Low-level: propagate to minutes-since-own-epoch offsets.

    ``tsince_min`` broadcasts against the catalog: shape (n_times, 1) or
    (n_times, n_sats) gives a dense grid; scalar/(n_sats,) a single shot.
    Always TEME. Returns ``(r, v, error)``.
    """
    t = jnp.asarray(tsince_min, cat.els.no_kozai.dtype)
    if not cat.has_deep:
        r, v, err = sgp4_propagate(cat.els, t, cat.grav)
    else:
        r, v, err, _ = sdp4_propagate(cat.els, cat.deep, t, cat.grav)
    return (r, v, err) if velocities else (r, None, err)
