"""python-sgp4 drop-in compatible API.

Rebuild of the reference's ``bindings/python/astroz/api.py`` (Satrec
wrapper at api.py:86-187, SatrecArray at :249-359, module constants at
:79-83): a user of ``sgp4.api`` can switch imports and keep their code.

Everything routes through the vectorized catalog kernels — a ``Satrec``
is a 1-satellite :class:`~astroz_tpu.propagation.SatCatalog`, and
``SatrecArray.sgp4`` is one dense (n_sats, n_times) XLA program instead
of the reference's SIMD batches + thread pool (satrec.zig:896-988).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import tle as _tle
from .constants import (WGS72 as _WGS72_CONST, WGS72OLD as _WGS72OLD_CONST,
                        WGS84 as _WGS84_CONST, GravityModel,
                        MINUTES_PER_DAY, TWO_PI)
from .propagation import SatCatalog, build_catalog, catalog_from_elements
from .ops.sgp4 import sgp4_init
from .time import days2mdhms, jday  # noqa: F401  (re-exported)

#: gravity model selectors (python-sgp4 numbering: WGS72OLD=0, WGS72=1,
#: WGS84=2 — we accept both these enums and our GravityModel instances)
WGS72OLD = 0
WGS72 = 1
WGS84 = 2

_GRAV_BY_ENUM = {WGS72OLD: _WGS72OLD_CONST, WGS72: _WGS72_CONST,
                 WGS84: _WGS84_CONST}

#: parity with python-sgp4's "accelerated" C extension flag
accelerated = True


def _resolve_grav(whichconst) -> GravityModel:
    if isinstance(whichconst, GravityModel):
        return whichconst
    try:
        return _GRAV_BY_ENUM[int(whichconst)]
    except (KeyError, TypeError, ValueError):
        raise ValueError(f"unknown gravity model {whichconst!r}") from None


class Satrec:
    """Single-satellite record, python-sgp4 compatible.

    Reference: api.py:86-187 / satrec.zig:83-201 (twoline2rv with silent
    SGP4->SDP4 fallback, sgp4() in (jd, fr) split, ~20 properties).
    """

    def __init__(self):
        self._cat: Optional[SatCatalog] = None
        self._tle: Optional[_tle.Tle] = None
        self._scalar = None
        self._scalar_native = None
        self._core = None
        self._init_err = 0
        self.error = 0
        self.t = 0.0

    # ``t``/``error`` live on the native SatCore once it exists (the
    # all-C call path writes them there); properties keep the
    # python-sgp4 attribute contract either way.
    @property
    def t(self) -> float:
        return self._core.t if self._core is not None else self._t

    @t.setter
    def t(self, value: float):
        if self._core is not None:
            self._core.t = value
        else:
            self._t = value

    @property
    def error(self) -> int:
        return self._core.error if self._core is not None else self._error

    @error.setter
    def error(self, value: int):
        if self._core is not None:
            self._core.error = value
        else:
            self._error = value

    # ---- construction ----------------------------------------------------

    @classmethod
    def twoline2rv(cls, line1: str, line2: str,
                   whichconst=WGS72) -> "Satrec":
        self = cls()
        grav = _resolve_grav(whichconst)
        self._tle = _tle.parse_lines(line1, line2)
        self._cat = build_catalog([self._tle], grav=grav)
        self._init_err = self.error = int(self._cat.init_errors[0])
        return self

    def sgp4init(self, whichconst, opsmode: str, satnum: int, epoch: float,
                 bstar: float, ndot: float, nddot: float, ecco: float,
                 argpo: float, inclo: float, mo: float, no_kozai: float,
                 nodeo: float) -> "Satrec":
        """python-sgp4 compatible element-wise init. ``epoch`` is days
        since 1949 December 31 00:00 UT (python-sgp4 convention);
        ``no_kozai`` in rad/min.

        Like python-sgp4 (and unlike a constructor), this is an
        *in-place instance method*: ``sat = Satrec(); sat.sgp4init(...)``
        initializes ``sat`` itself. It also returns ``self`` so the
        one-liner ``Satrec().sgp4init(...)`` works.
        """
        grav = _resolve_grav(whichconst)
        epoch_jd = epoch + 2433281.5
        els = sgp4_init(grav, no_kozai=np.asarray([no_kozai]),
                        ecco=np.asarray([ecco]), inclo=np.asarray([inclo]),
                        nodeo=np.asarray([nodeo]),
                        argpo=np.asarray([argpo]), mo=np.asarray([mo]),
                        bstar=np.asarray([bstar]),
                        epoch_jd=np.asarray([epoch_jd]))
        self._cat = catalog_from_elements(
            els, grav, satnum=np.asarray([satnum], dtype=np.int64))
        # drop any TLE from a previous twoline2rv: jdsatepoch and the
        # TLE-derived properties prefer _tle, so a stale one would make
        # every later sgp4(jd, fr) compute tsince against the OLD epoch
        self._tle = None
        self._reset_scalar()
        self._init_err = self.error = int(self._cat.init_errors[0])
        return self

    def _reset_scalar(self):
        """Drop the lazily-bound scalar engines after an in-place
        re-init: the native SatCore owns a COPY of the element vector
        and shadows ``sgp4``/``sgp4_tsince`` as instance attributes, so
        a ``sgp4init`` after a propagate call would otherwise keep
        answering with the old elements."""
        self._scalar = None
        self._scalar_native = None
        if self._core is not None:
            self._t, self._error = self._core.t, self._core.error
            self._core = None
        self.__dict__.pop("sgp4", None)
        self.__dict__.pop("sgp4_tsince", None)

    # ---- propagation ------------------------------------------------------

    def _scalar_record(self):
        """Lazily-built scalar record for single-point calls: one
        device dispatch costs ~1 ms while the pure-CPU scalar engine
        (ops/scalar.py) answers in tens of microseconds — the TPU
        shape of the reference's 2.5M props/s Python loop path
        (README.md:84-86, satrec.zig:169-201)."""
        if self._scalar is None:
            from .ops import scalar
            g = self._cat.grav
            gc = scalar.GravConsts(g.mu, g.radius_earth_km, g.xke,
                                   g.tumin, g.j2, g.j3, g.j4, g.j3oj2)
            els = self._cat.els
            self._scalar = scalar.sgp4init(
                gc, float(els.epoch_jd[0]), float(els.bstar[0]),
                float(els.ecco[0]), float(els.argpo[0]),
                float(els.inclo[0]), float(els.mo[0]),
                float(els.no_kozai[0]), float(els.nodeo[0]))
            # native C++ propagator (sub-us/call vs ~20 us pure-Python;
            # exact-parity-tested) — None when no compiler is available
            from . import native
            self._scalar_native = native.scalar_engine(self._scalar)
            core = native.sat_core(self._scalar, self.jdsatepoch,
                                   self.jdsatepochF)
            if core is not None:
                # rebind sgp4/sgp4_tsince to the all-C fast path: the
                # instance attribute shadows the Python method, so loop
                # calls never enter a Python frame (the TPU-repo shape
                # of the reference's 2.5M props/s compiled scalar loop,
                # satrec.zig:169-201). t/error migrate into the core
                # (see the properties above).
                core.t, core.error = self._t, self._error
                self._core = core
                self.sgp4 = core.sgp4
                self.sgp4_tsince = core.sgp4_tsince
        return self._scalar

    @staticmethod
    def _on_accel() -> bool:
        import jax
        return jax.devices()[0].platform != "cpu"

    def sgp4(self, jd: float, fr: float
             ) -> Tuple[int, Tuple[float, float, float],
                        Tuple[float, float, float]]:
        """Propagate to jd+fr. Returns (error, r_teme_km, v_teme_km_s)."""
        self.t = ((jd - self.jdsatepoch) + (fr - self.jdsatepochF)) \
            * MINUTES_PER_DAY
        init_err = self._init_err
        if init_err:
            # init-time failure: match the batch path's zero-fill
            self.error = init_err
            return init_err, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0)
        rec = self._scalar_record()
        if self._scalar_native is not None:
            e, r, v = self._scalar_native.sgp4(self.t)
        else:
            from .ops import scalar
            e, r, v = scalar.sgp4(rec, self.t)
        self.error = e
        return e, r, v

    def sgp4_tsince(self, tsince: float):
        """Propagate to minutes since epoch (python-sgp4 parity)."""
        jd = self.jdsatepoch
        fr = self.jdsatepochF + tsince / MINUTES_PER_DAY
        return self.sgp4(jd, fr)

    def _sgp4_many(self, jd: np.ndarray, fr: np.ndarray):
        n = len(jd)
        # ordering matters: only consult jax.devices() when the array
        # is big enough for the device path — small arrays must reach
        # the native engine WITHOUT initializing any JAX backend
        # (backend init can hang on a dead accelerator tunnel)
        if n >= 4096 and self._on_accel():
            # time-as-lanes: fold the time axis into both grid
            # dimensions so one satellite fills the VPU (the
            # reference's 1-sat x 8-times propagateN at TPU width)
            from .ops.sdp4 import sdp4_propagate
            from .ops.sgp4 import sgp4_propagate
            cat = self._cat
            lanes = 512
            pad = (-n) % lanes
            tsince = ((np.asarray(jd, np.float64)
                       - float(cat.els.epoch_jd[0]))
                      + np.asarray(fr, np.float64)) * MINUTES_PER_DAY
            tsince = np.concatenate(
                [tsince, np.full(pad, tsince[-1])]).reshape(-1, lanes)
            t = jnp.asarray(tsince)
            if cat.has_deep:
                r, v, err, _ = sdp4_propagate(cat.els, cat.deep, t,
                                              cat.grav)
            else:
                r, v, err = sgp4_propagate(cat.els, t, cat.grav)
            r = np.asarray(r).reshape(-1, 3)[:n]
            v = np.asarray(v).reshape(-1, 3)[:n]
            err = np.asarray(err).reshape(-1)[:n]
            return err, r, v
        if not int(self._cat.init_errors[0]):
            self._scalar_record()
            if self._scalar_native is not None:
                # native C++ SIMD sweep (61 ns/point): beats a device
                # dispatch round trip for small arrays, and beats the
                # XLA:CPU f64 program outright, so on the CPU backend
                # it serves every array size
                tsince = ((jd - self.jdsatepoch)
                          + (fr - self.jdsatepochF)) * MINUTES_PER_DAY
                err, r, v = self._scalar_native.sgp4_array(tsince)
                return err, r, v
        from .propagation import propagate
        r, v, err = propagate(self._cat, jd, fr)
        return (np.asarray(err)[:, 0], np.asarray(r)[:, 0],
                np.asarray(v)[:, 0])

    def sgp4_array(self, jd: np.ndarray, fr: np.ndarray):
        """Vectorized over times: returns (e, r, v) with shapes
        (n,), (n, 3), (n, 3) — reference api.py:144-187."""
        e, r, v = self._sgp4_many(np.asarray(jd, np.float64),
                                  np.asarray(fr, np.float64))
        return e, r, v

    # ---- properties (python-sgp4 names; api.py:471-496) -------------------

    @property
    def _els(self):
        return self._cat.els

    def _f(self, field) -> float:
        return float(np.asarray(getattr(self._els, field))[0])

    @property
    def satnum(self) -> int:
        return int(self._cat.satnum[0])

    @property
    def jdsatepoch(self) -> float:
        return self._tle.jdsatepoch if self._tle else float(
            np.floor(self._f("epoch_jd") - 0.5) + 0.5)

    @property
    def jdsatepochF(self) -> float:
        return (self._tle.jdsatepochF if self._tle
                else self._f("epoch_jd") - self.jdsatepoch)

    @property
    def epochyr(self) -> int:
        return self._tle.epochyr if self._tle else 0

    @property
    def epochdays(self) -> float:
        return self._tle.epochdays if self._tle else 0.0

    @property
    def classification(self) -> str:
        return self._tle.classification if self._tle else "U"

    @property
    def intldesg(self) -> str:
        return self._tle.intldesg if self._tle else ""

    @property
    def elnum(self) -> int:
        return self._tle.elnum if self._tle else 0

    @property
    def revnum(self) -> int:
        return self._tle.revnum if self._tle else 0

    @property
    def ephtype(self) -> int:
        return self._tle.ephtype if self._tle else 0

    @property
    def ndot(self) -> float:
        return self._tle.ndot if self._tle else 0.0

    @property
    def nddot(self) -> float:
        return self._tle.nddot if self._tle else 0.0

    @property
    def is_deep_space(self) -> bool:
        return bool(self._cat.is_deep[0])

    # orbital elements + derived (all from the initialized element set)
    no_kozai = property(lambda self: self._f("no_kozai"))
    no_unkozai = property(lambda self: self._f("no_unkozai"))
    ecco = property(lambda self: self._f("ecco"))
    inclo = property(lambda self: self._f("inclo"))
    nodeo = property(lambda self: self._f("nodeo"))
    argpo = property(lambda self: self._f("argpo"))
    mo = property(lambda self: self._f("mo"))
    bstar = property(lambda self: self._f("bstar"))
    a = property(lambda self: self._f("a"))
    alta = property(lambda self: self._f("alta"))
    altp = property(lambda self: self._f("altp"))
    gsto = property(lambda self: self._f("gsto"))
    mdot = property(lambda self: self._f("mdot"))
    argpdot = property(lambda self: self._f("argpdot"))
    nodedot = property(lambda self: self._f("nodedot"))

    #: python-sgp4 compat: mean motion in rad/min (alias)
    @property
    def no(self) -> float:
        return self.no_kozai

    #: operation mode — always the modern 'i'mproved mode
    operationmode = "i"
    method = property(lambda self: "d" if self.is_deep_space else "n")


class SatrecArray:
    """Batch of satellites, python-sgp4 compatible.

    ``sgp4(jd, fr)`` returns (e, r, v) shaped (n_sats, n_times, ...),
    computed as one dense XLA grid — the reference's 290M props/s path
    (api.py:249-359) without its separate SGP4/SDP4 scatter step.
    """

    def __init__(self, satrecs: Sequence[Satrec],
                 method: str = "fast"):
        if not satrecs:
            raise ValueError("empty SatrecArray")
        self._satrecs = list(satrecs)
        self._method = method
        grav = satrecs[0]._cat.grav
        same_grav = all(s._cat.grav == grav for s in satrecs)
        tles = [s._tle for s in satrecs]
        self._grav_groups = None
        if same_grav and all(t is not None for t in tles):
            self._cat = build_catalog(tles, grav=grav)
        else:
            # mixed gravity models (or element-wise init): concatenate
            # the already-initialized element pytrees — each satellite
            # keeps its INIT-TIME constants (python-sgp4's per-satrec
            # whichconst). Propagation also consumes the gravity model
            # (xke/j2/... in the secular and short-period terms), so
            # the device path must run one program PER distinct model —
            # self._grav_groups records (row_indices, catalog) slices.
            import jax
            els = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs),
                *[s._cat.els for s in satrecs])
            satnum = np.concatenate([s._cat.satnum for s in satrecs])
            self._cat = catalog_from_elements(els, grav, satnum=satnum)
            if not same_grav:
                groups = {}
                for i, s in enumerate(satrecs):
                    groups.setdefault(s._cat.grav, []).append(i)
                self._grav_groups = []
                for g, idx in groups.items():
                    g_els = jax.tree_util.tree_map(
                        lambda *xs: jnp.concatenate(xs),
                        *[satrecs[i]._cat.els for i in idx])
                    g_cat = catalog_from_elements(
                        g_els, g, satnum=np.concatenate(
                            [satrecs[i]._cat.satnum for i in idx]))
                    self._grav_groups.append(
                        (np.asarray(idx, np.int64), g_cat))

    def __len__(self) -> int:
        return len(self._satrecs)

    @property
    def catalog(self) -> SatCatalog:
        return self._cat

    def sgp4(self, jd: np.ndarray, fr: np.ndarray,
             velocities: bool = True):
        """Returns (e, r, v) with shapes (n_sats, n_times),
        (n_sats, n_times, 3), (n_sats, n_times, 3); ``v`` is None when
        ``velocities=False`` (reference api.py:23,249-359)."""
        jd = np.asarray(jd, np.float64)
        fr = np.asarray(fr, np.float64)
        import jax
        if jax.devices()[0].platform == "cpu":
            # CPU backend: the native 8-wide SIMD batch engine
            # (~8M props/s/core) beats the XLA:CPU f64 program ~8x —
            # the CPU shape of the reference's SatrecArray SIMD path
            # (satrec.zig:896-988); per-satrec engines also preserve
            # mixed gravity models exactly
            out = self._sgp4_native(jd, fr)
            if out is not None:
                e, r, v = out
                return (e, r, v) if velocities else (e, r)
        from .propagation import propagate
        if self._grav_groups is not None:
            # device path, mixed gravity models: one program per
            # distinct model (the propagate-time secular/short-period
            # terms consume xke/j2/..., so a single-catalog sweep
            # would apply satrecs[0]'s constants to every satellite)
            n_t = np.broadcast_arrays(np.atleast_1d(jd),
                                      np.atleast_1d(fr))[0].shape[0]
            e = np.zeros((len(self._satrecs), n_t), np.int32)
            r = np.zeros((len(self._satrecs), n_t, 3), np.float64)
            v = np.zeros_like(r) if velocities else None
            for idx, g_cat in self._grav_groups:
                rg, vg, eg = propagate(g_cat, jd, fr,
                                       velocities=velocities,
                                       layout="sat_major",
                                       method=self._method)
                e[idx] = np.asarray(eg)
                r[idx] = np.asarray(rg, np.float64)
                if velocities:
                    v[idx] = np.asarray(vg, np.float64)
            return (e, r, v) if velocities else (e, r)
        r, v, err = propagate(self._cat, jd, fr,
                              velocities=velocities, layout="sat_major",
                              method=self._method)
        e = np.asarray(err)
        r = np.asarray(r, np.float64)
        v = None if v is None else np.asarray(v, np.float64)
        if velocities:
            return e, r, v
        return e, r

    def _sgp4_native(self, jd: np.ndarray, fr: np.ndarray):
        """All-native (n_sats, n_times) sweep through each satrec's C++
        SIMD engine; None when any engine is unavailable (no compiler)
        so the caller falls back to the XLA path. Threads over
        satellite ranges when the host has cores to spare — the ctypes
        call releases the GIL, so this is the reference's 16-thread
        SatrecArray scaling (Constellation.zig:360-382) in Python."""
        from . import native

        n_t = jd.shape[0]
        n_s = len(self._satrecs)
        if getattr(self, "_native_grid", None) is None:
            # pack every healthy satellite's element vector ONCE —
            # the whole (n_sats, n_times) sweep is then a single
            # native crossing per thread, no per-satellite Python
            ok, vec_rows, eps, epfs = [], [], [], []
            for i, s in enumerate(self._satrecs):
                if s._init_err:
                    continue
                s._scalar_record()
                if s._scalar_native is None:
                    return None
                ok.append(i)
                vec_rows.append(s._scalar_native._vec)
                eps.append(s.jdsatepoch)
                epfs.append(s.jdsatepochF)
            self._native_grid = (
                np.asarray(ok, np.int64),
                np.asarray(vec_rows, np.float64) if vec_rows
                else np.zeros((0, len(native.SCALAR_FIELDS))),
                np.asarray(eps), np.asarray(epfs))
        ok, vecs, eps, epfs = self._native_grid
        if len(ok) == 0:
            e = np.zeros((n_s, n_t), np.int32)
            for i, s in enumerate(self._satrecs):
                e[i] = s._init_err
            z = np.zeros((n_s, n_t, 3), np.float64)
            return e, z, z.copy()
        tsince = ((jd[None, :] - eps[:, None])
                  + (fr[None, :] - epfs[:, None])) * MINUTES_PER_DAY
        out = native.sgp4_grid(vecs, tsince)  # threads over sat ranges
        if out is None:
            return None
        if len(ok) == n_s:
            # every satellite healthy (the common case): r/v are views
            # into the native buffer — no staging or scatter copies
            return out
        eo, ro, vo = out
        e = np.zeros((n_s, n_t), np.int32)
        r = np.zeros((n_s, n_t, 3), np.float64)
        v = np.zeros((n_s, n_t, 3), np.float64)
        for i, s in enumerate(self._satrecs):
            if s._init_err:
                e[i] = s._init_err  # zero-filled outputs, batch parity
        e[ok], r[ok], v[ok] = eo, ro, vo
        return e, r, v

    def sgp4_into(self, jd: np.ndarray, fr: np.ndarray,
                  r_out: np.ndarray, v_out: Optional[np.ndarray] = None,
                  e_out: Optional[np.ndarray] = None) -> None:
        """Propagate into caller-provided numpy buffers (the reference's
        into-buffer path, ``SatrecArray.propagate_into`` /
        ``sgp4_array_into``, satrec.zig:896-988).

        ``r_out``/``v_out`` must be ``(n_sats, n_times, 3)`` float64 and
        ``e_out`` ``(n_sats, n_times)`` — results are copied host-side
        into them (the device result crosses to the host exactly once;
        TPU memory is not host-mappable, so a literal zero-copy into a
        user buffer does not exist on this backend). Delegates to
        :meth:`sgp4` so both entries share the same engine choice
        (native SIMD on the CPU backend, device kernels otherwise)."""
        out = self.sgp4(np.asarray(jd, np.float64),
                        np.asarray(fr, np.float64),
                        velocities=v_out is not None)
        err, r = out[0], out[1]
        np.copyto(r_out, np.asarray(r))
        if v_out is not None:
            np.copyto(v_out, np.asarray(out[2]))
        if e_out is not None:
            np.copyto(e_out, np.asarray(err))


# ---------------------------------------------------------------------------
# astrojax-compatible functional surface
# ---------------------------------------------------------------------------


def create_sgp4_propagator(line1: str, line2: str, gravity=WGS72):
    """astrojax-style functional API (the reference benches astrojax as
    its JAX comparison point, benchmarks/jax_cpu_bench.py:4): returns
    ``(params, propagate_fn)`` where ``propagate_fn(params, tsince_min)``
    maps minutes-since-epoch (any shape) to ``(r_km, v_km_s)`` stacked
    on the trailing axis, jit/vmap/grad-compatible.

    Deep-space TLEs are supported (astrojax itself is SGP4-only).
    """
    from .propagation import build_catalog

    cat = build_catalog("\n".join([line1.rstrip(), line2.rstrip()]),
                        grav=_resolve_grav(gravity))
    params = (cat.els, cat.deep)

    def propagate_fn(params, tsince):
        from .ops.sdp4 import sdp4_propagate
        from .ops.sgp4 import sgp4_propagate

        els, deep = params
        t = jnp.asarray(tsince)[..., None]  # broadcast vs the 1-sat axis
        if deep is not None:
            r, v, _, _ = sdp4_propagate(els, deep, t, cat.grav)
        else:
            r, v, _ = sgp4_propagate(els, t, cat.grav)
        return r[..., 0, :], v[..., 0, :]

    return params, propagate_fn
