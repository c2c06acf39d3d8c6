"""High-level constellation API: load, propagate, screen.

Rebuild of the reference's top-level Python surface
(``bindings/python/astroz/__init__.py``): data loading from CelesTrak
group / NORAD id / URL / file / raw TLE / raw OMM with format
auto-detect (_load_tle_text at __init__.py:163-181, aliases :131-136),
the ``Constellation`` class (:305-408), ``propagate(source, times,
start_time=, output=, velocities=, norad_id=)`` (:411-532) and
``screen(..., threshold=, target=)`` (:535-658).

Improvement over the reference: mixed SGP4/SDP4 catalogs are fully
wired here (the reference's ``propagate()`` leaves SDP4 columns
uninitialized, __init__.py:513-531); our unified kernel handles them in
one pass.

Network loaders (CelesTrak) are gated: they raise with a clear message
when the environment has no egress, and accept a ``fetch`` callable for
dependency injection in tests.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Callable, List, Optional, Sequence, Union

import numpy as np

from .constants import WGS72, GravityModel
from .propagation import SatCatalog, build_catalog
from .propagation import propagate as _propagate_catalog
from .screening import screen_all, screen_target
from .time import jday
from .tle import Tle, iter_tles, parse_omm

CELESTRAK_GROUP_URL = ("https://celestrak.org/NORAD/elements/gp.php"
                       "?GROUP={group}&FORMAT=tle")
CELESTRAK_CATNR_URL = ("https://celestrak.org/NORAD/elements/gp.php"
                       "?CATNR={catnr}&FORMAT=tle")

#: group aliases (reference: __init__.py:131-136)
GROUP_ALIASES = {
    "all": "active", "active": "active", "stations": "stations",
    "starlink": "starlink", "oneweb": "oneweb", "gps": "gps-ops",
    "galileo": "galileo", "glonass": "glo-ops", "geo": "geo",
    "weather": "weather", "science": "science", "debris": "cosmos-1408-debris",
}


def _default_fetch(url: str) -> str:
    import urllib.request
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.read().decode("utf-8", errors="replace")
    except Exception as exc:  # pragma: no cover - network dependent
        raise ConnectionError(
            f"could not fetch {url!r} (no network egress?): {exc}"
        ) from exc


def load_tle_text(source: str, *,
                  fetch: Optional[Callable[[str], str]] = None) -> str:
    """Resolve a source spec to raw TLE/OMM text (reference:
    _load_tle_text, __init__.py:163-181):

    * an existing file path -> file contents
    * ``http(s)://...`` -> fetched
    * ``group:<name>`` / a known group alias -> CelesTrak group
    * ``norad:<id>`` or an integer string -> CelesTrak by catalog number
    * anything containing TLE/OMM lines -> passed through
    """
    fetch = fetch or _default_fetch
    if os.path.exists(source):
        with open(source, "r") as f:
            return f.read()
    s = source.strip()
    if s.startswith(("http://", "https://")):
        return fetch(s)
    if s.startswith("group:"):
        return fetch(CELESTRAK_GROUP_URL.format(group=s[6:]))
    if s.startswith("norad:"):
        return fetch(CELESTRAK_CATNR_URL.format(catnr=int(s[6:])))
    if s.lower() in GROUP_ALIASES:
        return fetch(CELESTRAK_GROUP_URL.format(
            group=GROUP_ALIASES[s.lower()]))
    if s.isdigit():
        return fetch(CELESTRAK_CATNR_URL.format(catnr=int(s)))
    # raw TLE / 3LE / OMM JSON text
    return source


def _times_to_jd(times, start_time=None) -> np.ndarray:
    """Times spec -> float JD array. Accepts JD floats, datetimes, or
    minute offsets from ``start_time`` (datetime or JD)."""
    if start_time is not None:
        if isinstance(start_time, _dt.datetime):
            jd0, fr0 = jday(start_time.year, start_time.month,
                            start_time.day, start_time.hour,
                            start_time.minute,
                            start_time.second + start_time.microsecond
                            * 1e-6)
            base = jd0 + fr0
        else:
            base = float(start_time)
        return base + np.asarray(times, np.float64) / 1440.0
    times = np.atleast_1d(np.asarray(times))
    if times.dtype == object or isinstance(times.flat[0], _dt.datetime):
        out = []
        for t in times.ravel():
            jd0, fr0 = jday(t.year, t.month, t.day, t.hour, t.minute,
                            t.second + t.microsecond * 1e-6)
            out.append(jd0 + fr0)
        return np.asarray(out)
    return times.astype(np.float64)


class Constellation:
    """A loaded + initialized catalog with convenience methods
    (reference: Constellation class, __init__.py:305-408)."""

    def __init__(self, source: Union[str, Sequence[Tle], SatCatalog],
                 grav: GravityModel = WGS72,
                 fetch: Optional[Callable[[str], str]] = None):
        if isinstance(source, SatCatalog):
            self.catalog = source
        else:
            if isinstance(source, str):
                source = load_tle_text(source, fetch=fetch)
            self.catalog = build_catalog(source, grav=grav)

    def __len__(self) -> int:
        return len(self.catalog)

    @property
    def num_satellites(self) -> int:
        return len(self.catalog)

    @property
    def num_deep_space(self) -> int:
        return self.catalog.n_deep

    @property
    def satnums(self) -> np.ndarray:
        return self.catalog.satnum

    @property
    def names(self):
        return self.catalog.names

    @property
    def epochs_jd(self) -> np.ndarray:
        return self.catalog.epochs_jd

    def select(self, norad_ids: Sequence[int]) -> "Constellation":
        """Subset by NORAD catalog number."""
        import jax
        ids = set(int(i) for i in norad_ids)
        mask = np.asarray([int(s) in ids for s in self.catalog.satnum])
        if not mask.any():
            raise ValueError("no matching NORAD ids in catalog")
        idx = np.nonzero(mask)[0]
        from .propagation import catalog_from_elements
        els = jax.tree_util.tree_map(
            lambda x: x[idx] if getattr(x, "ndim", 0) else x,
            self.catalog.els)
        cat = catalog_from_elements(
            els, self.catalog.grav, satnum=self.catalog.satnum[idx],
            names=(tuple(np.asarray(self.catalog.names, object)[idx])
                   if self.catalog.names else None))
        return Constellation(cat)

    def propagate(self, times, start_time=None, *, output: str = "teme",
                  velocities: bool = True, layout: str = "time_major",
                  method: str = "fast"):
        """Propagate to the given epochs; see
        :func:`astroz_tpu.propagation.propagate` for outputs."""
        jd = _times_to_jd(times, start_time)
        return _propagate_catalog(self.catalog, jd, output=output,
                                  velocities=velocities, layout=layout,
                                  method=method)

    def screen(self, times, start_time=None, *,
               threshold_km: float = 5.0, target=None, method="fast",
               **kwargs):
        """Conjunction screen: fused single-target when ``target`` is
        given, two-stage all-vs-all otherwise (reference:
        __init__.py:535-658)."""
        jd = _times_to_jd(times, start_time)
        if target is not None:
            return screen_target(self.catalog, target, jd,
                                 threshold_km=threshold_km,
                                 method=method)
        return screen_all(self.catalog, jd, threshold_km=threshold_km,
                          method=method, **kwargs)


def propagate(source, times, start_time=None, *, output: str = "teme",
              velocities: bool = True, norad_id: Optional[int] = None,
              grav: GravityModel = WGS72, method: str = "fast",
              fetch: Optional[Callable[[str], str]] = None):
    """One-call convenience (reference: __init__.py:411-532): load
    ``source``, optionally select one satellite, propagate to
    ``times`` and return ``(r, v, error)`` shaped
    (n_times, n_sats, 3)."""
    con = Constellation(source, grav=grav, fetch=fetch)
    if norad_id is not None:
        con = con.select([norad_id])
    return con.propagate(times, start_time, output=output,
                         velocities=velocities, method=method)


def screen(source, times, start_time=None, *, threshold_km: float = 5.0,
           target=None, grav: GravityModel = WGS72,
           fetch: Optional[Callable[[str], str]] = None, **kwargs):
    """One-call conjunction screen (reference: __init__.py:535-658)."""
    con = Constellation(source, grav=grav, fetch=fetch)
    return con.screen(times, start_time, threshold_km=threshold_km,
                      target=target, **kwargs)
