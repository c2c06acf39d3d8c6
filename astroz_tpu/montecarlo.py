"""Monte-Carlo transfer analysis — vmapped over the sample axis.

Rebuild of ``src/MonteCarlo.zig`` (Xoshiro256 + Box-Muller sampling at
MonteCarlo.zig:74-126, statistics incl. 95% CI at :160-226, CSV export
at :251-276). The TPU-native version replaces the sequential
scalar-sample loop with ``jax.random`` + one vectorized evaluation:
every sample's Hohmann transfer is computed in a single XLA program
(the "batched fixed-step XLA scans" pattern from the build plan).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .calculations import hohmann_transfer
from .constants import EARTH


@dataclass
class MonteCarloConfig:
    """(MonteCarlo.zig MonteCarloConfig)"""

    n_samples: int = 1000
    seed: int = 42
    r1_km: float = EARTH.eq_radius + 400.0
    r2_km: float = 42164.0
    mu: float = EARTH.mu
    r1_sigma_km: float = 10.0
    r2_sigma_km: float = 50.0
    mu_sigma: float = 0.0


@dataclass
class StatisticalSummary:
    """(MonteCarlo.zig:160-226)"""

    mean: float
    std: float
    minimum: float
    maximum: float
    ci95_low: float
    ci95_high: float
    n: int
    n_failed: int


def _summary(x: np.ndarray, n_failed: int) -> StatisticalSummary:
    mean = float(np.mean(x))
    std = float(np.std(x, ddof=1)) if x.size > 1 else 0.0
    half = 1.959963984540054 * std / np.sqrt(max(x.size, 1))
    return StatisticalSummary(
        mean=mean, std=std, minimum=float(np.min(x)),
        maximum=float(np.max(x)), ci95_low=mean - half,
        ci95_high=mean + half, n=int(x.size), n_failed=n_failed)


def run_hohmann_monte_carlo(config: MonteCarloConfig
                            ) -> Dict[str, StatisticalSummary]:
    """Perturb (r1, r2, mu) with gaussian noise (0.5x safety floor like
    MonteCarlo.zig:109-126), evaluate every sample's transfer in one
    vmapped program, and summarize dv/time statistics."""
    key = jax.random.PRNGKey(config.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    n = config.n_samples
    r1 = config.r1_km + config.r1_sigma_km * jax.random.normal(k1, (n,))
    r2 = config.r2_km + config.r2_sigma_km * jax.random.normal(k2, (n,))
    mu = config.mu + config.mu_sigma * jax.random.normal(k3, (n,))
    # safety floor: no sample below half the nominal (MonteCarlo.zig:120)
    r1 = jnp.maximum(r1, 0.5 * config.r1_km)
    r2 = jnp.maximum(r2, 0.5 * config.r2_km)
    mu = jnp.maximum(mu, 0.5 * config.mu)

    dv1, dv2, total, tof = jax.jit(hohmann_transfer)(r1, r2, mu)
    # failure = degenerate transfer (radii crossed to within 1 km)
    ok = np.asarray(jnp.abs(r2 - r1) > 1.0)
    n_failed = int((~ok).sum())

    out = {}
    for name, arr in (("delta_v1", dv1), ("delta_v2", dv2),
                      ("total_delta_v", total), ("transfer_time", tof)):
        out[name] = _summary(np.asarray(arr)[ok], n_failed)
    return out


def export_csv(results: Dict[str, StatisticalSummary],
               path: str) -> None:
    """CSV export (MonteCarlo.zig:251-276)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "mean", "std", "min", "max", "ci95_low",
                    "ci95_high", "n", "n_failed"])
        for name, s in results.items():
            w.writerow([name, s.mean, s.std, s.minimum, s.maximum,
                        s.ci95_low, s.ci95_high, s.n, s.n_failed])
